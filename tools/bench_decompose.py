"""Component-level fwd / fwd+bwd timing of the density pipeline on the
chip, at the joint-8x4 rung's batch shape (N = 262,144 pts per branch).

Answers: where does the reference-shape (8 levels x 4 features hash,
16x8 flow) step spend its time, and which component would an
optimization have to attack to lift the joint-8x4 rung.

Usage: python tools/bench_decompose.py [--shape 8x4|4x8] [--n 262144]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.models.field import NVSFFieldSpec

SHAPES = {
    "8x4": dict(n_levels_hash=8, n_features_per_level_hash=4,
                flow_n_levels=16, flow_n_features_per_level=8),
    "4x8": dict(n_levels_hash=4, n_features_per_level_hash=8,
                flow_n_levels=8, flow_n_features_per_level=16),
}


def timeit(fn, *args, n=8):
    r = fn(*args)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="8x4", choices=list(SHAPES))
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    cdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    spec = NVSFFieldSpec(num_frames=64, bound=1.0, **SHAPES[args.shape])
    params = spec.init(jax.random.PRNGKey(0))
    hspec, pspec = spec.hash_spec, spec.planes_spec

    N = args.n
    key = jax.random.PRNGKey(1)
    xn = jax.random.uniform(key, (N, 3))
    x1 = jnp.clip(xn + 0.01, 0, 1)
    x2 = jnp.clip(xn - 0.01, 0, 1)
    t = jnp.asarray(0.37)
    t1, t2 = t + 1.0 / 64, t - 1.0 / 64
    tcol = jnp.full((N, 1), 0.37)
    xt = jnp.concatenate([xn, tcol], axis=-1)
    ts3 = jnp.stack([t, t1, t2])
    xs = jnp.stack([xn, x1, x2])
    xts = jnp.concatenate(
        [xs, ts3[:, None, None] * jnp.ones((3, N, 1))], axis=-1)

    branch = "hash_lidar"
    pbranch = "planes_lidar"

    cases = {}

    def fwd_bwd_pair(name, f, p, *xargs):
        cases[name] = (jax.jit(f), (p,) + xargs)
        g = jax.jit(lambda p_, *a: jax.grad(
            lambda pp: sum(jnp.sum(o) for o in jax.tree.leaves(f(pp, *a)))
        )(p_))
        cases[name + " +bwd"] = (g, (p,) + xargs)

    fwd_bwd_pair("hash static", lambda p, x: hspec.apply_static(p, x),
                 params[branch], xn)
    fwd_bwd_pair("hash dyn fused3",
                 lambda p, x, a, b: hspec.apply_dynamic_fused3(
                     p, x, a, b, t, t1, t2),
                 params[branch], xn, x1, x2)
    fwd_bwd_pair("planes static", lambda p, x: pspec.apply_static(p, x),
                 params[pbranch], xt)
    fwd_bwd_pair("planes dyn x3",
                 lambda p, x: pspec.apply_dynamic_multi(p, x),
                 params[pbranch], xts)
    fwd_bwd_pair("flow mlp",
                 lambda p, x: spec.flow_spec.apply(p, x, cdtype),
                 params["flow"], xt)

    feats = [pspec.apply_static(params[pbranch], xt),
             pspec.apply_dynamic_multi(params[pbranch], xts)[0],
             hspec.apply_static(params[branch], xn),
             hspec.apply_dynamic_fused3(
                 params[branch], xn, x1, x2, t, t1, t2)[0]]
    fwd_bwd_pair("sigma mlp",
                 lambda p, *fs: spec.sigma_spec.apply_blocks(
                     p, list(fs), cdtype),
                 params["sigma_net"], *feats)

    fwd_bwd_pair("density full",
                 lambda p, x: spec.density(p, x, 0.37, cal_lidar_color=True,
                                           compute_dtype=cdtype),
                 params, xn)

    for name, (fn, fargs) in cases.items():
        dt = timeit(fn, *fargs)
        print(f"{args.shape} {name:18s}: {dt:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
