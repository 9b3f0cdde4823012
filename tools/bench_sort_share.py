"""Measure the segment-sum sort's share of the headline train step.

VERDICT r3 item 7 asks for a Pallas counting/bucket sort in the table-
gradient backward — or its data-backed kill. This script produces the
decision data on the real chip:

  1. traces the flagship joint step and records every
     ``segment_add_fm(cols, vals, T)`` call's true (M, F, T) shape;
  2. times the full step;
  3. times, per recorded shape, (a) the packed ``lax.sort`` alone
     (the component a counting sort would replace), (b) the full
     ``_segment_add_tpu_packed`` backward (sort + searchsorted + pad +
     Pallas accumulate);
  4. prints each as JSON with its share of the step.

The sum of the (a) rows is the HARD CEILING of any sort-replacement:
even a zero-cost partition cannot win more than the sort it removes.
See PARITY.md "counting sort" for the cost model that, combined with
these numbers, resolves the item.

Usage: python tools/bench_sort_share.py [--rung tuned|headline]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", choices=["tuned", "headline"], default="tuned")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import bench
    bench._wait_for_tpu()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nvsf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from nvsf_tpu.ops import gather as gather_mod
    from nvsf_tpu.ops import segsum

    shapes = []                      # (M, F, T) per segment_add_fm call
    orig = gather_mod.segment_add_fm

    def recording(cols, vals, T, **kw):
        shapes.append((int(cols.shape[0]), int(vals.shape[0]), int(T)))
        return orig(cols, vals, T, **kw)

    gather_mod.segment_add_fm = recording
    over = (bench.JOINT_TUNED_LADDER[0] if args.rung == "tuned"
            else bench.LADDER[0])
    tag, cfg, tr, _ = bench._make_trainer(over)
    # trace (CPU-side) records the shapes; the jit cache keys on shapes so
    # the recorded trace is the one that runs
    tr._step_random.lower(tr.state, np.int32(0))
    gather_mod.segment_add_fm = orig
    uniq = {}
    for s in shapes:
        uniq[s] = uniq.get(s, 0) + 1
    print(json.dumps({"rung": tag, "segment_add_calls": len(shapes),
                      "unique_shapes": [
                          {"M": m, "F": f, "T": t, "n": n}
                          for (m, f, t), n in sorted(uniq.items())]}),
          flush=True)

    # full-step time (warm)
    st, m = tr._step_random(tr.state, np.int32(0))
    jax.device_get(m["loss"])
    tr.state = st
    t0 = time.perf_counter()
    for i in range(args.reps):
        tr.state, m = tr._step_random(tr.state, np.int32(i % 8))
    jax.device_get(m["loss"])
    step_s = (time.perf_counter() - t0) / args.reps
    rays = cfg.num_rays_lidar + (cfg.num_rays if cfg.enable_rgb else 0)
    print(json.dumps({"step_s": round(step_s, 4),
                      "rays_per_s": round(rays / step_s, 1)}), flush=True)

    def _time(fn, *a, reps=args.reps):
        out = fn(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / reps

    @functools.partial(jax.jit, static_argnums=(2,))
    def packed_sort(cols, vals, T):
        """EXACTLY the sort the packed backward runs (segsum.py:178-179)."""
        F, M = vals.shape
        P = (F + 1) // 2
        vb = vals.astype(jnp.bfloat16)
        if F % 2:
            vb = jnp.concatenate([vb, jnp.zeros((1, M), jnp.bfloat16)])
        u = jax.lax.bitcast_convert_type(vb, jnp.uint16).astype(jnp.uint32)
        packed = ((u[1::2] << 16) | u[0::2]).astype(jnp.int32)
        return jax.lax.sort([cols.astype(jnp.int32)]
                            + [packed[p] for p in range(P)], num_keys=1)

    key = jax.random.PRNGKey(0)
    sort_total = 0.0
    bwd_total = 0.0
    rows = []
    for (M, F, T), n in sorted(uniq.items()):
        cols = jax.random.randint(key, (M,), 0, T, jnp.int32)
        vals = jax.random.normal(key, (F, M), jnp.float32)
        t_sort = _time(packed_sort, cols, vals, T)
        t_bwd = _time(lambda c, v: segsum._segment_add_tpu_packed(
            c, v, T, segsum.pick_block(T)), cols, vals)
        sort_total += n * t_sort
        bwd_total += n * t_bwd
        rows.append({"M": M, "F": F, "T": T, "n": n,
                     "sort_ms": round(1e3 * t_sort, 2),
                     "segadd_ms": round(1e3 * t_bwd, 2)})
    for r in rows:
        print(json.dumps(r), flush=True)
    print(json.dumps({
        "sort_total_ms": round(1e3 * sort_total, 1),
        "segadd_total_ms": round(1e3 * bwd_total, 1),
        "step_ms": round(1e3 * step_s, 1),
        "sort_share_of_step": round(sort_total / step_s, 4),
        "segadd_share_of_step": round(bwd_total / step_s, 4),
        "note": "sort_total is the HARD ceiling of any sort replacement"}),
        flush=True)


if __name__ == "__main__":
    main()
