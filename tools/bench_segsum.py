"""Block-size sweep for the scatter-free segment-add backward kernel.

``segment_add_fm`` (ops/segsum.py) accumulates table gradients with a sort
+ one-hot-MXU Pallas kernel whose grid has one program per B-slot table
block (``pick_block`` fixes B=1024). Per-block overhead (DMA setup, grid
dispatch) scales with T/B while the in-kernel one-hot compare cost scales
with M*B — this sweep measures the real trade on flagship-step shapes so
``pick_block`` is a measured choice, not a guess.

Shapes swept = the step's actual gradient reductions (tuned headline,
2048 rays x K=96 -> ~196k pts):
  - static hash:  M = 196k pts * 4 levels * 8 corners = 6.3M rows, F=8,
                  T = 4 levels * 2^19 = 2.1M slots
  - dynamic fused3 (grad prefix = t-query): M = 196k * 4 * 4corners = 3.1M
                  (2D grids), F=2 folded, T = folded dyn table ~1.2M
  - flow grid:    M = 196k * 4 * 8 = 6.3M, F=32 folded, T = 4 * 2^18 = 1M

Usage: python tools/bench_segsum.py [--reps 5]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out.ravel()[0]))      # axon: force device->host fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out.ravel()[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from nvsf_tpu.ops import segsum

    shapes = [
        ("static-hash", 6_291_456, 8, 4 << 19),
        ("dyn-fused3-grad", 3_145_728, 2, 1_245_184),
        ("flow", 6_291_456, 32, 4 << 18),
    ]
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}", flush=True)
    for si, (name, M, F, T) in enumerate(shapes):
        # fold in the loop index, not hash(name): Python string hashes are
        # salted per-process (PYTHONHASHSEED) and would make the benchmark
        # inputs differ run to run
        kc, kv = jax.random.split(jax.random.fold_in(key, si))
        cols = jax.random.randint(kc, (M,), 0, T, jnp.int32)
        vals = jax.random.normal(kv, (F, M), jnp.float32)
        print(f"{name:18s} M={M/1e6:.1f}M F={F} T={T/1e6:.2f}M:", flush=True)
        row = []
        for B in (1024, 2048, 4096):
            # _segment_add_tpu_packed is already @jax.jit with static B/T
            fn = lambda c, v, B=B: segsum._segment_add_tpu_packed(c, v, T, B)
            try:
                ms = _time(fn, cols, vals, reps=args.reps)
                row.append(f"B{B}={ms:.1f}ms")
            except Exception as e:  # Mosaic VMEM limits at large B*F
                row.append(f"B{B}=ERR({type(e).__name__})")
            print("  " + row[-1], flush=True)


if __name__ == "__main__":
    main()
