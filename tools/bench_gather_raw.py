"""Raw XLA gather characterization on the chip.

Decides WHAT the hash-encoder gathers are bound by:
  - row count (fixed per-row cost regardless of width)?
  - bytes (bandwidth: time scales with M * F * dtype)?
  - gather-op count (dispatch overhead)?

Sweeps row width F, dtype, table layout, and row count M.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    r = fn(*args)
    np.asarray(r).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(r).ravel()[0]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    T = 1 << 19
    key = jax.random.PRNGKey(0)
    Ms = [1 << 22, 1 << 24]
    for M in Ms:
        idx = jax.random.randint(key, (M,), 0, T)
        for dtype in (jnp.float32, jnp.bfloat16):
            for F in (4, 8, 32, 128):
                tbl = jnp.ones((T, F), dtype)

                @jax.jit
                def row_gather(tbl, idx):
                    return jnp.sum(tbl[idx], dtype=jnp.float32)

                dt = timeit(row_gather, tbl, idx)
                gb = M * F * tbl.dtype.itemsize / 1e9
                print(f"M={M>>20}M rows=[T,{F:3d}] {tbl.dtype.name:8s}: "
                      f"{dt:7.1f} ms  {M/dt/1e6:7.1f} Mrows/s  "
                      f"{gb/dt*1e3:6.1f} GB/s", flush=True)
        # lane-major layout: [F, T] gather along minor axis (current
        # fused-gather layout keeps N trailing)
        for F in (4, 32):
            tblT = jnp.ones((F, T), jnp.float32)

            @jax.jit
            def lane_gather(tbl, idx):
                return jnp.sum(tbl[:, idx], dtype=jnp.float32)

            dt = timeit(lane_gather, tblT, idx)
            print(f"M={M>>20}M lane=[{F:3d},T] float32 : {dt:7.1f} ms  "
                  f"{M/dt/1e6:7.1f} Mrows/s", flush=True)
        # 2 half-size gathers vs 1: dispatch overhead probe
        idx2 = idx[: M // 2]
        tbl4 = jnp.ones((T, 4), jnp.float32)

        @jax.jit
        def two_gathers(tbl, i):
            return jnp.sum(tbl[i], dtype=jnp.float32) \
                + jnp.sum(tbl[i + 1], dtype=jnp.float32)

        dt = timeit(two_gathers, tbl4, idx2)
        print(f"M={M>>20}M 2x half gathers [T,4] f32: {dt:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
