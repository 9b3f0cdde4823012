"""Bisect the static-hash forward: index math vs gather vs interp.

Also probes layout variants (row-major table, width-8 pad) against the
shipped lane-major fused gather.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.models.hash_grid import HashEncodingSpec
from nvsf_tpu.ops.gather import table_gather


def timeit(fn, *args, n=8):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    spec = HashEncodingSpec(dim=3, n_levels=8, n_features_per_level=4,
                            log2_hashmap_size=19, base_resolution=16,
                            max_resolution=2048)
    N = 262_144
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, 3))
    table = spec.init(jax.random.PRNGKey(1))
    M = spec.n_levels * 8 * N

    cols_w = jax.jit(lambda x: spec.level_cols_weights(x))
    dt = timeit(cols_w, x)
    print(f"cols+weights only        : {dt:7.1f} ms", flush=True)

    cols, wc = jax.jit(spec.level_cols_weights)(x)
    cols = jax.block_until_ready(cols)

    g = jax.jit(lambda t, c: jnp.sum(table_gather(t, c),
                                     dtype=jnp.float32))
    dt = timeit(g, table, cols)
    print(f"fused gather only ({M>>20}M)  : {dt:7.1f} ms", flush=True)

    interp = jax.jit(lambda t, c, w: jnp.sum(spec.interp(t, c, w),
                                             dtype=jnp.float32))
    dt = timeit(interp, table, cols, wc)
    print(f"gather+interp            : {dt:7.1f} ms", flush=True)

    full = jax.jit(lambda t, x: jnp.sum(spec.apply(t, x),
                                        dtype=jnp.float32))
    dt = timeit(full, table, x)
    print(f"full apply               : {dt:7.1f} ms", flush=True)

    # row-major variant: [L*T, F] rows, same cols
    tbl_rm = jnp.asarray(np.asarray(table).T.copy())

    g2 = jax.jit(lambda t, c: jnp.sum(t[c], dtype=jnp.float32))
    dt = timeit(g2, tbl_rm, cols)
    print(f"row-major [LT,4] gather  : {dt:7.1f} ms", flush=True)

    tbl_rm8 = jnp.concatenate([tbl_rm, tbl_rm], axis=1)
    dt = timeit(g2, tbl_rm8, cols)
    print(f"row-major [LT,8] gather  : {dt:7.1f} ms", flush=True)

    # plain take (autodiff path) for reference
    g3 = jax.jit(lambda t, c: jnp.sum(jnp.take(t, c, axis=1,
                                               unique_indices=False,
                                               indices_are_sorted=False),
                                      dtype=jnp.float32))
    dt = timeit(g3, table, cols)
    print(f"jnp.take lane gather     : {dt:7.1f} ms", flush=True)

    # sorted columns: does locality help the HW gather?
    cols_sorted = jnp.sort(cols)
    dt = timeit(g, table, cols_sorted)
    print(f"fused gather sorted cols : {dt:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
