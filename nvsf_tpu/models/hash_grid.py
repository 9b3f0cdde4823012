"""Multi-resolution hash-grid encodings in pure JAX (instant-ngp family).

Replaces the reference's external tiny-cuda-nn ``HashGrid`` encodings:
  - static 3D grid  (``hash_field.py:108-119``)
  - time-binned 2D grids ``HashGridT`` (``hash_field.py:29-88``)
  - the 4D composite ``HashGrid4D`` (``hash_field.py:92-173``)
  - the flow field's 3D grid + temporal Lagrange basis
    (``flow_field.py:68-84,105-114``)

Design notes (TPU-first):
  - Tables are stored as single 2D arrays [F, L*T] (features x concatenated
    per-level tables): clean 2D params avoid TPU (8, 128) tile padding on
    every param/EMA/Adam copy, and ALL levels' lookups become one fused
    gather. Levels whose dense grid fits in T entries are dense-indexed;
    finer levels use the instant-ngp spatial hash.
  - Gathers use jnp.take (XLA dynamic-gather). A Pallas gather kernel was
    evaluated and rejected: Mosaic on this stack does not lower vector
    gathers from VMEM (see ``nvsf_tpu/ops/chamfer_pallas.py``). Measured
    v5e ceilings: ~105-150M gathers/s, ~12-16M backward scatter-adds/s —
    the lookup count, not the op count, is what matters (see VALIDATION.md).
  - ``remat_gather`` recomputes the gather body in the backward instead of
    saving per-corner residuals; disable it when HBM allows (occupancy-mode
    batches) to skip the re-gather.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429)


def level_resolutions(base_resolution: int, max_resolution: int, n_levels: int):
    """Per-level grid resolutions with tcnn's geometric spacing
    (``hash_field.py:43,108``)."""
    if n_levels == 1:
        return [int(base_resolution)]
    s = math.exp2(math.log2(max_resolution / base_resolution) / (n_levels - 1))
    return [int(math.floor(base_resolution * (s ** l))) for l in range(n_levels)]


@dataclass(frozen=True)
class HashEncodingSpec:
    """One multi-resolution hash encoding over D-dim inputs in [0, 1]^D."""
    dim: int = 3
    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 19
    base_resolution: int = 512
    max_resolution: int = 32768
    remat_gather: bool = True   # rematerialize the gather body in backward

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def resolutions(self):
        return level_resolutions(self.base_resolution, self.max_resolution,
                                 self.n_levels)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def init(self, key):
        # tcnn init: U(-1e-4, 1e-4). Stored as a single 2D array
        # [F, L*T] (features x concatenated per-level tables):
        #  - 2D with a huge trailing axis => no TPU (8, 128) tile padding on
        #    any param/EMA/Adam copy;
        #  - all L levels' lookups become ONE gather along the column axis
        #    (a per-level loop/scan is latency-bound: 8 sequential small
        #    gathers ran ~10x slower end-to-end).
        return jax.random.uniform(
            key,
            (self.n_features_per_level, self.n_levels * self.table_size),
            jnp.float32, -1e-4, 1e-4)

    # ------------------------------------------------------------------
    def _all_level_features(self, table, x, offs, res_arr, dense_arr,
                            level_offs):
        """All levels in one shot: vectorized index math over [N, L, 2^D]
        and a SINGLE gather from the [F, L*T] table. Returns [N, L*F]."""
        D = self.dim
        L = self.n_levels
        T = self.table_size
        n_corners = 1 << D
        N = x.shape[0]
        pos = x.astype(jnp.float32)[:, None, :] \
            * res_arr[None, :, None].astype(jnp.float32)     # [N, L, D]
        c0 = jnp.floor(pos)
        w = pos - c0                                          # [N, L, D]
        c0 = c0.astype(jnp.int32)
        corners = jnp.clip(c0[:, :, None, :] + offs[None, None, :, :],
                           0, res_arr[None, :, None, None])   # [N, L, C, D]
        # dense index (row-major over (res+1)^D)
        idx_dense = corners[..., 0]
        stride = jnp.ones_like(res_arr)
        for d in range(1, D):
            stride = stride * (res_arr + 1)
            idx_dense = idx_dense + corners[..., d] \
                * stride[None, :, None]
        # spatial hash (instant-ngp)
        h = corners[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        for d in range(1, D):
            h = h ^ (corners[..., d].astype(jnp.uint32)
                     * jnp.uint32(_PRIMES[d]))
        idx_hash = (h & jnp.uint32(T - 1)).astype(jnp.int32)
        idx = jnp.where(dense_arr[None, :, None], idx_dense, idx_hash)
        cols = idx + level_offs[None, :, None]                # [N, L, C]
        # every large intermediate keeps the big N axis LAST: TPU (8, 128)
        # tiling would otherwise pad trailing (L, C) dims 32x
        cols_t = jnp.transpose(cols, (1, 2, 0)).reshape(-1)   # [L*C*N]
        vals = jnp.take(table, cols_t, axis=1)                # [F, L*C*N]
        F = vals.shape[0]
        vals = vals.reshape(F, L, n_corners, N)               # [F, L, C, N]
        wc = jnp.ones((L, n_corners, N), jnp.float32)
        wt = jnp.transpose(w, (1, 2, 0))                      # [L, D, N]
        for d in range(D):
            wd = jnp.where(offs[None, :, d:d + 1] == 1,
                           wt[:, None, d, :], 1.0 - wt[:, None, d, :])
            wc = wc * wd
        feat = jnp.sum(vals * wc[None], axis=2)               # [F, L, N]
        # -> [N, L*F] with level-major ordering (out[n, l*F + f])
        return jnp.transpose(feat, (2, 1, 0)).reshape(N, L * F)

    def apply(self, table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, D] in [0, 1] -> [N, L * F] features (level-major order,
        matching tcnn's concatenation).

        The gather body is rematerialized: without it the backward saves
        every gathered corner as a residual (GBs at full ray batches)."""
        D = self.dim
        offs = np.stack(np.meshgrid(*([np.arange(2)] * D), indexing="ij"),
                        axis=-1).reshape(-1, D)
        offs = jnp.asarray(offs, dtype=jnp.int32)
        res_arr = jnp.asarray(self.resolutions, jnp.int32)
        dense_arr = jnp.asarray(
            [(r + 1) ** D <= self.table_size for r in self.resolutions])
        level_offs = jnp.arange(self.n_levels, dtype=jnp.int32) \
            * self.table_size
        fn = lambda tbl, xx: self._all_level_features(
            tbl, xx, offs, res_arr, dense_arr, level_offs)
        if self.remat_gather:
            fn = jax.checkpoint(fn)
        return fn(table, x)


def lagrange_interp_features(x: jnp.ndarray, t, n_levels: int,
                             n_features_per_level: int,
                             num_basis: int = 4) -> jnp.ndarray:
    """Temporal Lagrange-basis interpolation in the feature dimension.

    Mirrors ``HashGridT.interpT`` / ``FlowField.interpT``
    (``hash_field.py:65-74``, ``flow_field.py:105-114``): view features as
    [N, L, F], chunk F into ``num_basis`` groups, and blend the groups with
    the Lagrange basis at normalized time t over nodes T = linspace(0, 1, B).
    Output dim = L * F / B.
    """
    N = x.shape[0]
    F = n_features_per_level
    B = num_basis
    xv = x.reshape(N, n_levels, F)
    chunks = jnp.split(xv, B, axis=-1)  # B x [N, L, F/B]
    nodes = [i / (B - 1) for i in range(B)]
    t = jnp.asarray(t, jnp.float32)
    out = 0.0
    for j in range(B):
        basis = 1.0
        for m in range(B):
            if m != j:
                basis = basis * (t - nodes[m]) / (nodes[j] - nodes[m])
        out = out + basis * chunks[j]
    return out.reshape(N, n_levels * F // B)


@dataclass(frozen=True)
class HashGridTSpec:
    """Time-binned 2D hash grids with linear interp across adjacent bins
    plus Lagrange feature-basis interp (``hash_field.py:29-88``)."""
    time_resolution: int = 8
    base_resolution: int = 512
    max_resolution: int = 32768
    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 14
    num_basis: int = 4
    remat_gather: bool = True

    @property
    def grid(self) -> HashEncodingSpec:
        return HashEncodingSpec(
            dim=2, n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
            remat_gather=self.remat_gather)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level // self.num_basis

    def init(self, key):
        keys = jax.random.split(key, self.time_resolution)
        return jnp.stack([self.grid.init(k) for k in keys])  # [TR, L, T, F]

    def apply(self, tables: jnp.ndarray, x: jnp.ndarray, t) -> jnp.ndarray:
        """x: [N, 2] in [0,1]; t: scalar in [0,1] -> [N, n_output_dims]."""
        t = jnp.asarray(t, jnp.float32).reshape(())
        idx = t * (self.time_resolution - 1)
        i1 = jnp.floor(idx).astype(jnp.int32)
        i2 = jnp.minimum(i1 + 1, self.time_resolution - 1)
        w2 = idx - i1.astype(jnp.float32)
        # one vmapped encoder over the two adjacent time bins (graph size)
        tables2 = jnp.stack([
            jax.lax.dynamic_index_in_dim(tables, i1, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(tables, i2, 0, keepdims=False)])
        f12 = jax.vmap(self.grid.apply, in_axes=(0, None))(tables2, x)
        feat = (1.0 - w2) * f12[0] + w2 * f12[1]
        return lagrange_interp_features(
            feat, t, self.n_levels, self.n_features_per_level, self.num_basis)


@dataclass(frozen=True)
class HashGrid4DSpec:
    """Static 3D hash + three time-binned 2D planes (xyt, xzt, yzt)
    (``hash_field.py:92-173``)."""
    base_resolution: int = 512
    max_resolution: int = 32768
    time_resolution: int = 8
    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 19
    hash_size_dynamic: Tuple[int, int, int] = (15, 13, 13)  # larger for xy
    remat_gather: bool = True

    @property
    def static_grid(self) -> HashEncodingSpec:
        return HashEncodingSpec(
            dim=3, n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
            remat_gather=self.remat_gather)

    def dynamic_grid(self, i: int) -> HashGridTSpec:
        return HashGridTSpec(
            time_resolution=self.time_resolution,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
            n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=self.hash_size_dynamic[i],
            remat_gather=self.remat_gather)

    @property
    def n_output_dims_static(self) -> int:
        return self.static_grid.n_output_dims  # 32

    @property
    def n_output_dims_dynamic(self) -> int:
        return self.dynamic_grid(0).n_output_dims * 3  # 24 (concat reduction)

    def init(self, key):
        ks, k0, k1, k2 = jax.random.split(key, 4)
        return {
            "static": self.static_grid.init(ks),
            "dyn_xyt": self.dynamic_grid(0).init(k0),
            "dyn_xzt": self.dynamic_grid(1).init(k1),
            "dyn_yzt": self.dynamic_grid(2).init(k2),
        }

    def apply_static(self, params, x):
        return self.static_grid.apply(params["static"], x)

    def apply_dynamic(self, params, x, t):
        xy = x[:, (0, 1)]
        xz = x[:, (0, 2)]
        yz = x[:, (1, 2)]
        f_xyt = self.dynamic_grid(0).apply(params["dyn_xyt"], xy, t)
        f_xzt = self.dynamic_grid(1).apply(params["dyn_xzt"], xz, t)
        f_yzt = self.dynamic_grid(2).apply(params["dyn_yzt"], yz, t)
        return jnp.concatenate([f_xyt, f_xzt, f_yzt], axis=-1)

    def apply(self, params, x, t):
        return self.apply_static(params, x), self.apply_dynamic(params, x, t)
