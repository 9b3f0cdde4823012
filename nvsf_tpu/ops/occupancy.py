"""Occupancy grid + static-shape sample compaction (the TPU replacement for
the reference's CUDA occupancy-grid ray marcher).

The reference marches rays through a Morton-indexed density bitfield with
atomicAdd compaction into variable-length sample buffers
(``raymarching.cu:332-576``). Variable-length anything is hostile to XLA, so
the TPU design is:

  1. keep a dense density grid [G, G, G] (EMA-updated from the field like
     instant-ngp);
  2. per ray, generate T_coarse uniform candidate depths, look up occupancy
     (one cheap gather per sample);
  3. select the first K occupied samples per ray with a top-k on the key
     (occupied ? z : +inf) — a fixed-size compaction; emit a validity mask;
  4. evaluate the field only at N x K points and composite with masked
     deltas.

Speedup = T_coarse / K on the field-evaluation hot path (where >95% of the
step time is spent), with exact z positions preserved.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class OccupancyGridSpec:
    grid_size: int = 128
    bound: float = 1.0
    decay: float = 0.8            # density decay per update. Gentle by
                                  # design: with stratified time sampling a
                                  # moving object's cell is re-confirmed
                                  # only every few refreshes, and its peak
                                  # sigma must survive the misses
                                  # (0.8^8 ~ 0.17 of peak vs 0.6^8 ~ 0.017)
    update_fraction: int = 4      # update G^3 / 4 random cells per update
    init_density: float = 32.0    # start occupied; decays below thresh ~1
                                  # after log(init/thresh)/log(1/decay) upd.

    @property
    def n_cells(self) -> int:
        return self.grid_size ** 3

    def init(self):
        """Density estimates per cell; occupancy is density > threshold.
        Start fully occupied so early training sees everything (the dense
        uniform sampling regime), then empty space decays away."""
        return jnp.full((self.grid_size,) * 3, self.init_density,
                        jnp.float32)

    # ------------------------------------------------------------------
    def cell_centers(self, cells):
        """[M] flat cell indices -> [M, 3] world coords of jittered centers
        (deterministic centers; jitter applied by the caller)."""
        G = self.grid_size
        z = cells % G
        y = (cells // G) % G
        x = cells // (G * G)
        ijk = jnp.stack([x, y, z], axis=-1).astype(jnp.float32)
        u = (ijk + 0.5) / G
        return (u * 2.0 - 1.0) * self.bound

    def update(self, grid, key, density_fn, thresh=0.01,
               query_chunk: int = 32768, times=None):
        """EMA-update a random subset of cells with fresh field densities
        (instant-ngp schedule; replaces ``update_extra_state`` of the
        torch-ngp lineage). density_fn: [M, 3] -> [M] sigma, or
        ([M, 3], t) -> [M] when ``times`` is given.

        ``times``: [S] scalar query times. The scene is DYNAMIC, so a cell
        must stay occupied if it is occupied at ANY time (the grid culls
        renders at every t); each refreshed cell is queried at all S times
        and the max sigma taken — the union-over-time occupancy. Times must
        be scalars per query batch (the encoders fold scalar t into their
        tables), hence a small stratified batch rather than per-cell times.

        Queries run in fixed-size chunks under lax.map: the field's density
        (with its temporal-warp fan-out) over G^3/fraction cells in one shot
        needs tens of GB of temps — chunking bounds it."""
        G = self.grid_size
        M = self.n_cells // self.update_fraction
        k_cells, k_jit = jax.random.split(key)
        cells = jax.random.randint(k_cells, (M,), 0, self.n_cells)
        pos = self.cell_centers(cells)
        jitter = (jax.random.uniform(k_jit, pos.shape) - 0.5) \
            * (2.0 * self.bound / G)
        pts = pos + jitter

        def query_all(fn):
            if M > query_chunk:
                nc = -(-M // query_chunk)
                pad = nc * query_chunk - M
                pts_p = jnp.pad(pts, ((0, pad), (0, 0))) \
                    .reshape(nc, query_chunk, 3)
                return jax.lax.map(fn, pts_p).reshape(-1)[:M]
            return fn(pts)

        if times is None:
            sigma = query_all(density_fn)
        else:
            times = jnp.asarray(times, jnp.float32).reshape(-1)
            sigma = jax.lax.map(
                lambda t: query_all(lambda p: density_fn(p, t)),
                times).max(axis=0)
        flat = grid.reshape(-1)
        old = flat[cells]
        new = jnp.maximum(old * self.decay, sigma)
        return flat.at[cells].set(new).reshape(grid.shape)

    # ------------------------------------------------------------------
    def occupied_at(self, grid, xyz, thresh):
        """xyz: [..., 3] world coords -> bool occupancy.

        Flat 1-D row gather instead of 3-index advanced indexing: XLA's
        general (multi-index-vector) gather runs ~1.4x slower than a flat
        row gather on v5e (17.4 vs 12.6 ms at 1.57M lookups, measured)."""
        G = self.grid_size
        u = (xyz / self.bound + 1.0) * 0.5
        ijk = jnp.clip((u * G).astype(jnp.int32), 0, G - 1)
        flat_idx = (ijk[..., 0] * G + ijk[..., 1]) * G + ijk[..., 2]
        vals = grid.reshape(-1).at[flat_idx].get(mode="promise_in_bounds")
        return vals > thresh

    def compact_samples(self, grid, rays_o, rays_d, z_candidates, K: int,
                        thresh: float):
        """Compact T candidate depths to K samples spread evenly over the
        ray's OCCUPIED candidates (static-shape replacement for the CUDA
        marcher's variable-length compaction).

        z_candidates: [N, T] ascending. Returns (z_sel [N, K] ascending,
        valid [N, K]). With m occupied candidates per ray: m <= K keeps all
        m (padding masked out); m > K picks K evenly-strided ones, so the
        whole occupied extent stays covered (the segment deltas then span
        the skipped occupied space — correct piecewise-constant quadrature).
        """
        N, T = z_candidates.shape
        xyz = rays_o[:, None, :] + rays_d[:, None, :] \
            * z_candidates[..., None]
        occ = self.occupied_at(grid, xyz, thresh)              # [N, T]
        m = occ.sum(axis=-1, keepdims=True)                    # [N, 1]
        # occupied candidates packed to the front, z order preserved
        # (stable argsort of ~occ keeps ascending z within each group)
        order = jnp.argsort(~occ, axis=-1, stable=True)        # [N, T]
        # flat 1-D gather: take_along_axis lowers to a batched gather that
        # measures ~1.4x slower than a flat row gather on v5e
        row_off = (jnp.arange(N, dtype=jnp.int32) * T)[:, None]
        z_packed = z_candidates.reshape(-1) \
            .at[(order + row_off).reshape(-1)] \
            .get(mode="promise_in_bounds").reshape(N, T)
        k = jnp.arange(K)[None, :]                             # [1, K]
        strided = ((k.astype(jnp.float32) + 0.5) * m / K).astype(jnp.int32)
        ranks = jnp.where(m > K, strided, jnp.minimum(k, jnp.maximum(m - 1,
                                                                     0)))
        z_sel = jnp.take_along_axis(z_packed, ranks, axis=-1)
        valid = k < jnp.minimum(m, K)
        z_sel = jnp.where(valid, z_sel, z_candidates[:, -1:])
        return z_sel, valid
