"""Batched novel-sensor rendering sweeps, sharded across a device mesh.

BASELINE.json's fifth benchmark config: "custom-sensor NVS sweep: batched
renders at novel intrinsics/extrinsics sharded across a v5e-8". All frames'
rays are generated on device, flattened, sharded along the ray axis over the
mesh (params replicated), and rendered through one jitted chunked program —
the TPU-native replacement for the reference's per-frame host loop
(``trainer.py:1109-1283``).

Compiled sweep programs are cached per (renderer, shape, occupancy) key so
repeated sweeps (refine stage, per-epoch eval) reuse the executable; the
occupancy grid is an ARGUMENT, not a baked-in constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.lib import rays as raylib
from nvsf_tpu.parallel.mesh import data_sharding


def _shard(mesh, ro, rd):
    sh = data_sharding(mesh)
    pad = (-ro.shape[0]) % mesh.devices.size
    ro = jax.lax.with_sharding_constraint(
        jnp.pad(ro, ((0, pad), (0, 0))), sh)
    rd = jax.lax.with_sharding_constraint(
        jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0), sh)
    return ro, rd


@functools.lru_cache(maxsize=32)
def _lidar_sweep_fn(rend, H, W, K_l, K_hoz, mesh, occ_spec, num_steps_occ,
                    occ_thresh, with_grid, skip_warp=False):
    inds = jnp.arange(H * W, dtype=jnp.int32)

    def fn(params, ps, ts, occ_grid):
        def frame(a):
            pose, t = a
            ro, rd = raylib.get_lidar_rays(pose, inds, H, W, K_l, K_hoz)
            if mesh is not None:
                ro, rd = _shard(mesh, ro, rd)
            kw = {}
            if with_grid:
                kw = dict(occ_spec=occ_spec, occ_grid=occ_grid,
                          num_steps_occ=num_steps_occ, occ_thresh=occ_thresh)
            out = rend.render(params, ro, rd, t, cal_lidar_color=True,
                              staged=True, skip_warp=skip_warp, **kw)
            depth = out["depth_lidar"][:H * W].reshape(H, W)
            img = out["image_lidar"][:H * W]
            return (depth, img[:, 0].reshape(H, W), img[:, 1].reshape(H, W))

        return jax.lax.map(frame, (ps, ts))

    return jax.jit(fn)


def render_lidar_sweep(rend, params, poses, times, H, W, intrinsics_lidar,
                       intrinsics_hoz_lidar, mesh=None, chunk=8192,
                       occ_kwargs=None):
    """Render LiDAR panos for F poses. poses: [F, 4, 4]; times: [F].

    Returns dict of numpy arrays: depth [F, H, W], raydrop, intensity.
    With ``occ_kwargs`` (from ``Trainer._occ_kwargs``) frames render through
    the occupancy-compacted early-exit marcher.
    """
    occ_kwargs = occ_kwargs or {}
    with_grid = bool(occ_kwargs)
    fn = _lidar_sweep_fn(
        rend, int(H), int(W), tuple(intrinsics_lidar),
        tuple(intrinsics_hoz_lidar), mesh,
        occ_kwargs.get("occ_spec"), occ_kwargs.get("num_steps_occ"),
        occ_kwargs.get("occ_thresh"), with_grid,
        bool(occ_kwargs.get("skip_warp", False)))
    depth, raydrop, intensity = fn(params, jnp.asarray(poses),
                                   jnp.asarray(times, jnp.float32),
                                   occ_kwargs.get("occ_grid"))
    return {"depth": np.asarray(depth), "raydrop": np.asarray(raydrop),
            "intensity": np.asarray(intensity)}


@functools.lru_cache(maxsize=32)
def _camera_sweep_fn(rend, H, W, mesh, occ_spec, num_steps_occ, occ_thresh,
                     with_grid, skip_warp=False):
    inds = jnp.arange(H * W, dtype=jnp.int32)

    def fn(params, ps, K, ts, occ_grid):
        def frame(a):
            pose, t = a
            ro, rd = raylib.get_camera_rays(pose, inds, H, W, K)
            if mesh is not None:
                ro, rd = _shard(mesh, ro, rd)
            kw = {}
            if with_grid:
                kw = dict(occ_spec=occ_spec, occ_grid=occ_grid,
                          num_steps_occ=num_steps_occ, occ_thresh=occ_thresh)
            out = rend.render(params, ro, rd, t, cal_lidar_color=False,
                              staged=True, bg_color=1.0,
                              skip_warp=skip_warp, **kw)
            return (out["image"][:H * W].reshape(H, W, 3),
                    out["depth"][:H * W].reshape(H, W))

        return jax.lax.map(frame, (ps, ts))

    return jax.jit(fn)


def render_camera_sweep(rend, params, poses, times, H, W, intrinsics,
                        mesh=None, occ_kwargs=None):
    """Render camera frames for F poses; returns rgb [F, H, W, 3],
    depth [F, H, W]."""
    occ_kwargs = occ_kwargs or {}
    with_grid = bool(occ_kwargs)
    fn = _camera_sweep_fn(
        rend, int(H), int(W), mesh,
        occ_kwargs.get("occ_spec"), occ_kwargs.get("num_steps_occ"),
        occ_kwargs.get("occ_thresh"), with_grid,
        bool(occ_kwargs.get("skip_warp", False)))
    rgb, depth = fn(params, jnp.asarray(poses),
                    jnp.asarray(intrinsics, jnp.float32),
                    jnp.asarray(times, jnp.float32),
                    occ_kwargs.get("occ_grid"))
    return {"rgb": np.asarray(rgb), "depth": np.asarray(depth)}
