"""Batched novel-sensor rendering sweeps, sharded across a device mesh.

BASELINE.json's fifth benchmark config: "custom-sensor NVS sweep: batched
renders at novel intrinsics/extrinsics sharded across a v5e-8". All frames'
rays are generated on device, flattened, sharded along the ray axis over the
mesh (params replicated), and rendered through one jitted chunked program —
the TPU-native replacement for the reference's per-frame host loop
(``trainer.py:1109-1283``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.lib import rays as raylib
from nvsf_tpu.parallel.mesh import data_sharding


def render_lidar_sweep(rend, params, poses, times, H, W, intrinsics_lidar,
                       intrinsics_hoz_lidar, mesh=None, chunk=8192):
    """Render LiDAR panos for F poses. poses: [F, 4, 4]; times: [F].

    Returns dict of numpy arrays: depth [F, H, W], raydrop, intensity.
    Rays are chunked with `lax.map` (static shapes); with a mesh, each chunk
    is sharded across devices along rays.
    """
    F = len(poses)
    inds = jnp.arange(H * W, dtype=jnp.int32)

    def render_frame(pose, t):
        ro, rd = raylib.get_lidar_rays(pose, inds, H, W, intrinsics_lidar,
                                       intrinsics_hoz_lidar)
        if mesh is not None:
            sh = data_sharding(mesh)
            n = ro.shape[0]
            pad = (-n) % mesh.devices.size
            ro = jax.lax.with_sharding_constraint(
                jnp.pad(ro, ((0, pad), (0, 0))), sh)
            rd = jax.lax.with_sharding_constraint(
                jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0), sh)
        out = rend.render(params, ro, rd, t, cal_lidar_color=True,
                          staged=True)
        depth = out["depth_lidar"][:H * W].reshape(H, W)
        img = out["image_lidar"][:H * W]
        return (depth, img[:, 0].reshape(H, W), img[:, 1].reshape(H, W))

    fn = jax.jit(lambda ps, ts: jax.lax.map(
        lambda a: render_frame(a[0], a[1]), (ps, ts)))
    depth, raydrop, intensity = fn(jnp.asarray(poses),
                                   jnp.asarray(times, jnp.float32))
    return {"depth": np.asarray(depth), "raydrop": np.asarray(raydrop),
            "intensity": np.asarray(intensity)}


def render_camera_sweep(rend, params, poses, times, H, W, intrinsics,
                        mesh=None):
    """Render camera frames for F poses; returns rgb [F, H, W, 3],
    depth [F, H, W]."""
    inds = jnp.arange(H * W, dtype=jnp.int32)
    K = jnp.asarray(intrinsics, jnp.float32)

    def render_frame(pose, t):
        ro, rd = raylib.get_camera_rays(pose, inds, H, W, K)
        if mesh is not None:
            sh = data_sharding(mesh)
            pad = (-ro.shape[0]) % mesh.devices.size
            ro = jax.lax.with_sharding_constraint(
                jnp.pad(ro, ((0, pad), (0, 0))), sh)
            rd = jax.lax.with_sharding_constraint(
                jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0), sh)
        out = rend.render(params, ro, rd, t, cal_lidar_color=False,
                          staged=True, bg_color=1.0)
        return (out["image"][:H * W].reshape(H, W, 3),
                out["depth"][:H * W].reshape(H, W))

    fn = jax.jit(lambda ps, ts: jax.lax.map(
        lambda a: render_frame(a[0], a[1]), (ps, ts)))
    rgb, depth = fn(jnp.asarray(poses), jnp.asarray(times, jnp.float32))
    return {"rgb": np.asarray(rgb), "depth": np.asarray(depth)}
