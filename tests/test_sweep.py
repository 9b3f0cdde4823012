"""Batched novel-sensor sweep tests (sharded over the 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.parallel.mesh import make_mesh
from nvsf_tpu.render.renderer import RendererSpec
from nvsf_tpu.render.sweep import render_camera_sweep, render_lidar_sweep

from test_renderer import TINY_FIELD

REND = RendererSpec(field=TINY_FIELD, bound=1.0, min_near=0.05,
                    min_near_lidar=0.02, lidar_max_depth=0.9,
                    num_steps=32, max_ray_batch=512)


def _poses(n):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(-0.1, 0.1, n)
    return poses


def test_lidar_sweep_shapes_and_mesh_equivalence():
    params = TINY_FIELD.init(jax.random.PRNGKey(0))
    poses = _poses(3)
    times = np.linspace(0, 1, 3)
    H, W = 8, 24
    out = render_lidar_sweep(REND, params, poses, times, H, W,
                             (10.0, 40.0), (180.0, 360.0))
    assert out["depth"].shape == (3, H, W)
    out_m = render_lidar_sweep(REND, params, poses, times, H, W,
                               (10.0, 40.0), (180.0, 360.0),
                               mesh=make_mesh(8))
    np.testing.assert_allclose(out_m["depth"], out["depth"], rtol=1e-4,
                               atol=1e-6)


def test_camera_sweep():
    params = TINY_FIELD.init(jax.random.PRNGKey(0))
    poses = _poses(2)
    K = np.array([[20.0, 0, 12.0], [0, 20.0, 8.0], [0, 0, 1]])
    out = render_camera_sweep(REND, params, poses, [0.0, 1.0], 16, 24, K,
                              mesh=make_mesh(4))
    assert out["rgb"].shape == (2, 16, 24, 3)
    assert np.isfinite(out["rgb"]).all()
