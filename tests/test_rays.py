"""Ray-direction math vs pano indices + sampler behavior tests.

Golden relationships from ``dataset_utils.py:512-526`` (lidar) and
``dataset_utils.py:563-677`` (camera)."""

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.lib import convert, rays
from nvsf_tpu.data import sampler

K_L = (2.0, 26.9)
K_HOZ = (180.0, 360.0)
H, W = 66, 1030


def test_lidar_dirs_match_pano_grid():
    """Per-pixel ray dirs must equal the inverse-projection direction grid."""
    inds = jnp.arange(H * W, dtype=jnp.int32)
    dirs = jax.jit(lambda ii: rays.lidar_directions_from_indices(
        ii, H, W, K_L, K_HOZ))(inds)
    grid = convert.pano_direction_grid(H, W, K_L, K_HOZ).reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(dirs), grid, atol=1e-5)


def test_lidar_round_trip_through_projection():
    """Casting a ray from pixel (r, c) to depth d and projecting the point back
    must recover (r, c, d)."""
    rng = np.random.default_rng(0)
    n = 200
    rr = rng.integers(1, H - 1, n)
    cc = rng.integers(1, W - 1, n)
    dd = rng.uniform(2, 70, n)
    # drop colliding pixels: only the closest return survives projection
    _, first_idx, counts = np.unique(rr * W + cc, return_index=True,
                                     return_counts=True)
    keep = first_idx[counts == 1]
    rr, cc, dd, n = rr[keep], cc[keep], dd[keep], len(keep)
    inds = jnp.asarray(rr * W + cc, dtype=jnp.int32)
    dirs = np.asarray(rays.lidar_directions_from_indices(inds, H, W, K_L, K_HOZ))
    pts = dirs * dd[:, None]
    pano, _ = convert.lidar_to_pano_with_intensities(
        np.concatenate([pts, np.zeros((n, 1))], 1), H, W, K_L, K_HOZ)
    hit = pano[rr, cc]
    ok = hit > 0
    assert ok.mean() > 0.95  # few pixels collide at identical (r, c)
    np.testing.assert_allclose(hit[ok], dd[ok], rtol=1e-4)


def test_camera_dirs_center_pixel():
    K = np.array([[500.0, 0, 319.5], [0, 500.0, 239.5], [0, 0, 1]])
    # pixel whose center (i+0.5, j+0.5) is the principal point
    ind = jnp.array([239 * 640 + 319], dtype=jnp.int32)
    d = rays.camera_directions_from_indices(ind, 480, 640, K)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, 1], atol=1e-6)


def test_rays_from_pose_rotation():
    pose = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    dirs = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
    o, d = rays.rays_from_pose(pose, dirs)
    np.testing.assert_allclose(np.asarray(o), [[1, 2, 3]] * 2)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dirs))


def test_random_sampler_bounds():
    key = jax.random.PRNGKey(0)
    inds = sampler.sample_random_indices(key, H, W, 512)
    assert inds.shape == (512,)
    assert int(inds.min()) >= 0 and int(inds.max()) < H * W


def test_error_map_sampler_prefers_high_error():
    key = jax.random.PRNGKey(1)
    He, We = H // 2, W // 2
    em = jnp.ones((He, We)).at[:, : We // 2].set(1e-6)  # left half ~zero weight
    inds = sampler.sample_error_map_indices(key, em, H, W, 2048)
    cols = np.asarray(inds % W)
    assert (cols >= W // 2 - 2).mean() > 0.99


def test_patch_sampler_layout():
    key = jax.random.PRNGKey(2)
    ph, pw, N = 4, 8, 4 * 8 * 16
    inds = np.asarray(sampler.sample_patch_indices(key, H, W, N, ph, pw))
    inds2d = np.stack([inds // W, inds % W], -1).reshape(16, ph, pw, 2)
    # rows increase down the patch, cols across
    assert np.all(np.diff(inds2d[..., 0], axis=1) == 1)
    assert np.all(np.diff(inds2d[..., 1], axis=2) == 1)
    assert inds.min() >= 0 and inds.max() < H * W


def test_update_error_map_scatter():
    em = jnp.ones((4, 8))
    inds = jnp.array([0, W - 1], dtype=jnp.int32)  # top-left, top-right pixels
    err = jnp.array([0.0, 1.0])
    out = sampler.update_error_map(em, inds, err, H, W)
    out = np.asarray(out)
    # scaled errors: min->1, max->1e3; ema: 0.1*1 + 0.9*scaled
    np.testing.assert_allclose(out[0, 0], 0.1 + 0.9 * 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 7], 0.1 + 0.9 * 1e3, rtol=1e-5)
    # min-error cell EMAs back to exactly 1.0 (0.1*1 + 0.9*1), so only the
    # max-error cell differs from the initial map
    assert (out == 1.0).sum() == 4 * 8 - 1


def test_sampler_jits():
    key = jax.random.PRNGKey(3)
    em = jnp.ones((33, 515))
    f = jax.jit(lambda k: sampler.sample_error_map_indices(k, em, H, W, 256))
    inds = f(key)
    assert inds.shape == (256,)
