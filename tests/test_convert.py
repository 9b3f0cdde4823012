"""lidar<->pano conversion tests: round-trip + golden-value checks against a
straightforward per-point re-implementation of the reference loops
(``/root/reference/nvsf/lib/convert.py:105-291``)."""

import numpy as np
import pytest

from nvsf_tpu.lib import convert

KITTI_K = [2.0, 26.9]
KITTI_K_HOZ = [180.0, 360.0]
H, W = 66, 1030


def _reference_loop_projection(pts, H, W, K, K_hoz, max_depth=80.0):
    """Per-point loop mirroring the reference semantics (for golden tests)."""
    fov_up, fov = K
    fov_down = fov - fov_up
    fov_hoz_up, fov_hoz = K_hoz
    pano = np.zeros((H, W))
    inten = np.zeros((H, W))
    dists = np.linalg.norm(pts[:, :3], axis=1)
    for (x, y, z, i), dist in zip(pts, dists):
        if dist >= max_depth:
            continue
        beta = fov_hoz_up * np.pi / 180 - np.arctan2(y, x)
        alpha = np.arctan2(z, np.sqrt(x**2 + y**2)) + fov_down / 180 * np.pi
        c = int(round(beta / ((fov_hoz * np.pi / 180) / W)))
        r = int(round(H - alpha / (fov / 180 * np.pi / H)))
        if r >= H or r < 0 or c >= W or c < 0:
            continue
        if pano[r, c] == 0.0 or pano[r, c] > dist:
            pano[r, c] = dist
            inten[r, c] = i
    return pano, inten


def _random_cloud(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    # points within the vertical fov band so most project in-bounds
    r = rng.uniform(2.0, 70.0, n)
    az = rng.uniform(-np.pi, np.pi, n)
    incl = rng.uniform(np.radians(2.0 - 26.9), np.radians(2.0), n)
    x = r * np.cos(incl) * np.cos(az)
    y = r * np.cos(incl) * np.sin(az)
    z = r * np.sin(incl)
    i = rng.uniform(0, 1, n)
    return np.stack([x, y, z, i], axis=1)


def test_projection_matches_reference_loop():
    pts = _random_cloud(4000)
    pano_v, inten_v = convert.lidar_to_pano_with_intensities(
        pts, H, W, KITTI_K, KITTI_K_HOZ)
    pano_r, inten_r = _reference_loop_projection(pts, H, W, KITTI_K, KITTI_K_HOZ)
    # depth is exactly min-per-pixel in both
    np.testing.assert_allclose(pano_v, pano_r, atol=1e-9)
    # intensity of the winning (closest) point; ties broken identically is not
    # guaranteed, but with random distances collisions at equal depth have
    # measure zero
    np.testing.assert_allclose(inten_v, inten_r, atol=1e-9)


def test_round_trip_pano_lidar_pano():
    pts = _random_cloud(3000, seed=1)
    pano, inten = convert.lidar_to_pano_with_intensities(
        pts, H, W, KITTI_K, KITTI_K_HOZ)
    back = convert.pano_to_lidar_with_intensities(pano, inten, KITTI_K, KITTI_K_HOZ)
    pano2, inten2 = convert.lidar_to_pano_with_intensities(
        back, H, W, KITTI_K, KITTI_K_HOZ)
    occ = pano > 0
    # re-projected depths land on the same pixels with close range values
    assert (pano2 > 0).sum() >= 0.97 * occ.sum()
    both = (pano > 0) & (pano2 > 0)
    np.testing.assert_allclose(pano[both], pano2[both], rtol=1e-2, atol=0.2)


def test_pano_to_lidar_distances():
    pano = np.zeros((H, W))
    pano[30, 100] = 10.0
    pano[10, 900] = 55.0
    pts = convert.pano_to_lidar(pano, KITTI_K, KITTI_K_HOZ)
    assert pts.shape == (2, 3)
    d = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(sorted(d), [10.0, 55.0], rtol=1e-6)


def test_max_depth_filtered():
    pts = np.array([[100.0, 0.0, 0.0, 0.5], [10.0, 0.0, 0.0, 0.7]])
    pano, _ = convert.lidar_to_pano_with_intensities(
        pts, H, W, KITTI_K, KITTI_K_HOZ, max_depth=80.0)
    assert (pano > 0).sum() == 1
    np.testing.assert_allclose(pano.max(), 10.0)


def test_multi_return_projection():
    # two points on the same pixel at different depths
    d1 = convert.pano_direction_grid(H, W, KITTI_K, KITTI_K_HOZ)[30, 100]
    pts = np.array([
        list(d1 * 10.0) + [0.3],
        list(d1 * 25.0) + [0.7],
        list(d1 * 40.0) + [0.9],
    ])
    pano, inten = convert.lidar_to_pano_multi_return(
        pts, H, W, KITTI_K, KITTI_K_HOZ, n_returns=2)
    assert pano.shape == (2, H, W)
    np.testing.assert_allclose(pano[0, 30, 100], 10.0, rtol=1e-6)
    np.testing.assert_allclose(pano[1, 30, 100], 25.0, rtol=1e-6)
    np.testing.assert_allclose(inten[0, 30, 100], 0.3)
    np.testing.assert_allclose(inten[1, 30, 100], 0.7)


def test_bbox_masked_projection():
    pts = _random_cloud(2000, seed=5)
    bbox = [[-20, -20, -10], [20, 20, 10]]
    pano_m, _ = convert.lidar_to_pano_with_intensities_with_bbox_mask(
        pts, bbox, H, W, KITTI_K, KITTI_K_HOZ)
    pano_f, _ = convert.lidar_to_pano_with_intensities(
        pts, H, W, KITTI_K, KITTI_K_HOZ)
    # masked projection only contains near points
    assert (pano_m > 0).sum() < (pano_f > 0).sum()
    assert pano_m.max() <= np.sqrt(20**2 + 20**2 + 10**2) + 1e-6
