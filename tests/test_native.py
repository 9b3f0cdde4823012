"""Native C++ data-pipeline tests: builds the shared library and verifies
bit-level agreement with the numpy reference paths."""

import numpy as np
import pytest

from nvsf_tpu.native import binding as native
from nvsf_tpu.lib import convert

K_L = (2.0, 26.9)
K_HOZ = (180.0, 360.0)
H, W = 66, 1030

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _cloud(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(2, 70, n)
    az = rng.uniform(-np.pi, np.pi, n)
    incl = rng.uniform(np.radians(2.0 - 26.9), np.radians(2.0), n)
    return np.stack([r * np.cos(incl) * np.cos(az),
                     r * np.cos(incl) * np.sin(az),
                     r * np.sin(incl),
                     rng.uniform(0, 1, n)], 1)


def _numpy_projection(pts):
    """numpy fallback path, bypassing the native dispatch."""
    import nvsf_tpu.lib.convert as c
    saved = c._native
    c._native = None
    try:
        return c.lidar_to_pano_with_intensities(pts, H, W, K_L, K_HOZ)
    finally:
        c._native = saved


def test_native_matches_numpy_projection():
    pts = _cloud()
    pano_n, inten_n = native.lidar_to_pano_with_intensities(
        pts, H, W, K_L, K_HOZ)
    pano_np, inten_np = _numpy_projection(pts)
    np.testing.assert_allclose(pano_n, pano_np, atol=1e-9)
    np.testing.assert_allclose(inten_n, inten_np, atol=1e-9)


def test_native_pano_to_lidar_roundtrip():
    pts = _cloud(2000, seed=1)
    pano, inten = native.lidar_to_pano_with_intensities(pts, H, W, K_L,
                                                        K_HOZ)
    back_native = native.pano_to_lidar_with_intensities(pano, inten, K_L,
                                                        K_HOZ)
    back_numpy = convert.pano_to_lidar_with_intensities(pano, inten, K_L,
                                                        K_HOZ)
    assert back_native.shape == back_numpy.shape
    # same pixel traversal order (row-major over occupied pixels); the numpy
    # path computes directions in float32, so allow small tolerance
    np.testing.assert_allclose(back_native, back_numpy, rtol=1e-4,
                               atol=1e-4)


def test_native_bin_to_rangeview(tmp_path):
    pts = _cloud(1000, seed=2).astype(np.float32)
    p = tmp_path / "scan.bin"
    pts.tofile(p)
    rv = native.velodyne_bin_to_rangeview(p, H, W, K_L, K_HOZ)
    assert rv.shape == (H, W, 3)
    pano_ref, inten_ref = native.lidar_to_pano_with_intensities(
        pts.astype(np.float64), H, W, K_L, K_HOZ)
    np.testing.assert_allclose(rv[:, :, 2], pano_ref, atol=1e-5)
    np.testing.assert_allclose(rv[:, :, 1], inten_ref, atol=1e-5)


def test_convert_dispatches_to_native():
    assert convert._native is not None and convert._native.available()
    pts = _cloud(500, seed=3)
    pano, _ = convert.lidar_to_pano_with_intensities(pts, H, W, K_L, K_HOZ)
    assert (pano > 0).sum() > 100
