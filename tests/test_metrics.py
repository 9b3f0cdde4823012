"""Metric meter tests: golden values and protocol behavior."""

import json

import numpy as np
import pytest

from nvsf_tpu.lib import metrics as M

pytest.importorskip("scipy")


def test_psnr_meter_golden():
    m = M.PSNRMeter()
    p = np.zeros((1, 10, 10, 3))
    t = np.full((1, 10, 10, 3), 0.1)
    m.update(p, t)
    np.testing.assert_allclose(m.measure(), -10 * np.log10(0.01 + 1e-8),
                               rtol=1e-6)


def test_rmse_meter_rgb_depth_mask():
    m = M.RMSEMeter(rgb_metric=True)
    t = np.array([[0.0, 10.0, 100.0]])
    p = np.array([[5.0, 12.0, 100.0]])
    # zero-mask kills pred where gt == 0; clip at 80
    m.update(p, t)
    np.testing.assert_allclose(m.measure(),
                               np.sqrt((0 + 4 + (80 - 80) ** 2) / 3),
                               rtol=1e-6)


def test_raydrop_meter():
    m = M.RaydropMeter(ratio=0.5)
    t = np.array([1, 1, 0, 0, 1], np.float32)
    p = np.array([0.9, 0.2, 0.1, 0.8, 0.7], np.float32)
    m.update(p, t)
    rmse, acc, f1 = m.measure()
    assert acc == 3 / 5
    prec, rec = 2 / 3, 2 / 3
    np.testing.assert_allclose(f1, 2 * prec * rec / (prec + rec), rtol=1e-6)


def test_points_meter_identical_is_zero_cd():
    pano = np.zeros((16, 64))
    pano[8, 10] = 10.0
    pano[4, 50] = 25.0
    m = M.PointsMeter(scale=1.0, intrinsics=(2.0, 26.9),
                      intrinsics_hoz=(180.0, 360.0))
    m.update(pano, pano)
    cd, f = m.measure()
    assert cd < 1e-4
    assert f == 1.0


def test_ssim_skimage_matches_known_cases():
    a = np.random.default_rng(0).uniform(size=(32, 32))
    assert abs(M.ssim_skimage(a, a, data_range=1.0) - 1.0) < 1e-9
    b = 1.0 - a
    assert M.ssim_skimage(a, b, data_range=1.0) < 0.2


def test_ssim_gaussian_range():
    a = np.random.default_rng(1).uniform(size=(24, 24, 3))
    assert abs(M.ssim_gaussian(a, a) - 1.0) < 1e-9
    n = np.clip(a + np.random.default_rng(2).normal(0, 0.2, a.shape), 0, 1)
    v = M.ssim_gaussian(a, n)
    assert 0.0 < v < 0.9


def test_l4d_depth_meter_shape():
    m = M.DepthMeter_L4D(scale=0.01)
    t = np.abs(np.random.default_rng(0).normal(0.3, 0.1, (32, 64))) * 0.01
    p = t + 0.001
    m.update(p[None], t[None])
    vals = m.measure()
    assert vals.shape == (5,)
    rmse, medae, lp, ssim, psnr = vals
    np.testing.assert_allclose(rmse, 0.1, rtol=1e-4)  # 0.001/0.01 m error
    assert np.isnan(lp)  # LPIPS gated without weights
    assert 0 < ssim <= 1
    assert psnr > 20


def test_lpips_gated():
    m = M.LPIPSMeter()
    assert not m.available
    m.update(np.zeros((8, 8, 3)), np.ones((8, 8, 3)))
    assert np.isnan(m.measure())


def test_write_error_matrix(tmp_path):
    meters = {"psnr": M.PSNRMeter(), "raydrop": M.RaydropMeter()}
    meters["psnr"].update(np.zeros((4, 4)), np.full((4, 4), 0.5))
    meters["raydrop"].update(np.array([0.9, 0.1]), np.array([1.0, 0.0]))
    out = str(tmp_path / "err.json")
    res = M.write_error_matrix(meters, out, extra={"epoch": 3})
    loaded = json.loads(open(out).read())
    assert loaded["epoch"] == 3
    assert "psnr" in loaded and "raydrop" in loaded
    assert res["psnr"] == pytest.approx(meters["psnr"].measure())
