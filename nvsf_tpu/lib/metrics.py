"""Evaluation metric meters (rebuilds ``nvsf/lib/error_matrices.py``).

All meters share the reference's update/measure/report/clear/write protocol.
SSIM is implemented here in numpy twice, matching the two libraries the
reference mixes: skimage's uniform 7x7 window (used inside the L4D depth /
intensity meters, ``error_matrices.py:209-211``) and torchmetrics' gaussian
11x11 window (camera ``SSIMMeter``, ``error_matrices.py:458``).

LPIPS requires pretrained AlexNet weights that are not available in a
zero-egress environment; ``LPIPSMeter`` degrades to NaN unless a weights file
is provided (``NVSF_TPU_LPIPS_WEIGHTS`` env var or constructor arg).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
from scipy.ndimage import uniform_filter

from nvsf_tpu.lib.convert import pano_to_lidar
from nvsf_tpu.ops.chamfer import chamfer_distance


def _np(x):
    """Accept jax/np arrays."""
    return np.asarray(x)


def fscore_from_dists(dist1, dist2, threshold=0.05):
    """F-score from squared NN distances (``error_matrices.py:12-26``).

    Default threshold is the 0.05 (monoSDF) value every caller actually
    uses (``error_matrices.py:337``); the reference's own signature default
    of 0.001 is never exercised."""
    p1 = float((dist1 < threshold).mean())
    p2 = float((dist2 < threshold).mean())
    if p1 + p2 == 0:
        return 0.0, p1, p2
    return 2 * p1 * p2 / (p1 + p2), p1, p2


# ----------------------------------------------------------------------
# SSIM implementations
# ----------------------------------------------------------------------

def ssim_skimage(a, b, data_range, win_size=7):
    """skimage.structural_similarity defaults: uniform window, K1/K2 =
    0.01/0.03, 2D grayscale input."""
    a = _np(a).astype(np.float64)
    b = _np(b).astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    filt = lambda x: uniform_filter(x, size=win_size)
    NP = win_size ** a.ndim
    cov_norm = NP / (NP - 1)
    ua, ub = filt(a), filt(b)
    uaa, ubb, uab = filt(a * a), filt(b * b), filt(a * b)
    va = cov_norm * (uaa - ua * ua)
    vb = cov_norm * (ubb - ub * ub)
    vab = cov_norm * (uab - ua * ub)
    S = ((2 * ua * ub + C1) * (2 * vab + C2)) \
        / ((ua ** 2 + ub ** 2 + C1) * (va + vb + C2))
    pad = (win_size - 1) // 2
    sl = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[sl].mean())


def _gaussian_kernel(size=11, sigma=1.5):
    r = np.arange(size) - size // 2
    k = np.exp(-(r ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def ssim_gaussian(a, b, data_range=1.0, size=11, sigma=1.5):
    """torchmetrics structural_similarity_index_measure defaults: gaussian
    11x11 sigma 1.5, per-channel then averaged. a, b: [H, W, C] or [H, W]."""
    a = _np(a).astype(np.float64)
    b = _np(b).astype(np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_kernel(size, sigma)

    def filt(x):
        out = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="valid"), 0, x)
        out = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="valid"), 1, out)
        return out

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    ua, ub = filt(a), filt(b)
    uaa, ubb, uab = filt(a * a), filt(b * b), filt(a * b)
    va, vb, vab = uaa - ua ** 2, ubb - ub ** 2, uab - ua * ub
    S = ((2 * ua * ub + C1) * (2 * vab + C2)) \
        / ((ua ** 2 + ub ** 2 + C1) * (va + vb + C2))
    return float(S.mean())


# ----------------------------------------------------------------------
# meters
# ----------------------------------------------------------------------

class Meter:
    """Shared protocol (``error_matrices.py`` meters)."""

    def clear(self):
        self.V, self.N = 0, 0

    def measure(self):
        return self.V / (self.N + 1e-8)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(os.path.join(prefix, type(self).__name__),
                              self.measure(), global_step)


class PSNRMeter(Meter):
    def __init__(self):
        self.clear()

    def update(self, preds, truths):
        p, t = _np(preds), _np(truths)
        self.V += -10 * np.log10(np.mean((p - t) ** 2) + 1e-8)
        self.N += 1

    def report(self):
        return f"PSNR = {self.measure():.3f}"


class RMSEMeter(Meter):
    def __init__(self, rgb_metric=False):
        self.rgb_metric = rgb_metric
        self.clear()

    def update(self, preds, truths):
        p, t = _np(preds).copy(), _np(truths).copy()
        if self.rgb_metric:
            p = p * (t != 0)
            p[p > 80] = 80
            t[t > 80] = 80
        self.V += float(np.sqrt(((t - p) ** 2).mean()))
        self.N += 1

    def report(self):
        return f"RMSE = {self.measure():.3f}"


class MAEMeter(Meter):
    def __init__(self, intensity_inv_scale=1.0):
        self.s = intensity_inv_scale
        self.clear()

    def update(self, preds, truths):
        self.V += float(np.abs(_np(truths) * self.s - _np(preds) * self.s)
                        .mean())
        self.N += 1

    def report(self):
        return f"MAE = {self.measure():.3f}"


class LPIPSMeter(Meter):
    """Gated: NaN unless AlexNet-LPIPS weights are available on disk."""

    def __init__(self, net="alex", weights_path: Optional[str] = None):
        self.net = net
        self.weights_path = weights_path or os.environ.get(
            "NVSF_TPU_LPIPS_WEIGHTS")
        self.available = bool(self.weights_path
                              and os.path.exists(self.weights_path))
        self.clear()

    def _lpips(self, a, b):
        if not self.available:
            return float("nan")
        from nvsf_tpu.lib.lpips_jax import lpips_from_file
        return lpips_from_file(self.weights_path, a, b)

    def update(self, preds, truths):
        v = self._lpips(_np(preds), _np(truths))
        if not np.isnan(v):
            self.V += v
            self.N += 1

    def measure(self):
        return self.V / self.N if self.N else float("nan")

    def report(self):
        return f"LPIPS ({self.net}) = {self.measure():.3f}"


class SSIMMeter(Meter):
    def __init__(self, device=None):
        self.clear()

    def update(self, preds, truths):
        # [B, H, W, C] in [0, 1]
        p, t = _np(preds), _np(truths)
        if p.ndim == 4:
            p, t = p[0], t[0]
        v = ssim_gaussian(p, t, data_range=1.0)
        if np.isnan(v):
            v = 0.0
        self.V += v
        self.N += 1

    def report(self):
        return f"SSIM = {self.measure():.3f}"


class _L4DMeter(Meter):
    """Shared RMSE/MedAE/LPIPS/SSIM/PSNR 5-tuple
    (``error_matrices.py:159-297``)."""
    names = ("RMSE", "MedAE", "LPIPS", "SSIM", "PSNR")

    def __init__(self, scale, min_v, max_v, lpips_meter=None):
        self.scale = scale
        self.min_v, self.max_v = min_v, max_v
        self.lpips = lpips_meter or LPIPSMeter()
        self.clear()

    def clear(self):
        self.V, self.N = [], 0

    def update(self, preds, truths):
        p = np.clip(_np(preds) / self.scale, self.min_v, self.max_v)
        t = np.clip(_np(truths) / self.scale, self.min_v, self.max_v)
        rmse = float(np.sqrt(((t - p) ** 2).mean()))
        medae = float(np.median(np.abs(t - p)))
        p2 = p[0] if p.ndim == 3 else p
        t2 = t[0] if t.ndim == 3 else t
        # single-channel [H, W] panos: the reference squeezes the batch dim
        # and lets torch broadcast to 3 channels inside lpips
        # (``error_matrices.py:276-277``); lpips_jax stacks explicitly
        lp = self.lpips._lpips(p2, t2)
        ssim = ssim_skimage(p2, t2, data_range=float(t.max() - t.min()))
        psnr = float(10 * np.log10(self.max_v ** 2 / ((p - t) ** 2).mean()))
        self.V.append([rmse, medae, lp, ssim, psnr])
        self.N += 1

    def measure(self):
        return np.nanmean(np.array(self.V, np.float64), axis=0) \
            if self.V else np.full(5, np.nan)

    def write(self, writer, global_step, prefix="", suffix=""):
        if writer is not None:
            writer.add_scalar(os.path.join(prefix, "error" + suffix),
                              self.measure()[0], global_step)

    def report(self):
        return f"{type(self).__name__} (RMSE, MedAE, LPIPS, SSIM, PSNR) = " \
               f"{self.measure()}"


class IntensityMeter_L4D(_L4DMeter):
    def __init__(self, scale, lpips_meter=None):
        super().__init__(scale, 1e-6, 1.0, lpips_meter)


class DepthMeter_L4D(_L4DMeter):
    def __init__(self, scale, lpips_meter=None):
        super().__init__(scale, 1e-6, 80.0, lpips_meter)


class PointsMeter(Meter):
    """Chamfer distance + F-score@0.05 from depth panos
    (``error_matrices.py:299-356``)."""

    def __init__(self, scale, intrinsics, intrinsics_hoz=(180.0, 360.0)):
        self.scale = scale
        self.intrinsics = intrinsics
        self.intrinsics_hoz = intrinsics_hoz
        self.clear()

    def clear(self):
        self.V, self.N = [], 0

    def update(self, preds, truths):
        p = _np(preds) / self.scale
        t = _np(truths) / self.scale
        if p.ndim == 3:
            p, t = p[0], t[0]
        pred_pts = pano_to_lidar(p, self.intrinsics, self.intrinsics_hoz)
        gt_pts = pano_to_lidar(t, self.intrinsics, self.intrinsics_hoz)
        if len(pred_pts) == 0 or len(gt_pts) == 0:
            self.V.append([np.nan, 0.0])
            self.N += 1
            return
        d1, d2 = chamfer_distance(pred_pts.astype(np.float32),
                                  gt_pts.astype(np.float32))
        d1, d2 = _np(d1), _np(d2)
        cd = float(d1.mean() + d2.mean())
        f, _, _ = fscore_from_dists(d1, d2, threshold=0.05)
        self.V.append([cd, f])
        self.N += 1

    def measure(self):
        return np.array(self.V, np.float64).mean(0) if self.V \
            else np.full(2, np.nan)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(os.path.join(prefix, "Point error (CD)"),
                              self.measure()[0], global_step)

    def report(self):
        cd, f = self.measure()
        return f"Points_error(CD, F-score) = [{cd:.4f}, {f:.4f}]"


class RaydropMeter(Meter):
    """RMSE / accuracy / F1 at threshold (``error_matrices.py:359-413``)."""

    def __init__(self, ratio=0.5):
        self.ratio = ratio
        self.clear()

    def clear(self):
        self.V, self.N = [], 0

    def update(self, preds, truths):
        p, t = _np(preds), _np(truths)
        rmse = float(np.sqrt(((t - p) ** 2).mean()))
        pm = (p > self.ratio).astype(np.int32)
        acc = float((pm == t).mean())
        TP = np.sum((t == 1) & (pm == 1))
        FP = np.sum((t == 0) & (pm == 1))
        FN = np.sum((t == 1) & (pm == 0))
        prec = TP / max(TP + FP, 1e-8)
        rec = TP / max(TP + FN, 1e-8)
        f1 = 2 * prec * rec / max(prec + rec, 1e-8)
        self.V.append([rmse, acc, f1])
        self.N += 1

    def measure(self):
        return np.array(self.V, np.float64).mean(0) if self.V \
            else np.full(3, np.nan)

    def report(self):
        return f"Raydrop (RMSE, Acc, F1) = {self.measure()}"


def depth_error_ratio(gt, pred, min_depth=1e-3, max_depth=80.0):
    """Signed range error with clipping (``error_matrices.py:517-546``)."""
    gt = np.clip(_np(gt), min_depth, max_depth)
    pred = np.clip(_np(pred), min_depth, max_depth)
    return gt - pred


def write_error_matrix(meters: dict, out_path: str, extra: Optional[dict]
                       = None) -> dict:
    """JSON error-matrix dump, one file per eval x category
    (``nvsf/nerf/utils.py:386-442`` semantics)."""
    result = {}
    for name, meter in meters.items():
        m = meter.measure()
        result[name] = m.tolist() if isinstance(m, np.ndarray) else float(m)
    if extra:
        result.update(extra)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result
