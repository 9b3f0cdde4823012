"""LPIPS (AlexNet variant) in JAX, loading weights from an npz file.

The reference uses the ``lpips`` pip package with pretrained AlexNet
(``error_matrices.py:164,484``). Pretrained weights cannot be downloaded in a
zero-egress environment, so this module evaluates LPIPS only when a weights
file is supplied (env ``NVSF_TPU_LPIPS_WEIGHTS``). Expected npz keys:
  conv{i}_w [out, in, kh, kw], conv{i}_b [out]  for i in 0..4  (AlexNet)
  lin{i}_w  [1, C_i, 1, 1]                       for i in 0..4  (LPIPS heads)
Export from torch: ``np.savez(path, **{k: v.numpy() for ...})``.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_ALEX_STRIDES = (4, 1, 1, 1, 1)
_ALEX_PADS = (2, 2, 1, 1, 1)
_POOL_AFTER = (True, True, False, False, False)  # maxpool after stages 0,1
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@lru_cache(maxsize=2)
def _load(path: str):
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def _features(w, x):
    """x: [1, 3, H, W] in [-1, 1] -> list of 5 stage activations."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
        / jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    for i in range(5):
        x = jax.lax.conv_general_dilated(
            x, w[f"conv{i}_w"], (_ALEX_STRIDES[i],) * 2,
            [(_ALEX_PADS[i],) * 2] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + w[f"conv{i}_b"][None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
        if _POOL_AFTER[i]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID")
    return feats


def _unit_norm(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True) + eps)


def lpips_from_file(path: str, a: np.ndarray, b: np.ndarray) -> float:
    """a, b: [H, W, 3] (or [H, W]) in [0, 1]. Returns LPIPS distance."""
    w = _load(path)

    def prep(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 2:
            x = np.stack([x] * 3, axis=-1)
        x = x * 2.0 - 1.0  # normalize=True semantics
        return jnp.asarray(x.transpose(2, 0, 1)[None])

    fa = _features(w, prep(a))
    fb = _features(w, prep(b))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_unit_norm(xa) - _unit_norm(xb)) ** 2
        lin = w[f"lin{i}_w"]
        total = total + jnp.mean(jnp.sum(lin * d, axis=1))
    return float(total)
