"""U-Net ray-drop refiner in pure JAX (rebuilds ``nvsf/nerf/models/unet.py``).

Architecture: 1x1 in-conv -> 4x (maxpool + DoubleConv) down path
(32-64-128-256-256) -> multi-head attention bottleneck -> 4x (bilinear up +
skip concat + DoubleConv) -> BN/ReLU/1x1 out -> sigmoid.

DoubleConv is (BN -> ReLU -> Dropout2d -> Conv3x3) x2, bias-free convs.
BatchNorm carries running statistics as explicit state; attention applies
the reference's Bernoulli -1e12 logit dropout during training
(``unet.py:99-103``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


def _conv(x, w, stride=1, padding="SAME"):
    """x: [B, C, H, W]; w: [O, I, kh, kw]."""
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _init_conv(key, out_ch, in_ch, k):
    fan_in = in_ch * k * k
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, (out_ch, in_ch, k, k), jnp.float32,
                              -bound, bound)


def _bn_init(ch):
    return ({"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))},
            {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))})


def _bn_apply(params, stats, x, train, momentum=0.9, eps=1e-5):
    if train:
        mean = x.mean(axis=(0, 2, 3))
        var = x.var(axis=(0, 2, 3))
        new_stats = {"mean": momentum * stats["mean"] + (1 - momentum) * mean,
                     "var": momentum * stats["var"] + (1 - momentum) * var}
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + eps)[None, :, None, None]
    y = (x - mean[None, :, None, None]) * inv \
        * params["scale"][None, :, None, None] \
        + params["bias"][None, :, None, None]
    return y, new_stats


def _dropout2d(key, x, rate, train):
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape[:2])
    return x * keep[:, :, None, None] / (1.0 - rate)


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                 (1, 1, 2, 2), "VALID")


def _upsample2(x):
    """Bilinear x2 upsample with align_corners=True (``unet.py:58``)."""
    B, C, H, W = x.shape
    return jax.image.resize(x, (B, C, H * 2, W * 2), method="bilinear")


@dataclass(frozen=True)
class UNetSpec:
    in_channels: int = 3
    channels: int = 32
    out_channels: int = 1
    dropout: float = 0.1
    num_heads: int = 8

    # ------------------------------------------------------------------
    def _double_conv_init(self, key, in_ch, out_ch, mid_ch=None):
        mid_ch = mid_ch or out_ch
        k1, k2 = jax.random.split(key)
        bn1_p, bn1_s = _bn_init(in_ch)
        bn2_p, bn2_s = _bn_init(mid_ch)
        params = {"bn1": bn1_p, "conv1": _init_conv(k1, mid_ch, in_ch, 3),
                  "bn2": bn2_p, "conv2": _init_conv(k2, out_ch, mid_ch, 3)}
        stats = {"bn1": bn1_s, "bn2": bn2_s}
        return params, stats

    def _double_conv(self, p, s, key, x, train):
        k1, k2 = jax.random.split(key)
        h, s1 = _bn_apply(p["bn1"], s["bn1"], x, train)
        h = jax.nn.relu(h)
        h = _dropout2d(k1, h, self.dropout, train)
        h = _conv(h, p["conv1"])
        h, s2 = _bn_apply(p["bn2"], s["bn2"], h, train)
        h = jax.nn.relu(h)
        h = _dropout2d(k2, h, self.dropout, train)
        h = _conv(h, p["conv2"])
        return h, {"bn1": s1, "bn2": s2}

    # ------------------------------------------------------------------
    def init(self, key) -> Tuple[dict, dict]:
        C = self.channels
        ks = jax.random.split(key, 16)
        params, stats = {}, {}
        params["inc"] = _init_conv(ks[0], C, self.in_channels, 1)
        downs = [(C, 2 * C), (2 * C, 4 * C), (4 * C, 8 * C), (8 * C, 8 * C)]
        for i, (ci, co) in enumerate(downs):
            p, s = self._double_conv_init(ks[1 + i], ci, co)
            params[f"down{i + 1}"], stats[f"down{i + 1}"] = p, s
        # attention (``unet.py:74-108``)
        attn_bn_p, attn_bn_s = _bn_init(8 * C)
        params["attn"] = {
            "norm": attn_bn_p,
            "qkv": _init_conv(ks[5], 8 * C * 3, 8 * C, 1),
            "proj": _init_conv(ks[6], 8 * C, 8 * C, 1),
        }
        stats["attn"] = {"norm": attn_bn_s}
        ups = [(16 * C, 4 * C), (8 * C, 2 * C), (4 * C, C), (2 * C, C)]
        for i, (ci, co) in enumerate(ups):
            p, s = self._double_conv_init(ks[7 + i], ci, co, mid_ch=ci)
            params[f"up{i + 1}"], stats[f"up{i + 1}"] = p, s
        out_bn_p, out_bn_s = _bn_init(C)
        params["outc"] = {"bn": out_bn_p,
                          "conv": _init_conv(ks[11], self.out_channels, C, 1)}
        stats["outc"] = {"bn": out_bn_s}
        return params, stats

    # ------------------------------------------------------------------
    def _attention(self, p, s, key, x, train):
        B, C, H, W = x.shape
        h, ns = _bn_apply(p["norm"], s["norm"], x, train)
        qkv = _conv(h, p["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=1)
        nh = self.num_heads
        hd = C // nh
        q = q.reshape(B, nh, hd, H * W).transpose(0, 1, 3, 2)  # [B,nh,HW,hd]
        k = k.reshape(B, nh, hd, H * W)                        # [B,nh,hd,HW]
        v = v.reshape(B, nh, hd, H * W).transpose(0, 1, 3, 2)
        w = jnp.einsum("bnqd,bndk->bnqk", q, k) * (hd ** -0.5)
        if train:
            drop = jax.random.bernoulli(key, self.dropout, w.shape)
            w = w + drop * -1e12
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bnqk,bnkd->bnqd", w, v)                # [B,nh,HW,hd]
        # reference reshapes [B, H, W, C] -> NCHW (``unet.py:106``)
        h = h.transpose(0, 1, 3, 2).reshape(B, C, H, W)
        h = _conv(h, p["proj"])
        return x + h, {"norm": ns}

    def _pad_to(self, x, target):
        dy = target.shape[2] - x.shape[2]
        dx = target.shape[3] - x.shape[3]
        return jnp.pad(x, ((0, 0), (0, 0),
                           (dy // 2, dy - dy // 2),
                           (dx // 2, dx - dx // 2)))

    def apply(self, params, stats, x, *, train=False, key=None):
        """x: [B, 3, H, W] (raydrop, intensity, depth) -> refined raydrop
        [B, 1, H, W] in [0, 1]. Returns (out, new_stats)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 10)
        new_stats = {}
        x0 = _conv(x, params["inc"])
        feats = [x0]
        h = x0
        for i in range(4):
            h = _maxpool2(h)
            h, s = self._double_conv(params[f"down{i + 1}"],
                                     stats[f"down{i + 1}"], ks[i], h, train)
            new_stats[f"down{i + 1}"] = s
            feats.append(h)
        h, s = self._attention(params["attn"], stats["attn"], ks[4],
                               feats[4], train)
        new_stats["attn"] = s
        skips = [feats[3], feats[2], feats[1], feats[0]]
        for i in range(4):
            h = _upsample2(h)
            h = self._pad_to(h, skips[i])
            h = jnp.concatenate([skips[i], h], axis=1)
            h, s = self._double_conv(params[f"up{i + 1}"],
                                     stats[f"up{i + 1}"], ks[5 + i], h, train)
            new_stats[f"up{i + 1}"] = s
        h, s = _bn_apply(params["outc"]["bn"], stats["outc"]["bn"], h, train)
        new_stats["outc"] = {"bn": s}
        h = jax.nn.relu(h)
        logits = _conv(h, params["outc"]["conv"])
        return jax.nn.sigmoid(logits), new_stats
