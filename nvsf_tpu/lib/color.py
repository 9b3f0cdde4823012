"""Color-space conversions (``nvsf/nerf/utils.py:30-41``)."""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92,
                     ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * (x ** (1.0 / 2.4)) - 0.055)
