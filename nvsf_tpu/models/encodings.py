"""Parameter-free direction encodings (frequency, spherical harmonics).

Replaces the reference's tcnn.Encoding instantiations:
  - Frequency degree 12 for LiDAR view dirs (``network_dynamic.py:108-114``)
  - SphericalHarmonics degree 4 for camera view dirs
    (``network_dynamic.py:165-170``)

Both take inputs in [0, 1] as tcnn does (callers map d -> (d+1)/2).
"""

from __future__ import annotations

import jax.numpy as jnp


def frequency_encode(x: jnp.ndarray, degree: int = 12) -> jnp.ndarray:
    """tcnn 'Frequency' encoding: per input dim, (sin, cos) pairs at
    frequencies 2^l * pi, l = 0..degree-1. Output dim = D * degree * 2.

    Output layout is [dim-major]: for each input dim, all (sin_l, cos_l).
    """
    freqs = (2.0 ** jnp.arange(degree)) * jnp.pi  # [L]
    ang = x[..., :, None] * freqs  # [..., D, L]
    enc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., D, L, 2]
    return enc.reshape(*x.shape[:-1], x.shape[-1] * degree * 2)


def sh_encode_deg4(u: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics up to degree 4 (16 coefficients).

    Input u in [0, 1]^3 is mapped to the unit-cube direction 2u - 1 (tcnn
    convention; callers already normalized d to [0,1]). The polynomial
    forms match the standard hard-coded SH basis used by tcnn/instant-ngp.
    """
    d = u * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    out = [
        0.28209479177387814 * jnp.ones_like(x),            # l=0
        -0.48860251190291987 * y,                          # l=1
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,                           # l=2
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (x2 - y2),
        0.59004358992664352 * y * (-3.0 * x2 + y2),        # l=3
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ]
    return jnp.stack(out, axis=-1)


FREQ_DEG12_DIM = 3 * 12 * 2  # 72
SH_DEG4_DIM = 16
