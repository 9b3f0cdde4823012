"""Pallas TPU kernel: blocked nearest-neighbor squared distances (chamfer).

The hot op of the self-supervised chamfer losses (``chamfer3D.cu`` in the
reference). The pairwise-distance block is computed as
|a|^2 + |b|^2 - 2 a.b^T on the MXU and min-reduced entirely in VMEM — the
[N, M] distance matrix never exists in HBM (the pure-XLA fallback in
``nvsf_tpu/ops/chamfer.py`` streams blocks through HBM between scan steps).

Layouts are point-major [3, N]: the TPU (8, 128) tile makes a trailing dim
of 3 catastrophically padded, so coordinates live on the sublane axis.

Note on the hash-grid encoder: a Pallas VMEM gather kernel was evaluated
and rejected twice (r1, r2) — Mosaic's dynamic lane gather only handles a
single 128-lane vreg ("Multiple source vregs along gather dimension"), so
table-sized gathers cannot lower. The encoder forward stays on XLA gathers;
the encoder BACKWARD is the Pallas sort+one-hot-matmul segment sum in
``nvsf_tpu/ops/segsum.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _min_dist_kernel(a_ref, b_ref, bmask_ref, o_ref):
    """Grid (i over A blocks, j over B blocks); o[i] = min_j block-min."""
    j = pl.program_id(1)
    a = a_ref[:]                     # [3, BN]
    b = b_ref[:]                     # [3, BM]
    bm = bmask_ref[:]                # [1, BM] float (1 valid / 0 pad)
    a2 = jnp.sum(a * a, axis=0)      # [BN]
    b2 = jnp.sum(b * b, axis=0)      # [BM]
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [BN, BM]
    d2 = a2[:, None] + b2[None, :] - 2.0 * ab
    d2 = jnp.where(bm > 0.0, d2, _BIG)
    m = jnp.min(d2, axis=-1)                             # [BN]

    @pl.when(j == 0)
    def _():
        o_ref[:] = m[None, :]

    @pl.when(j > 0)
    def _():
        o_ref[:] = jnp.minimum(o_ref[:], m[None, :])


@functools.partial(jax.jit, static_argnames=("block_n", "block_m"))
def min_dist2_pallas(a, b, b_mask=None, block_n: int = 512,
                     block_m: int = 1024):
    """For each point of a [N, 3]: squared distance to nearest valid b
    [M, 3]. Shapes are padded to block multiples internally."""
    N, M = a.shape[0], b.shape[0]
    if b_mask is None:
        b_mask = jnp.ones((M,), jnp.float32)
    else:
        b_mask = b_mask.astype(jnp.float32)
    pad_n = (-N) % block_n
    pad_m = (-M) % block_m
    a_t = jnp.pad(a.astype(jnp.float32), ((0, pad_n), (0, 0))).T  # [3, Np]
    b_t = jnp.pad(b.astype(jnp.float32), ((0, pad_m), (0, 0))).T  # [3, Mp]
    bm = jnp.pad(b_mask, (0, pad_m))[None, :]                     # [1, Mp]
    gi, gj = (N + pad_n) // block_n, (M + pad_m) // block_m

    out = pl.pallas_call(
        _min_dist_kernel,
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec((3, block_n), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N + pad_n), jnp.float32),
    )(a_t, b_t, bm)
    return jnp.maximum(out[0, :N], 0.0)


def chamfer_distance_pallas(a, b, a_mask=None, b_mask=None, **blocks):
    """Bidirectional chamfer via the Pallas kernel (same contract as
    ``nvsf_tpu.ops.chamfer.chamfer_distance``)."""
    d1 = min_dist2_pallas(a, b, b_mask, **blocks)
    d2 = min_dist2_pallas(b, a, a_mask, **blocks)
    if a_mask is not None:
        d1 = jnp.where(a_mask, d1, 0.0)
    if b_mask is not None:
        d2 = jnp.where(b_mask, d2, 0.0)
    return d1, d2
