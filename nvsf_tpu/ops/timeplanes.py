"""Time-folded K-plane sampling as pure MXU one-hot matmuls (no gathers).

The dynamic K-planes (xt / yt / zt, ``planes_field.py:86-140``) have TIME as
their second coordinate, and within one train/render step the query time is
a SCALAR. Folding the t-lerp into the table rows (exactly like the hash
grids' time-bin fold) leaves a 1-D lerp over tables of only W<=256 columns
per (plane, scale) — small enough that both the "gather" and its gradient
are computed as in-register one-hot matmuls on the MXU:

  forward : feat[n]    = w0[n] * T[c0[n]] + w1[n] * T[c1[n]]
          == T_fm @ (onehot(c0) * w0 + onehot(c1) * w1)      (per segment)
  backward: dT = g @ wo^T        dw0[n] = <T[:, c0[n]], g[:, n]>

No sort, no scatter, no HBM random access: the concatenated folded tables
(Q queries x 12 plane-scales x 256 lanes of 8 features, ~300KB) sit in VMEM
for the whole kernel. This replaces ~100 small XLA gathers + their
serialized scatter-add backward, which measured ~0.5s of a 1.2s train step
on v5e.

All segment widths are padded to a uniform 256 lanes so every slice is
128-aligned; one-hot compares never select the padding (cols < true W).

Used by ``Planes4DSpec.apply_dynamic_multi``; the static (xy/xz/yz) planes
keep XLA's fast small-table gather path (both coordinates per-sample).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 512   # samples per grid step
W_PAD = 256  # uniform per-segment lane width


def _fwd_kernel(S, F, c0_ref, c1_ref, w0_ref, w1_ref, tbl_ref, out_ref):
    q = pl.program_id(0)
    for s in range(S):
        k0 = c0_ref[0, s]                                # [CH] lanes
        k1 = c1_ref[0, s]
        w0 = w0_ref[0, s]
        w1 = w1_ref[0, s]
        rows = jax.lax.broadcasted_iota(jnp.int32, (W_PAD, _CH), 0)
        wo = (jnp.where(rows == k0[None, :], 1.0, 0.0) * w0[None, :]
              + jnp.where(rows == k1[None, :], 1.0, 0.0) * w1[None, :])
        tbl = tbl_ref[:, pl.ds((q * S + s) * W_PAD, W_PAD)]   # [F, W]
        out_ref[0, s] = jnp.dot(tbl, wo,
                                preferred_element_type=jnp.float32)  # [F,CH]


def _bwd_kernel(S, F, c0_ref, c1_ref, w0_ref, w1_ref, tbl_ref, g_ref,
                dtbl_ref, dw0_ref, dw1_ref):
    q = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when((q == 0) & (c == 0))
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    for s in range(S):
        k0 = c0_ref[0, s]
        k1 = c1_ref[0, s]
        w0 = w0_ref[0, s]
        w1 = w1_ref[0, s]
        g = g_ref[0, s]                                  # [F, CH]
        rows = jax.lax.broadcasted_iota(jnp.int32, (W_PAD, _CH), 0)
        oh0 = jnp.where(rows == k0[None, :], 1.0, 0.0)   # [W, CH]
        oh1 = jnp.where(rows == k1[None, :], 1.0, 0.0)
        wo = oh0 * w0[None, :] + oh1 * w1[None, :]
        # dT_s [F, W] += g [F, CH] @ wo^T [CH, W]
        dtbl_ref[:, pl.ds((q * S + s) * W_PAD, W_PAD)] += jax.lax.dot_general(
            g, wo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dw[n] = <T[:, c[n]], g[:, n]> ; T rows via the one-hot matmul
        tbl = tbl_ref[:, pl.ds((q * S + s) * W_PAD, W_PAD)]   # [F, W]
        v0 = jnp.dot(tbl, oh0, preferred_element_type=jnp.float32)
        v1 = jnp.dot(tbl, oh1, preferred_element_type=jnp.float32)
        dw0_ref[0, s] = jnp.sum(v0 * g, axis=0)
        dw1_ref[0, s] = jnp.sum(v1 * g, axis=0)


@functools.lru_cache(maxsize=None)
def _make_op(Q, S, Np, F, use_pallas):
    grid = (Q, Np // _CH)
    total = Q * S * W_PAD

    def xla_path(tables, c0, c1, w0, w1):
        seg = (jnp.arange(Q * S, dtype=jnp.int32) * W_PAD).reshape(Q, S, 1)
        g0 = (c0 + seg).reshape(-1)
        g1 = (c1 + seg).reshape(-1)
        v0 = tables.at[:, g0].get(mode="promise_in_bounds")
        v1 = tables.at[:, g1].get(mode="promise_in_bounds")
        v0 = v0.reshape(F, Q, S, Np)
        v1 = v1.reshape(F, Q, S, Np)
        out = w0[..., None] * jnp.moveaxis(v0, 0, 3) \
            + w1[..., None] * jnp.moveaxis(v1, 0, 3)      # [Q, S, Np, F]
        return jnp.moveaxis(out, 3, 2)                    # [Q, S, F, Np]

    if not use_pallas:
        return xla_path

    spec_i = pl.BlockSpec((1, S, _CH), lambda q, c: (q, 0, c),
                          memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((F, total), lambda q, c: (0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, S, F, _CH), lambda q, c: (q, 0, 0, c),
                          memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, S, F),
        grid=grid,
        in_specs=[spec_i, spec_i, spec_i, spec_i, spec_t],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((Q, S, F, Np), jnp.float32),
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, S, F),
        grid=grid,
        in_specs=[spec_i, spec_i, spec_i, spec_i, spec_t, spec_o],
        out_specs=[spec_t, spec_i, spec_i],
        out_shape=[
            jax.ShapeDtypeStruct((F, total), jnp.float32),
            jax.ShapeDtypeStruct((Q, S, Np), jnp.float32),
            jax.ShapeDtypeStruct((Q, S, Np), jnp.float32),
        ],
    )

    @jax.custom_vjp
    def op(tables, c0, c1, w0, w1):
        return fwd_call(c0, c1, w0, w1, tables)

    def fwd(tables, c0, c1, w0, w1):
        return op(tables, c0, c1, w0, w1), (tables, c0, c1, w0, w1)

    def bwd(res, g):
        tables, c0, c1, w0, w1 = res
        d_tbl, d_w0, d_w1 = bwd_call(c0, c1, w0, w1, tables,
                                     g.astype(jnp.float32))
        return d_tbl, None, None, d_w0, d_w1

    op.defvjp(fwd, bwd)
    return op


def timeplane_sample(tables, c0, c1, w0, w1,
                     use_pallas: bool | None = None):
    """Weighted two-corner sampling over per-(query, segment) 1-D tables.

    tables: [F, Q * S * 256] lane-concatenated folded tables (query-major,
    then segment, each padded to 256 lanes). c0/c1: [Q, S, Np] int32 LOCAL
    column ids in [0, width_s); w0/w1: matching f32 lerp weights. Np must
    be a multiple of 512. Returns [Q, S, F, Np] features
    (= w0 * T[c0] + w1 * T[c1], features-major with N on lanes).

    Gradients flow to ``tables`` and to the weights (the flow field learns
    through the warped K-planes, ``network_dynamic.py:245-271``).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    Q, S, Np = c0.shape
    F = tables.shape[0]
    assert tables.shape[1] == Q * S * W_PAD, (tables.shape, Q, S)
    return _make_op(Q, S, Np, F, use_pallas)(tables, c0, c1, w0, w1)
