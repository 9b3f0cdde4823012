"""Multi-corner one-hot MXU sampling: XLA-vs-Pallas(interpret) equivalence,
gradients to tables AND weights, and the plane fast paths vs the reference
bilinear."""

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.ops import multihot as mh

W_SEG = 256


def _inputs(key, Q=2, S=3, C=2, Np=512, F=4):
    ks = jax.random.split(key, 3)
    tables = jax.random.normal(ks[0], (F, Q * S * W_SEG), jnp.float32)
    cols = jax.random.randint(ks[1], (Q, S, C, Np), 0, W_SEG, jnp.int32)
    ws = jax.random.uniform(ks[2], (Q, S, C, Np), jnp.float32)
    return tables, cols, ws


def test_xla_path_matches_manual():
    tables, cols, ws = _inputs(jax.random.PRNGKey(0))
    out = mh.multihot_sample(tables, cols, ws, W_SEG, use_pallas=False)
    Q, S, C, Np = cols.shape
    for q in range(Q):
        for s in range(S):
            seg = tables[:, (q * S + s) * W_SEG:(q * S + s + 1) * W_SEG]
            ref = sum(ws[q, s, c] * seg[:, cols[q, s, c]] for c in range(C))
            np.testing.assert_allclose(np.asarray(out[q, s]),
                                       np.asarray(ref), atol=1e-5)


def test_pallas_interpret_matches_xla():
    from functools import partial
    orig = mh.pl.pallas_call
    mh.pl.pallas_call = partial(orig, interpret=True)
    mh._make_op.cache_clear()
    try:
        tables, cols, ws = _inputs(jax.random.PRNGKey(1), C=4)
        got = mh.multihot_sample(tables, cols, ws, W_SEG, use_pallas=True)
        ref = mh.multihot_sample(tables, cols, ws, W_SEG, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

        def loss(flag):
            def inner(tbl, w):
                o = mh.multihot_sample(tbl, cols, w, W_SEG, use_pallas=flag)
                return jnp.sum(jnp.sin(o))
            return inner

        g1 = jax.grad(loss(True), argnums=(0, 1))(tables, ws)
        g2 = jax.grad(loss(False), argnums=(0, 1))(tables, ws)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)

        # need_dw=False: table grads still exact, weight grads zero
        def loss_nw(tbl):
            o = mh.multihot_sample(tbl, cols, ws, W_SEG, use_pallas=True,
                                   need_dw=False)
            return jnp.sum(jnp.sin(o))
        g3 = jax.grad(loss_nw)(tables)
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g2[0]),
                                   atol=1e-4)
    finally:
        mh.pl.pallas_call = orig
        mh._make_op.cache_clear()


def test_planes_dynamic_matches_reference_bilinear():
    """apply_dynamic (folded path) == explicit bilinear over (a, t)."""
    from nvsf_tpu.models.planes import (Planes4DSpec, _COO_COMBS, _DYNAMIC,
                                        bilinear_sample)

    spec = Planes4DSpec(output_dim=2, resolution=(8, 8, 8, 4),
                        multiscale_res=(1, 2))
    params = spec.init(jax.random.PRNGKey(0))
    params = [[p + 0.3 * jax.random.normal(jax.random.PRNGKey(i * 6 + j),
                                           p.shape)
               for j, p in enumerate(row)] for i, row in enumerate(params)]
    xt = jax.random.uniform(jax.random.PRNGKey(2), (33, 4))
    xt = xt.at[:, 3].set(xt[0, 3])  # scalar shared time

    got = spec.apply_dynamic(params, xt)
    refs = []
    for si in range(2):
        feat = None
        for ci in _DYNAMIC:
            a, b = _COO_COMBS[ci]
            H, W = spec.plane_hw(si, ci)
            f = bilinear_sample(params[si][ci].reshape(2, H, W),
                                xt[:, a], xt[:, b])
            feat = f if feat is None else feat * f
        refs.append(feat)
    ref = jnp.concatenate(refs, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_planes_static_hybrid_matches_reference_bilinear():
    """apply_static (multihot coarse scales + gather fine scales) ==
    explicit bilinear product, across the multihot/gather boundary."""
    from nvsf_tpu.models.planes import (Planes4DSpec, _COO_COMBS, _STATIC,
                                        bilinear_sample)

    spec = Planes4DSpec(output_dim=2, resolution=(32, 32, 32, 4),
                        multiscale_res=(1, 2, 4, 8))
    assert spec.MULTIHOT_MAX_W == 4096  # scales 1,2 coarse; 4,8 fine
    params = spec.init(jax.random.PRNGKey(0))
    xt = jax.random.uniform(jax.random.PRNGKey(2), (40, 4))

    got = spec.apply_static(params, xt)
    refs = []
    for si in range(4):
        feat = None
        for ci in _STATIC:
            a, b = _COO_COMBS[ci]
            H, W = spec.plane_hw(si, ci)
            f = bilinear_sample(params[si][ci].reshape(2, H, W),
                                xt[:, a], xt[:, b])
            feat = f if feat is None else feat * f
        refs.append(feat)
    ref = jnp.concatenate(refs, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
