"""Time-folded K-plane MXU sampling: XLA-vs-Pallas(interpret) equivalence,
gradients to tables AND lerp weights, and the planes fast path vs the
reference bilinear."""

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.ops import timeplanes as tp


def _inputs(key, Q=2, S=3, Np=512, F=4):
    ks = jax.random.split(key, 5)
    tables = jax.random.normal(ks[0], (F, Q * S * tp.W_PAD), jnp.float32)
    c0 = jax.random.randint(ks[1], (Q, S, Np), 0, 200, jnp.int32)
    c1 = jnp.minimum(c0 + 1, 255)
    w1 = jax.random.uniform(ks[2], (Q, S, Np), jnp.float32)
    w0 = 1.0 - w1
    return tables, c0, c1, w0, w1


def test_xla_path_matches_manual():
    tables, c0, c1, w0, w1 = _inputs(jax.random.PRNGKey(0))
    out = tp.timeplane_sample(tables, c0, c1, w0, w1, use_pallas=False)
    Q, S, Np = c0.shape
    for q in range(Q):
        for s in range(S):
            seg = tables[:, (q * S + s) * tp.W_PAD:(q * S + s + 1) * tp.W_PAD]
            ref = w0[q, s] * seg[:, c0[q, s]] + w1[q, s] * seg[:, c1[q, s]]
            np.testing.assert_allclose(np.asarray(out[q, s]), np.asarray(ref),
                                       atol=1e-6)


def test_pallas_interpret_matches_xla():
    from functools import partial
    orig = tp.pl.pallas_call
    tp.pl.pallas_call = partial(orig, interpret=True)
    tp._make_op.cache_clear()
    try:
        tables, c0, c1, w0, w1 = _inputs(jax.random.PRNGKey(1))
        got = tp.timeplane_sample(tables, c0, c1, w0, w1, use_pallas=True)
        ref = tp.timeplane_sample(tables, c0, c1, w0, w1, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

        # gradients: tables and weights
        def loss(fn_flag):
            def inner(tbl, w0_, w1_):
                o = tp.timeplane_sample(tbl, c0, c1, w0_, w1_,
                                        use_pallas=fn_flag)
                return jnp.sum(jnp.sin(o))
            return inner

        g1 = jax.grad(loss(True), argnums=(0, 1, 2))(tables, w0, w1)
        g2 = jax.grad(loss(False), argnums=(0, 1, 2))(tables, w0, w1)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
    finally:
        tp.pl.pallas_call = orig
        tp._make_op.cache_clear()


def test_planes_dynamic_matches_reference_bilinear():
    """apply_dynamic (folded path) == explicit bilinear over (a, t)."""
    from nvsf_tpu.models.planes import (Planes4DSpec, _COO_COMBS, _DYNAMIC,
                                        bilinear_sample)

    spec = Planes4DSpec(output_dim=2, resolution=(8, 8, 8, 4),
                        multiscale_res=(1, 2))
    params = spec.init(jax.random.PRNGKey(0))
    # perturb so the check is non-trivial (time planes init to ones)
    params = [[p + 0.3 * jax.random.normal(jax.random.PRNGKey(i * 6 + j),
                                           p.shape)
               for j, p in enumerate(row)] for i, row in enumerate(params)]
    xt = jax.random.uniform(jax.random.PRNGKey(2), (33, 4))
    xt = xt.at[:, 3].set(xt[0, 3])  # scalar shared time

    got = spec.apply_dynamic(params, xt)
    # reference: product over the 3 dynamic planes per scale
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
