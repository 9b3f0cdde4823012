"""Loss-library unit tests (criteria golden values, URF behavior, extras)."""

import jax.numpy as jnp
import numpy as np

from nvsf_tpu.train import losses as L


def test_criteria_golden():
    p = jnp.array([0.5, 1.0])
    g = jnp.array([0.0, 2.0])
    np.testing.assert_allclose(np.asarray(L.mse(p, g)), [0.25, 1.0])
    np.testing.assert_allclose(np.asarray(L.l1(p, g)), [0.5, 1.0])
    # huber delta=1: quadratic below delta
    np.testing.assert_allclose(np.asarray(L.huber(p, g, 1.0)),
                               [0.125, 0.5])
    # bce-with-logits at logit 0 is log(2)
    np.testing.assert_allclose(
        float(L.bce_with_logits(jnp.array(0.0), jnp.array(1.0))),
        np.log(2), rtol=1e-6)
    # cosine of identical vectors is 1
    np.testing.assert_allclose(
        float(L.cosine_similarity(jnp.array([1.0, 2, 3]),
                                  jnp.array([2.0, 4, 6]))), 1.0, rtol=1e-6)


def test_urf_loss_prefers_correct_surface():
    """Weights matching the target near-surface gaussian must score (much)
    lower than weights spread into empty space. Evaluated at step 0 where
    eps = 0.02 so the near window spans several samples."""
    T = 256
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (4, T))
    gt = jnp.full((4,), 0.5)
    eps, sigma = 0.02, 0.02 / 3.0
    mask_near = (jnp.abs(z - 0.5) < eps)
    distr = jnp.exp(-((z - 0.5) ** 2) / (2 * sigma ** 2)) \
        / (sigma * jnp.sqrt(2 * jnp.pi))
    distr = distr / distr.max() * mask_near
    l_good = float(L.urf_line_of_sight_loss(distr, z, gt, 0, 10_000))
    bad = jnp.ones((4, T)) * 0.5
    l_bad = float(L.urf_line_of_sight_loss(bad, z, gt, 0, 10_000))
    assert l_good < 0.1 * l_bad, (l_good, l_bad)


def test_eff_distortion_matches_quadratic():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(0, 1, (3, 16)), jnp.float32)
    m = jnp.asarray(np.sort(rng.uniform(0, 1, (3, 16)), axis=-1), jnp.float32)
    eff = np.asarray(L.eff_distortion_loss(w, m))
    # O(T^2) direct
    wn, mn = np.asarray(w), np.asarray(m)
    cross = np.einsum("ni,nj,nij->n", wn, wn,
                      np.abs(mn[:, :, None] - mn[:, None, :]))
    d = np.concatenate([mn[:, 1:] - mn[:, :-1],
                        np.zeros((3, 1), np.float32)], -1)
    direct = cross + (wn ** 2 * d).sum(-1) / 3.0
    np.testing.assert_allclose(eff, direct, rtol=1e-4)


def test_mape():
    v = L.mape_loss(jnp.array([1.1]), jnp.array([1.0]))
    np.testing.assert_allclose(float(v[0]), 0.1 / 1.01, rtol=1e-4)


def test_flow_consistency_zero_for_perfect_flow():
    pc = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)),
                     jnp.float32)
    shift = jnp.array([0.1, 0.0, 0.0])
    pc_next = pc + shift
    mask = jnp.ones(50, bool)
    flow = jnp.broadcast_to(shift, pc.shape)
    v = float(L.flow_consistency_loss(pc, mask, pc_next, mask, flow))
    # chamfer ~0; magnitude term = mean|flow| = 0.1/3
    np.testing.assert_allclose(v, 0.1 / 3, atol=1e-3)


def test_scrub():
    assert float(L.scrub_loss(jnp.asarray(jnp.nan))) == 0.0
    assert float(L.scrub_loss(jnp.asarray(jnp.inf))) == 1e5
    assert float(L.scrub_loss(jnp.asarray(3.0))) == 3.0
