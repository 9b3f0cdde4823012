"""Field/encoder unit tests: hash-grid interpolation, K-planes semantics,
Lagrange temporal basis, flow field, and the composed NVSF field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvsf_tpu.models.encodings import frequency_encode, sh_encode_deg4
from nvsf_tpu.models.field import NVSFFieldSpec, trunc_exp
from nvsf_tpu.models.flow import FlowFieldSpec
from nvsf_tpu.models.hash_grid import (HashEncodingSpec, HashGrid4DSpec,
                                       HashGridTSpec,
                                       lagrange_interp_features)
from nvsf_tpu.models.planes import Planes4DSpec, bilinear_sample

TINY = NVSFFieldSpec(
    min_resolution=8, n_levels_plane=2, base_resolution=16, max_resolution=64,
    time_resolution=4, n_levels_hash=4, log2_hashmap_size=10, num_frames=8,
    flow_n_levels=4, flow_n_features_per_level=4, flow_base_resolution=8,
    flow_max_resolution=32, flow_log2_hashmap_size=8)


def test_hash_encoding_shape_and_grad():
    spec = HashEncodingSpec(dim=3, n_levels=4, n_features_per_level=2,
                            log2_hashmap_size=8, base_resolution=4,
                            max_resolution=32)
    table = spec.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    f = spec.apply(table, x)
    assert f.shape == (17, 8)
    g = jax.grad(lambda tb: spec.apply(tb, x).sum())(table)
    assert g.shape == table.shape
    assert float(jnp.abs(g).sum()) > 0


def test_hash_encoding_trilinear_exact_on_dense_level():
    """A 1-level dense grid must reproduce exact trilinear interpolation."""
    spec = HashEncodingSpec(dim=3, n_levels=1, n_features_per_level=1,
                            log2_hashmap_size=12, base_resolution=4,
                            max_resolution=4)
    res = 4
    # table value at vertex (i,j,k) = i + 10j + 100k (linear => exact interp)
    ii, jj, kk = np.meshgrid(*([np.arange(res + 1)] * 3), indexing="ij")
    vals = (ii + 10 * jj + 100 * kk).astype(np.float32)
    table = np.zeros((1, spec.table_size), np.float32)  # [L*F, T]
    # dense index: x + y*(res+1) + z*(res+1)^2 (row-major over dims)
    flat_idx = ii + jj * (res + 1) + kk * (res + 1) ** 2
    table[0, flat_idx.reshape(-1)] = vals.reshape(-1)
    x = np.array([[0.25, 0.5, 0.75], [0.1, 0.2, 0.3]], np.float32)
    f = spec.apply(jnp.asarray(table), jnp.asarray(x))
    expected = (x[:, 0] * res) + 10 * (x[:, 1] * res) + 100 * (x[:, 2] * res)
    np.testing.assert_allclose(np.asarray(f[:, 0]), expected, rtol=1e-5)


def test_lagrange_interp_at_nodes():
    """At node times the Lagrange blend must return exactly that chunk."""
    N, L, F, B = 5, 2, 8, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (N, L * F))
    xv = np.asarray(x).reshape(N, L, F)
    for j, t in enumerate([0.0, 1 / 3, 2 / 3, 1.0]):
        out = lagrange_interp_features(x, t, L, F, B)
        expected = xv[:, :, j * (F // B):(j + 1) * (F // B)].reshape(N, -1)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_hashgrid_t_time_bins():
    spec = HashGridTSpec(time_resolution=4, base_resolution=8,
                         max_resolution=32, n_levels=4,
                         n_features_per_level=4, log2_hashmap_size=8)
    tables = spec.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 2))
    f0 = spec.apply(tables, x, 0.0)
    assert f0.shape == (9, spec.n_output_dims)
    # integer bin: must equal direct lookup of that bin (+ lagrange at t)
    f_bin1 = spec.apply(tables, x, 1.0 / 3.0)  # idx = 1 exactly
    direct = spec.grid.apply(tables[1], x)
    from nvsf_tpu.models.hash_grid import lagrange_interp_features as lif
    expected = lif(direct, 1.0 / 3.0, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(f_bin1), np.asarray(expected),
                               rtol=1e-4, atol=1e-6)


def test_hashgrid4d_output_dims():
    spec = HashGrid4DSpec(base_resolution=16, max_resolution=64,
                          time_resolution=4, n_levels=4,
                          n_features_per_level=4, log2_hashmap_size=10,
                          hash_size_dynamic=(8, 8, 8))
    p = spec.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3))
    s, d = spec.apply(p, x, 0.5)
    assert s.shape == (7, 4 * 4)
    assert d.shape == (7, 3 * (4 * 4 // 4))


def test_bilinear_sample_align_corners():
    plane = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    # u=1 -> x=3 (last col), v=1 -> y=2 (last row)
    out = bilinear_sample(plane, jnp.array([0.0, 1.0, 0.5]),
                          jnp.array([0.0, 1.0, 0.5]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 11.0, 5.5],
                               rtol=1e-6)


def test_planes4d_shapes_and_time_init():
    spec = Planes4DSpec(output_dim=8, resolution=(8, 8, 8, 4),
                        multiscale_res=(1, 2))
    p = spec.init(jax.random.PRNGKey(0))
    # time planes (those involving dim 3) init to ones
    for si in range(2):
        for ci, comb in enumerate(
                [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]):
            if 3 in comb:
                assert float(jnp.min(p[si][ci])) == 1.0
    xt = jax.random.uniform(jax.random.PRNGKey(1), (11, 4))
    s, d = spec.apply(p, xt)
    assert s.shape == (11, 16) and d.shape == (11, 16)
    # dynamic-only path matches the joint one
    d2 = spec.apply_dynamic(p, xt)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), rtol=1e-6)
    # with all-ones time planes and fresh init, dynamic feats = prod of three
    # ones-planes = 1 at every point
    np.testing.assert_allclose(np.asarray(d), 1.0, rtol=1e-6)


def test_frequency_and_sh_dims():
    d = jax.random.uniform(jax.random.PRNGKey(0), (5, 3))
    assert frequency_encode(d, 12).shape == (5, 72)
    assert sh_encode_deg4(d).shape == (5, 16)
    # SH l=0 term is constant
    np.testing.assert_allclose(np.asarray(sh_encode_deg4(d)[:, 0]),
                               0.28209479, rtol=1e-5)


def test_trunc_exp_grad_clamped():
    g = jax.grad(trunc_exp)(20.0)
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(trunc_exp)(2.0)
    np.testing.assert_allclose(float(g2), np.exp(2.0), rtol=1e-5)


def test_flow_field_small_output():
    spec = FlowFieldSpec(n_levels=4, n_features_per_level=4,
                         log2_hashmap_size=8, base_resolution=8,
                         max_resolution=32)
    p = spec.init(jax.random.PRNGKey(0))
    xt = jax.random.uniform(jax.random.PRNGKey(1), (13, 4))
    f = spec.apply(p, xt)
    assert f.shape == (13, 6)
    # last layer init N(0, 1e-3) -> tiny flows at init
    assert float(jnp.abs(f).max()) < 0.5


def test_nvsf_field_density_and_color():
    params = TINY.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=-1, maxval=1)
    for lidar in (True, False):
        out = jax.jit(TINY.density, static_argnames="cal_lidar_color")(
            params, x, 0.4, cal_lidar_color=lidar)
        assert out["sigma"].shape == (33,)
        assert out["geo_feat"].shape == (33, TINY.geo_feat_dim)
        assert bool(jnp.all(out["sigma"] > 0))
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        c = jax.jit(TINY.color, static_argnames="cal_lidar_color")(
            params, x, d, out["geo_feat"], cal_lidar_color=lidar)
        assert c.shape == (33, 2 if lidar else 3)
        assert bool(jnp.all((c >= 0) & (c <= 1)))


def test_nvsf_field_boundary_frames_jit():
    """density must jit with traced t and handle boundary frames."""
    params = TINY.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3), minval=-1, maxval=1)
    f = jax.jit(lambda t: TINY.density(params, x, t, True)["sigma"])
    for t in (0.0, 0.5, 1.0):
        s = f(jnp.asarray(t))
        assert np.isfinite(np.asarray(s)).all()


def test_nvsf_field_flow_grad_through_planes_only():
    """Gradient to the flow net flows via K-planes, not via the warped hash
    queries (stop_gradient replicates the reference's no_grad block).

    The time planes init to ones (constant tables -> zero position
    gradient, same as the reference at init), so they are perturbed first
    to make the flow gradient genuinely nonzero."""
    params = TINY.init(jax.random.PRNGKey(0))
    params["planes_lidar"] = [
        [p + 0.1 * jax.random.normal(jax.random.PRNGKey(si * 7 + ci), p.shape)
         for ci, p in enumerate(row)]
        for si, row in enumerate(params["planes_lidar"])]
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3), minval=-1, maxval=1)

    def loss(p):
        return TINY.density(p, x, 0.5, True)["sigma"].sum()

    g = jax.jit(jax.grad(loss))(params)
    flow_g = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g["flow"], 0.0)
    assert flow_g > 0  # planes path provides gradient


def test_lr_labels():
    params = TINY.init(jax.random.PRNGKey(0))
    labels = TINY.lr_labels(params)
    assert set(jax.tree_util.tree_leaves(labels["flow"])) == {"slow"}
    assert set(jax.tree_util.tree_leaves(labels["sigma_net"])) == {"base"}
