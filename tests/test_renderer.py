"""Renderer tests: AABB intersection, closed-form single-surface compositing,
staged-vs-direct equivalence, importance sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.models.field import NVSFFieldSpec
from nvsf_tpu.render.renderer import (RendererSpec, near_far_from_aabb,
                                      sample_pdf)

TINY_FIELD = NVSFFieldSpec(
    min_resolution=8, n_levels_plane=2, base_resolution=16, max_resolution=64,
    time_resolution=4, n_levels_hash=4, log2_hashmap_size=10, num_frames=8,
    flow_n_levels=4, flow_n_features_per_level=4, flow_base_resolution=8,
    flow_max_resolution=32, flow_log2_hashmap_size=8)

REND = RendererSpec(field=TINY_FIELD, bound=1.0, min_near=0.05,
                    min_near_lidar=0.02, lidar_max_depth=0.9,
                    num_steps=64, max_ray_batch=32)


def test_near_far_axis_aligned():
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    o = jnp.array([[-3.0, 0, 0], [0, 0, 0], [-3.0, 5.0, 0]])
    d = jnp.array([[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]])
    nears, fars = near_far_from_aabb(o, d, aabb, min_near=0.05)
    np.testing.assert_allclose(np.asarray(nears[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fars[0]), 4.0, rtol=1e-5)
    # origin inside the box: near clamps to min_near
    np.testing.assert_allclose(np.asarray(nears[1]), 0.05, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fars[1]), 1.0, rtol=1e-5)
    # miss: zero span
    assert float(fars[2] - nears[2]) == 0.0


def test_compositing_single_surface_closed_form():
    """A synthetic opaque slab at depth d0 must composite to depth ~= d0 and
    weights_sum ~= 1. Uses a stub field via monkeypatched density/color."""

    class StubField:
        geo_feat_dim = 4

        def density(self, params, x, t, cal_lidar_color=False,
                    compute_dtype=jnp.float32, skip_warp=False):
            # dense wall beyond x > 0.35: huge sigma
            sigma = jnp.where(x[:, 0] > 0.35, 5e3, 0.0)
            return {"sigma": sigma, "geo_feat": jnp.zeros((x.shape[0], 4))}

        def color(self, params, x, d, geo_feat, cal_lidar_color=False,
                  mask=None, compute_dtype=jnp.float32):
            out = jnp.full((x.shape[0], 2 if cal_lidar_color else 3), 0.7)
            if mask is not None:
                out = jnp.where(mask[:, None], out, 0.0)
            return out

    spec = RendererSpec(field=StubField(), bound=1.0, min_near_lidar=0.02,
                        lidar_max_depth=0.9, num_steps=256)
    o = jnp.zeros((8, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (8, 1))
    out = spec.run(None, o, d, 0.0, cal_lidar_color=True)
    np.testing.assert_allclose(np.asarray(out["weights_sum_lidar"]), 1.0,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["depth_lidar"]), 0.35,
                               atol=0.01)
    np.testing.assert_allclose(np.asarray(out["image_lidar"]), 0.7, atol=1e-3)


def test_render_shapes_lidar_and_camera():
    params = TINY_FIELD.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    o = jnp.zeros((16, 3))
    d = jax.random.normal(key, (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    run = jax.jit(REND.run, static_argnames=("cal_lidar_color", "perturb"))
    out_l = run(params, o, d, 0.3, cal_lidar_color=True, perturb=True,
                key=key)
    assert out_l["image_lidar"].shape == (16, 2)
    assert out_l["depth_lidar"].shape == (16,)
    out_c = run(params, o, d, 0.3, cal_lidar_color=False)
    assert out_c["image"].shape == (16, 3)
    assert np.isfinite(np.asarray(out_c["image"])).all()


def test_staged_matches_direct():
    params = TINY_FIELD.init(jax.random.PRNGKey(0))
    o = jnp.zeros((70, 3))  # not a multiple of max_ray_batch=32
    d = jax.random.normal(jax.random.PRNGKey(2), (70, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    direct = REND.run(params, o, d, 0.5, cal_lidar_color=True)
    staged = REND.render(params, o, d, 0.5, cal_lidar_color=True, staged=True)
    np.testing.assert_allclose(np.asarray(staged["depth_lidar"]),
                               np.asarray(direct["depth_lidar"]), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(staged["image_lidar"]),
                               np.asarray(direct["image_lidar"]), rtol=1e-4,
                               atol=1e-6)


def test_sample_pdf_concentrates():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 65), (4, 65))
    w = jnp.zeros((4, 64)).at[:, 32].set(100.0)  # mass at z ~ 0.5
    s = sample_pdf(jax.random.PRNGKey(0), bins, w, 32)
    assert s.shape == (4, 32)
    med = np.median(np.asarray(s))
    assert 0.45 < med < 0.56


def test_camera_background_blend():
    class EmptyField:
        geo_feat_dim = 2

        def density(self, params, x, t, cal_lidar_color=False,
                    compute_dtype=jnp.float32, skip_warp=False):
            return {"sigma": jnp.zeros(x.shape[0]),
                    "geo_feat": jnp.zeros((x.shape[0], 2))}

        def color(self, params, x, d, geo_feat, cal_lidar_color=False,
                  mask=None, compute_dtype=jnp.float32):
            return jnp.zeros((x.shape[0], 3))

    spec = RendererSpec(field=EmptyField(), bound=1.0, num_steps=32)
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    out = spec.run(None, o, d, 0.0, cal_lidar_color=False, bg_color=0.25)
    np.testing.assert_allclose(np.asarray(out["image"]), 0.25, atol=1e-6)
