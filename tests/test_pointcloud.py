"""Point-cloud preprocessing unit tests (RANSAC ground removal, outlier
filter, padding) and MLP head semantics (block-split first layer vs concat).

References: ground/outlier removal `nvsf/nerf/utils.py:110-268`; tcnn
FullyFusedMLP heads `network_dynamic.py:125-189`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nvsf_tpu.lib import pointcloud as pclib
from nvsf_tpu.models.mlp import MLPSpec


def _scene(n_ground=800, n_obj=200, seed=0):
    """Flat ground plane at z=-1.7 plus a compact object cluster above it."""
    rng = np.random.default_rng(seed)
    g = np.column_stack([rng.uniform(-30, 30, n_ground),
                         rng.uniform(-30, 30, n_ground),
                         np.full(n_ground, -1.7)
                         + rng.normal(0, 0.02, n_ground)])
    o = rng.normal([5.0, 3.0, 0.5], 0.4, (n_obj, 3))
    return g, o


def test_ransac_finds_ground_plane():
    g, o = _scene()
    pc = np.vstack([g, o]).astype(np.float32)
    mask, (n, d) = pclib.ransac_plane(pc, n_iters=200, dist_thresh=0.15)
    # the dominant plane is the ground: ~all ground points are inliers,
    # ~no object points are
    assert mask[: len(g)].mean() > 0.98
    assert mask[len(g):].mean() < 0.05
    # plane normal is vertical, offset ~1.7
    assert abs(abs(n[2]) - 1.0) < 0.01
    assert abs(abs(d) - 1.7) < 0.1


def test_point_removal_pipeline():
    g, o = _scene()
    pc = np.vstack([g, o]).astype(np.float32)
    points, ground = pclib.point_removal(pc, dist_min=1.0, dist_max=55.0,
                                         z_limit=(-2.5, 4.0))
    # returns (non-ground, ground); object cluster survives, ground goes
    assert len(ground) > 0.9 * len(g)
    assert 0.8 * len(o) <= len(points) <= 1.1 * len(o)
    # non-ground points sit above the plane
    assert points[:, 2].mean() > -1.0


def test_statistical_outlier_removal():
    rng = np.random.default_rng(1)
    dense = rng.normal(0, 0.5, (300, 3))
    outliers = rng.uniform(20, 30, (5, 3))
    pc = np.vstack([dense, outliers]).astype(np.float32)
    kept = pclib.statistical_outlier_removal(pc, nb_neighbors=10,
                                             std_ratio=2.0)
    assert len(kept) >= 290
    # the far outliers are gone
    assert np.linalg.norm(kept, axis=1).max() < 10.0


def test_pad_pointclouds():
    pcs = [np.ones((3, 3)), np.ones((5, 3)) * 2, np.zeros((0, 3))]
    out, mask = pclib.pad_pointclouds(pcs)
    assert out.shape == (3, 5, 3) and mask.shape == (3, 5)
    assert mask.sum(axis=1).tolist() == [3, 5, 0]
    assert (out[1, :5] == 2).all() and (out[0, 3:] == 0).all()
    # explicit cap truncates
    out2, mask2 = pclib.pad_pointclouds(pcs, max_points=2)
    assert out2.shape == (3, 2, 3) and mask2.sum() == 4


def test_write_pcd(tmp_path):
    from nvsf_tpu.lib.tools import write_pcd
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    path = str(tmp_path / "a.pcd")
    write_pcd(path, pts, intensities=[0.5, 0.25])
    lines = open(path).read().splitlines()
    assert "FIELDS x y z intensity" in lines
    assert "POINTS 2" in lines
    vals = [float(v) for v in lines[-1].split()]
    assert vals == [4.0, 5.0, 6.0, 0.25]


def test_mlp_apply_blocks_equals_concat():
    spec = MLPSpec(in_dim=24, hidden_dim=16, out_dim=4, n_layers=3)
    params = spec.init(jax.random.PRNGKey(0))
    blocks = [jax.random.normal(jax.random.PRNGKey(i + 1), (13, w))
              for i, w in enumerate((8, 6, 10))]
    ref = spec.apply(params, jnp.concatenate(blocks, axis=-1))
    out = spec.apply_blocks(params, blocks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mlp_bias_and_last_init():
    spec = MLPSpec(in_dim=4, hidden_dim=8, out_dim=6, n_layers=2, bias=True,
                   last_init_std=1e-3)
    params = spec.init(jax.random.PRNGKey(0))
    assert all("b" in layer for layer in params)
    # last layer init is tight: matches the flow head's N(0, 1e-3)
    # (`flow_field.py:87-103`)
    assert float(jnp.abs(params[-1]["w"]).max()) < 1e-2
    out = spec.apply(params, jnp.ones((3, 4)))
    assert out.shape == (3, 6)
    # single-hidden-layer net: one ReLU between the two layers
    neg = spec.apply(params, -1e3 * jnp.ones((1, 4)))
    assert np.isfinite(np.asarray(neg)).all()
