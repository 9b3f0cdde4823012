"""Pallas chamfer kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvsf_tpu.ops import chamfer_pallas as cp
from nvsf_tpu.ops.chamfer import min_dist2


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run the kernel in interpreter mode (no TPU in unit tests)."""
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_pallas_matches_xla():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(150, 3)), jnp.float32)
    d_p = cp.min_dist2_pallas(a, b, block_n=64, block_m=64)
    d_x = min_dist2(a, b)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), rtol=1e-4,
                               atol=1e-5)


def test_pallas_masked():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(70, 3)), jnp.float32)
    bm = jnp.asarray(rng.uniform(size=70) > 0.5)
    d_p = cp.min_dist2_pallas(a, b, bm, block_n=32, block_m=32)
    d_x = min_dist2(a, b, bm)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), rtol=1e-4,
                               atol=1e-5)


def test_pallas_bidirectional():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(33, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(65, 3)), jnp.float32)
    d1, d2 = cp.chamfer_distance_pallas(a, b, block_n=32, block_m=32)
    x1 = min_dist2(a, b)
    x2 = min_dist2(b, a)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(x1), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(x2), rtol=1e-4,
                               atol=1e-5)
