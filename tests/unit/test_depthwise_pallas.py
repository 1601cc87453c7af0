"""Depthwise pallas kernel: interpret-mode equivalence with XLA conv."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from pytorch_connectomics_tpu.ops import depthwise_pallas as dp


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _ref(x, w, b=None):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1], precision=jax.lax.Precision.HIGHEST,
    )
    return out if b is None else out + b


def test_depthwise_matches_xla(interpret_mode):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 6, 9, 33, 16)), jnp.float32)
    w = jnp.asarray(rng.random((3, 3, 3, 1, 16)) - 0.5, jnp.float32)
    b = jnp.asarray(rng.random(16), jnp.float32)
    ours = dp.depthwise3x3_pallas(x, w, b, block=(4, 4, 16))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_ref(x, w, b)), atol=2e-5)


def test_depthwise_fallback(interpret_mode):
    x = jnp.ones((1, 4, 4, 8, 4), jnp.float32)
    w = jnp.ones((3, 3, 3, 1, 4), jnp.float32)
    out = dp.depthwise3x3(x, w, force_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w)), atol=1e-5)
