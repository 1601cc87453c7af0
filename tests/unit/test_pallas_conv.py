"""Pallas conv3d kernel: interpret-mode equivalence with XLA conv."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from pytorch_connectomics_tpu.ops import conv3d_pallas as cp


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def test_pallas_conv_matches_xla(interpret_mode):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 32, 16), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, 3, 16, 8), jnp.float32) - 0.5
    ours = cp.conv3d_3x3_pallas(x, w, block=(4, 4, 32))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_ref(x, w)), atol=2e-4)


def test_pallas_conv_unaligned_shape(interpret_mode):
    # volume not a multiple of the block: padding + crop path
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 5, 9, 33, 8), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(3), (3, 3, 3, 8, 8), jnp.float32) - 0.5
    ours = cp.conv3d_3x3_pallas(x, w, block=(4, 4, 16))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_ref(x, w)), atol=2e-4)


def test_pallas_conv_bias(interpret_mode):
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 4, 4, 16, 8), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(5), (3, 3, 3, 8, 4), jnp.float32) - 0.5
    b = jnp.arange(4, dtype=jnp.float32)
    ours = cp.conv3d_3x3_pallas(x, w, bias=b, block=(4, 4, 16))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_ref(x, w) + b), atol=2e-4)


def test_block_picker_respects_budget():
    blk = cp.pick_block((1, 64, 64, 64, 1), cin=32, itemsize=4)
    bz, by, bx = blk
    assert bz * by * bx * 27 * 32 * 4 <= 4 * 1024 * 1024


def test_fallback_path_matches():
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 4, 8, 8, 4), jnp.float32)
    w = jax.random.uniform(jax.random.PRNGKey(7), (3, 3, 3, 4, 4), jnp.float32)
    out = cp.conv3d_3x3(x, w, force_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w)), atol=1e-5)
