"""Equivalence tests for the fused MedNeXt block Pallas kernels
(ops/fused_block_pallas.py) and the fused inference forward
(models/mednext_fused.py), run in Pallas TPU interpret mode on CPU.

Reference semantics: MedNeXtBlock = x + pw2(gelu(pw1(GN_perchannel(dw(x)))))
with SAME zero padding (models/mednext.py; reference mednext_models.py:304).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_connectomics_tpu.ops.fused_block_pallas import (
    cf_to_ndhwc,
    from_cf,
    fused_block_cf,
    fused_mednext_block,
    ndhwc_to_cf,
    reference_block,
    to_cf,
)


def _rand_block_params(key, c, r, cout=None, k=3):
    cout = cout or c
    ks = jax.random.split(key, 8)
    return dict(
        w_dw=jax.random.normal(ks[0], (k, k, k, c)) * 0.3,
        b_dw=jax.random.normal(ks[1], (c,)) * 0.1,
        gamma=1.0 + 0.1 * jax.random.normal(ks[2], (c,)),
        beta=0.1 * jax.random.normal(ks[3], (c,)),
        w1=jax.random.normal(ks[4], (c, r)) / np.sqrt(c),
        b1=0.1 * jax.random.normal(ks[5], (r,)),
        w2=jax.random.normal(ks[6], (r, cout)) / np.sqrt(r),
        b2=0.1 * jax.random.normal(ks[7], (cout,)),
    )


def test_cf_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 5, 8, 9))
    cf = to_cf(x)
    assert cf.shape == (2, 6, 8, 7 * 128)
    back = from_cf(cf, 5, 9)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    x_nd = jnp.transpose(x, (0, 1, 2, 4, 3))
    np.testing.assert_array_equal(
        np.asarray(cf_to_ndhwc(ndhwc_to_cf(x_nd), 5, 9)), np.asarray(x_nd)
    )


def test_cf_zero_invariant():
    """Pad lanes and halo rows/planes must be zero."""
    x = jnp.ones((1, 3, 4, 2, 10))
    cf = np.asarray(to_cf(x)).reshape(1, 5, 2, 6, 128)
    assert cf[:, 0].sum() == 0 and cf[:, -1].sum() == 0  # z halo
    assert cf[:, :, :, 0].sum() == 0 and cf[:, :, :, -1].sum() == 0  # y halo
    assert cf[..., 10:].sum() == 0  # x pad lanes


@pytest.mark.parametrize(
    "shape,c,r",
    [((1, 6, 7, 8, 10), 8, 16), ((2, 5, 4, 16, 24), 16, 32)],
)
def test_fused_block_matches_reference(shape, c, r):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, shape, jnp.float32)
    p = _rand_block_params(jax.random.PRNGKey(2), c, r)
    want = reference_block(x, **p)
    with pltpu.force_tpu_interpret_mode():
        got = fused_mednext_block(x, **p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_block_chain_in_cf():
    """Two chained blocks staying in CF must equal two reference blocks."""
    c, r = 8, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 6, c, 12), jnp.float32)
    p1 = _rand_block_params(jax.random.PRNGKey(4), c, r)
    p2 = _rand_block_params(jax.random.PRNGKey(5), c, r)
    want = reference_block(reference_block(x, **p1), **p2)
    with pltpu.force_tpu_interpret_mode():
        cf = to_cf(x)
        cf = fused_block_cf(cf, z_size=5, y_size=6, x_size=12, **p1)
        cf = fused_block_cf(cf, z_size=5, y_size=6, x_size=12, **p2)
        got = from_cf(cf, 6, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
