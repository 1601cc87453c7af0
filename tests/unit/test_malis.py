"""MALIS loss tests (reference tests/unit/test_malis_loss.py philosophy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_connectomics_tpu.data.targets import seg_to_affinity
from pytorch_connectomics_tpu.losses.malis import MalisLoss, _malis_weights_host, malis_counts


def two_segments():
    seg = np.zeros((4, 4, 8), np.uint32)
    seg[:, :, :4] = 1
    seg[:, :, 4:] = 2
    return seg


def test_malis_counts_perfect_affinity():
    seg = two_segments()
    aff = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])
    w_pos, w_neg = _malis_weights_host(aff, seg)
    # perfect affinities: no positive pairs are separated...
    # positive weights live on edges, total pos pair count = sum over within-segment pairs
    n_per = 4 * 4 * 4
    expected_pairs = 2 * (n_per * (n_per - 1) // 2)
    assert w_pos.sum() == pytest.approx(expected_pairs)
    # negative pass: the maximin edge for cross pairs is a 0-affinity edge with weight on it
    assert w_neg.sum() == pytest.approx(n_per * n_per)
    # neg weights sit only on zero-affinity edges (the boundary)
    assert (w_neg[aff > 0.5] == 0).all()


def test_malis_loss_zero_for_perfect_prediction():
    seg = two_segments()
    aff = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])
    pred = jnp.asarray(np.moveaxis(aff, 0, -1))[None]  # NDHWC
    loss = MalisLoss(sigmoid=False)(pred, jnp.asarray(seg)[None])
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_malis_loss_penalizes_merge():
    seg = two_segments()
    aff = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])
    merged = aff.copy()
    merged[0, :, :, 4] = 1.0  # bridge the two segments in x
    pred = jnp.asarray(np.moveaxis(merged, 0, -1))[None]
    loss = MalisLoss(sigmoid=False)(pred, jnp.asarray(seg)[None])
    assert float(loss) > 0.01


def test_malis_loss_differentiable():
    seg = two_segments()
    pred = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8, 3))

    def f(p):
        return MalisLoss(sigmoid=True)(p, jnp.asarray(seg)[None])

    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_malis_registered():
    from pytorch_connectomics_tpu.losses import get_loss

    assert get_loss("MalisLoss") is not None
