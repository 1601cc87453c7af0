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


def test_maximin_chain_hand_derived():
    """1-D chain, one segment, weak middle edge. Kruskal maximin pair
    counts per edge are hand-derivable (MALIS paper, Turaga 2009):
    edges (0.9, 0.2, 0.8) over 4 voxels -> counts (1, 4, 1)."""
    seg = np.ones((1, 1, 4), np.uint32)
    aff = np.zeros((3, 1, 1, 4), np.float32)
    aff[0, 0, 0, 1] = 0.9  # edge 0-1 (high-end convention: stored at x=1)
    aff[0, 0, 0, 2] = 0.2  # edge 1-2
    aff[0, 0, 0, 3] = 0.8  # edge 2-3
    counts = malis_counts(aff, seg, count_pos=True)
    assert counts[0, 0, 0, 1] == 1  # pair (0,1)
    assert counts[0, 0, 0, 2] == 4  # pairs (0,2),(0,3),(1,2),(1,3)
    assert counts[0, 0, 0, 3] == 1  # pair (2,3)


def test_maximin_negative_counts_on_leak_edge():
    """Two segments bridged by one leak edge: ALL cross pairs blame the
    maximin (leak) edge."""
    seg = np.zeros((1, 1, 4), np.uint32)
    seg[..., :2] = 1
    seg[..., 2:] = 2
    aff = np.zeros((3, 1, 1, 4), np.float32)
    aff[0, 0, 0, 1] = 0.9  # within seg 1
    aff[0, 0, 0, 2] = 0.7  # LEAK across the boundary
    aff[0, 0, 0, 3] = 0.8  # within seg 2
    counts = malis_counts(aff, seg, count_pos=False)
    assert counts[0, 0, 0, 2] == 4  # (0,2),(0,3),(1,2),(1,3)
    assert counts[0, 0, 0, 1] == 0
    assert counts[0, 0, 0, 3] == 0


def test_maximin_off_path_edge_irrelevant():
    """Raising an edge that is not any pair's maximin edge leaves counts
    unchanged (maximin property)."""
    seg = np.ones((1, 2, 2), np.uint32)
    aff = np.zeros((3, 1, 2, 2), np.float32)
    # x edges
    aff[0, 0, 0, 1] = 0.9
    aff[0, 0, 1, 1] = 0.8
    # y edges
    aff[1, 0, 1, 0] = 0.7
    aff[1, 0, 1, 1] = 0.3  # weakest: redundant cycle edge
    base = malis_counts(aff, seg, count_pos=True)
    aff2 = aff.copy()
    aff2[1, 0, 1, 1] = 0.5  # still the cycle-closing minimum
    again = malis_counts(aff2, seg, count_pos=True)
    np.testing.assert_array_equal(base, again)
    # and the redundant edge carries no pairs
    assert base[1, 0, 1, 1] == 0


def test_pos_neg_total_pair_conservation():
    """Across random cases: pos counts sum to #within-segment pairs and neg
    counts to #cross-segment pairs (every pair blames exactly one edge)."""
    rng = np.random.default_rng(3)
    seg = np.zeros((3, 4, 4), np.uint32)
    seg[:, :2] = 1
    seg[:, 2:] = 2
    aff = rng.random((3, 3, 4, 4)).astype(np.float32)
    w_pos, w_neg = _malis_weights_host(aff, seg)
    n1 = int((seg == 1).sum())
    n2 = int((seg == 2).sum())
    assert w_pos.sum() == n1 * (n1 - 1) // 2 + n2 * (n2 - 1) // 2
    assert w_neg.sum() == n1 * n2


def test_malis_crop_size_runs_and_finite():
    seg = np.zeros((8, 8, 8), np.uint32)
    seg[:, :4] = 1
    seg[:, 4:] = 2
    pred = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 3))
    loss = MalisLoss(sigmoid=True, crop_size=4)(pred, jnp.asarray(seg)[None], step=3)
    assert np.isfinite(float(loss))
    # deterministic per step
    loss2 = MalisLoss(sigmoid=True, crop_size=4)(pred, jnp.asarray(seg)[None], step=3)
    assert float(loss) == pytest.approx(float(loss2))


def test_malis_threaded_matches_serial():
    """num_workers>1 must be numerically identical (thread-parallel
    maximin passes, reference malis.py:31-38 speedup knob)."""
    seg = np.zeros((2, 6, 6, 6), np.uint32)
    seg[:, :, :3] = 1
    seg[:, :, 3:] = 2
    pred = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 6, 3))
    l1 = MalisLoss(sigmoid=True, num_workers=1)(pred, jnp.asarray(seg))
    l4 = MalisLoss(sigmoid=True, num_workers=4)(pred, jnp.asarray(seg))
    assert float(l1) == pytest.approx(float(l4), rel=1e-6)
