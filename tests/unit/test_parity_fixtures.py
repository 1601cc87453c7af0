"""Score/bit-parity fixtures for the native decode/metric stack (VERDICT
round-1 item 3): lock current behavior against reference-derived goldens and
independent brute-force definitions.

- adapted_rand / voi: goldens computed by running the REFERENCE
  implementation (connectomics/metrics/segmentation_numpy.py) on a fixed
  seed-42 volume; the values are hard-coded so the test needs no reference
  checkout. Regenerate with scripts/gen_parity_goldens.py.
- malis_counts: pair-conservation laws + independent Kruskal maximin
  recount (Turaga 2009 / Funke constrained MALIS definition).
- mutex_watershed: hand-built Wolf et al. cases (attractive merge wins /
  mutex constraint blocks a later merge).
- agglomerate (waterz mean-affinity semantics): hand-derived 3-fragment
  merge order and threshold behavior.
- NERL: hand-computed expected run lengths (perfect / split / merged).
"""

import numpy as np
import pytest

from pytorch_connectomics_tpu.metrics.seg import adapted_rand, voi


def _fixture_seg_gt():
    rng = np.random.default_rng(42)
    gt = rng.integers(0, 6, (8, 16, 16))
    seg = gt.copy()
    seg[rng.random(seg.shape) < 0.15] = rng.integers(0, 8)
    seg[rng.random(seg.shape) < 0.05] = 0
    return seg, gt


def test_adapted_rand_reference_golden():
    seg, gt = _fixture_seg_gt()
    are, p, r = adapted_rand(seg, gt, all_stats=True)
    # golden from /root/reference connectomics.metrics.segmentation_numpy
    assert abs(are - 0.22437016357470385) < 1e-12
    assert abs(p - 0.9021613594734796) < 1e-12
    assert abs(r - 0.6802256334877498) < 1e-12


def test_voi_reference_golden():
    seg, gt = _fixture_seg_gt()
    vs, vm = voi(seg, gt)
    assert abs(vs - 0.8508867002236146) < 1e-9
    assert abs(vm - 0.43227385534155965) < 1e-9


def test_adapted_rand_perfect_and_allzero():
    _, gt = _fixture_seg_gt()
    assert adapted_rand(gt, gt) < 1e-12
    # seg all zero: sumAB = sumB = sum(c)/n -> precision 1, recall ~0
    are, p, r = adapted_rand(np.zeros_like(gt), gt, all_stats=True)
    assert p == pytest.approx(1.0)
    assert r < 0.01


# ---------------------------------------------------------------------------
# MALIS
# ---------------------------------------------------------------------------


def _brute_malis(aff, seg, count_pos):
    """Independent Kruskal maximin pair counting (definition-level recount,
    structured differently from csrc: explicit component sets)."""
    z, y, x = seg.shape
    n = z * y * x

    def lin(zz, yy, xx):
        return (zz * y + yy) * x + xx

    edges = []  # (w, i, j, out_channel, out_flat)
    for zz in range(z):
        for yy in range(y):
            for xx in range(x):
                i = lin(zz, yy, xx)
                if xx > 0:
                    edges.append((aff[0, zz, yy, xx], i, lin(zz, yy, xx - 1), (0, zz, yy, xx)))
                if yy > 0:
                    edges.append((aff[1, zz, yy, xx], i, lin(zz, yy - 1, xx), (1, zz, yy, xx)))
                if zz > 0:
                    edges.append((aff[2, zz, yy, xx], i, lin(zz - 1, yy, xx), (2, zz, yy, xx)))
    edges.sort(key=lambda e: -e[0])
    comp = {i: {i} for i in range(n)}
    where = list(range(n))
    labels = seg.ravel()
    out = np.zeros_like(aff)
    for w, i, j, oidx in edges:
        ci, cj = where[i], where[j]
        if ci == cj:
            continue
        a, b = comp[ci], comp[cj]
        if count_pos:
            pairs = 0
            for u in a:
                if labels[u] == 0:
                    continue
                pairs += sum(1 for v in b if labels[v] == labels[u])
        else:
            ta = sum(1 for u in a if labels[u] != 0)
            tb = sum(1 for v in b if labels[v] != 0)
            same = 0
            for u in a:
                if labels[u] == 0:
                    continue
                same += sum(1 for v in b if labels[v] == labels[u])
            pairs = ta * tb - same
        out[oidx] = pairs
        merged = a | b
        comp[ci] = merged
        del comp[cj]
        for v in b:
            where[v] = ci
    return out


@pytest.mark.parametrize("count_pos", [True, False])
def test_malis_counts_match_bruteforce(count_pos):
    from pytorch_connectomics_tpu.losses.malis import malis_counts
    from pytorch_connectomics_tpu.ops.native import get_lib

    if get_lib() is None:
        pytest.skip("native ops unavailable")
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 3, (2, 3, 4)).astype(np.uint32)
    # distinct edge weights so the maximin forest is unique
    aff = rng.permutation(np.linspace(0.01, 0.99, 3 * seg.size)).reshape(
        (3,) + seg.shape
    ).astype(np.float32)
    got = malis_counts(aff, seg, count_pos)
    want = _brute_malis(aff, seg, count_pos)
    np.testing.assert_array_equal(got, want)


def test_malis_counts_conservation():
    """Sum of pos counts over all edges == number of same-label (nonzero)
    voxel pairs; neg counts == cross-label pairs (maximin tree covers every
    pair exactly once)."""
    from pytorch_connectomics_tpu.losses.malis import malis_counts
    from pytorch_connectomics_tpu.ops.native import get_lib

    if get_lib() is None:
        pytest.skip("native ops unavailable")
    rng = np.random.default_rng(5)
    seg = rng.integers(0, 4, (3, 4, 4)).astype(np.uint32)
    aff = rng.permutation(np.linspace(0.01, 0.99, 3 * seg.size)).reshape(
        (3,) + seg.shape
    ).astype(np.float32)
    counts = np.bincount(seg.ravel())
    same_pairs = sum(c * (c - 1) // 2 for lbl, c in enumerate(counts) if lbl > 0)
    fg = seg.size - counts[0]
    cross_pairs = fg * (fg - 1) // 2 - same_pairs
    assert malis_counts(aff, seg, True).sum() == same_pairs
    assert malis_counts(aff, seg, False).sum() == cross_pairs


# ---------------------------------------------------------------------------
# mutex watershed
# ---------------------------------------------------------------------------


def test_mutex_watershed_attractive_merge():
    from pytorch_connectomics_tpu.ops.native import get_lib, mutex_watershed

    if get_lib() is None:
        pytest.skip("native ops unavailable")
    # 1x1x4 line, strong x-affinities everywhere -> single segment
    aff = np.zeros((1, 1, 1, 4), np.float32)
    aff[0, 0, 0, 1:] = 0.9
    seg, n = mutex_watershed(aff, [(0, 0, 1)])
    assert n == 1
    assert len(np.unique(seg)) == 1


def test_mutex_watershed_mutex_blocks_merge():
    from pytorch_connectomics_tpu.ops.native import get_lib, mutex_watershed

    if get_lib() is None:
        pytest.skip("native ops unavailable")
    # 1x1x4 line; short-range attractive within {0,1} and {2,3}; a strong
    # long-range REPULSIVE edge (low affinity -> weight 1-aff high) between
    # voxels 0 and 3 processed first blocks joining the halves even though
    # the middle attractive edge (0.5) would otherwise merge them.
    aff = np.zeros((2, 1, 1, 4), np.float32)
    aff[0, 0, 0, 1] = 0.9  # 0-1 attractive
    aff[0, 0, 0, 3] = 0.9  # 2-3 attractive
    aff[0, 0, 0, 2] = 0.5  # 1-2 weaker attractive
    aff[1, 0, 0, 3] = 0.05  # long-range (offset 3) 0<->3: repulsive w=0.95
    seg, n = mutex_watershed(aff, [(0, 0, 1), (0, 0, 3)])
    assert n == 2
    assert seg[0, 0, 0] == seg[0, 0, 1]
    assert seg[0, 0, 2] == seg[0, 0, 3]
    assert seg[0, 0, 0] != seg[0, 0, 3]
    # sanity: without the mutex edge the 0.5 attractive edge merges all
    seg2, n2 = mutex_watershed(aff[:1], [(0, 0, 1)])
    assert n2 == 1


# ---------------------------------------------------------------------------
# waterz-style mean agglomeration
# ---------------------------------------------------------------------------


def _three_fragment_case():
    """1x1x6 line: fragments [1,1,2,2,3,3]; boundary means: (1,2)=0.8,
    (2,3)=0.6."""
    frags = np.array([[[1, 1, 2, 2, 3, 3]]], np.uint32)
    aff = np.zeros((3, 1, 1, 6), np.float32)
    aff[0, 0, 0, 2] = 0.8  # x-edge between voxel 2 and 1 (frag 1|2)
    aff[0, 0, 0, 4] = 0.6  # frag 2|3
    # internal edges high (irrelevant to RAG: same fragment)
    aff[0, 0, 0, 1] = aff[0, 0, 0, 3] = aff[0, 0, 0, 5] = 1.0
    return frags, aff


def test_agglomerate_merge_order_and_threshold():
    from pytorch_connectomics_tpu.ops.native import agglomerate, get_lib

    if get_lib() is None:
        pytest.skip("native ops unavailable")
    frags, aff = _three_fragment_case()
    # threshold 0.7: only the 0.8 edge merges -> 2 segments
    seg, n = agglomerate(frags, aff, threshold=0.7)
    assert n == 2
    assert seg[0, 0, 0] == seg[0, 0, 2]
    assert seg[0, 0, 0] != seg[0, 0, 4]
    # threshold 0.5: both merge -> 1 segment
    seg, n = agglomerate(frags, aff, threshold=0.5)
    assert n == 1
    # threshold 0.9: nothing merges
    seg, n = agglomerate(frags, aff, threshold=0.9)
    assert n == 3


def test_agglomerate_mean_is_mean_not_max():
    from pytorch_connectomics_tpu.ops.native import agglomerate, get_lib

    if get_lib() is None:
        pytest.skip("native ops unavailable")
    # two fragments sharing a 2-voxel boundary with affinities 0.9 and 0.1:
    # mean 0.5 < 0.6 -> no merge (a max scorer would merge)
    frags = np.array([[[1, 2], [1, 2]]], np.uint32)  # (1,2,2)
    aff = np.zeros((3, 1, 2, 2), np.float32)
    aff[0, 0, 0, 1] = 0.9
    aff[0, 0, 1, 1] = 0.1
    _, n = agglomerate(frags, aff, threshold=0.6)
    assert n == 2
    _, n = agglomerate(frags, aff, threshold=0.45)
    assert n == 1


# ---------------------------------------------------------------------------
# NERL
# ---------------------------------------------------------------------------


def _line_skeleton(n_nodes, label=1, axis=2, spacing=1.0):
    from pytorch_connectomics_tpu.metrics.skeleton import Skeleton

    nodes = np.zeros((n_nodes, 3), np.float64)
    nodes[:, axis] = np.arange(n_nodes) * spacing
    edges = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
    return Skeleton(nodes=nodes, edges=edges)


def test_nerl_perfect_segmentation():
    from pytorch_connectomics_tpu.metrics.nerl import expected_run_length

    sk = _line_skeleton(11)  # length 10 along x
    seg = np.ones((1, 1, 11), np.uint32)
    erl, max_erl = expected_run_length(seg.reshape(1, 1, 11), {1: sk})
    assert erl == pytest.approx(10.0)
    assert max_erl == pytest.approx(10.0)


def test_nerl_split_halves_erl():
    from pytorch_connectomics_tpu.metrics.nerl import expected_run_length

    sk = _line_skeleton(11)
    seg = np.ones((1, 1, 11), np.uint32)
    seg[0, 0, 6:] = 2  # split at the middle: runs of length 5 and 4 (one
    # edge, 5->6, crosses ids and contributes to neither run)
    erl, max_erl = expected_run_length(seg, {1: sk})
    assert erl == pytest.approx((5.0**2 + 4.0**2) / 10.0)
    assert max_erl == pytest.approx(10.0)


def test_nerl_merge_voids_runs():
    from pytorch_connectomics_tpu.metrics.nerl import expected_run_length

    sk1 = _line_skeleton(11)  # along x at (z,y)=(0,0)
    sk2 = _line_skeleton(11)
    sk2.nodes[:, 1] = 2.0  # along x at y=2
    seg = np.zeros((1, 3, 11), np.uint32)
    seg[0, 0, :] = 7  # same candidate id under BOTH skeletons -> merged
    seg[0, 2, :] = 7
    erl, max_erl = expected_run_length(seg, {1: sk1, 2: sk2})
    assert erl == 0.0  # all runs voided by the merge
    assert max_erl == pytest.approx(10.0)


def test_nerl_zero_id_breaks_runs():
    from pytorch_connectomics_tpu.metrics.nerl import expected_run_length

    sk = _line_skeleton(11)
    seg = np.ones((1, 1, 11), np.uint32)
    seg[0, 0, 5] = 0  # background gap: runs 0-4 (len 4) and 6-10 (len 4)
    erl, _ = expected_run_length(seg, {1: sk})
    assert erl == pytest.approx((16.0 + 16.0) / 10.0)
