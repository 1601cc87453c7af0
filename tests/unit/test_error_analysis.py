"""Error-analysis subsystem (reference scripts/error_analysis_seg_dense.py
and _nerl.py behaviors)."""

import numpy as np

from pytorch_connectomics_tpu.evaluation.error_analysis import (
    analyze_segmentation,
    dust_removal_sweep,
    oracle_study,
    scan_z_discontinuities,
    segment_size_stats,
    skeleton_ownership,
    split_merge_attribution,
)


def _make_case():
    """GT: two bars. Pred: bar 1 split in two, bar 2 merged with a stray
    blob of bar 1's territory."""
    gt = np.zeros((4, 10, 20), np.uint32)
    gt[:, 2:5, 1:19] = 1
    gt[:, 6:9, 1:19] = 2
    seg = np.zeros_like(gt)
    seg[:, 2:5, 1:10] = 10  # fragment A of gt 1
    seg[:, 2:5, 10:19] = 11  # fragment B of gt 1
    seg[:, 6:9, 1:19] = 12  # covers gt 2 ...
    seg[:, 4:5, 1:19] = 12  # ... and leaks into gt 1 -> merger
    return seg, gt


def test_split_merge_attribution():
    seg, gt = _make_case()
    rep = split_merge_attribution(seg, gt, min_overlap=10)
    split_ids = {r["gt_id"] for r in rep["worst_splits"]}
    assert 1 in split_ids  # gt 1 split across 10/11(/12)
    merge_ids = {r["segment_id"] for r in rep["worst_merges"]}
    assert 12 in merge_ids  # seg 12 spans gt 1 and gt 2


def test_segment_size_stats():
    seg, _ = _make_case()
    st = segment_size_stats(seg)
    assert st["num_segments"] == 3
    assert st["min_size"] <= st["median_size"] <= st["max_size"]


def test_oracle_study_reduces_merge_voi():
    seg, gt = _make_case()
    rep = oracle_study(seg, gt, top_k=5)
    assert rep["after_top5_merge_fixes"]["voi_merge"] <= rep["baseline"]["voi_merge"]


def test_dust_sweep_removes_small():
    seg, gt = _make_case()
    seg = seg.copy()
    seg[0, 0, 0] = 99  # one-voxel dust
    rows = dust_removal_sweep(seg, gt, thresholds=(0, 10))
    assert rows[0]["segments_removed"] == 0
    assert rows[1]["segments_removed"] == 1


def test_z_discontinuity_scan():
    seg = np.zeros((6, 8, 8), np.uint32)
    seg[:3, 2:6, 2:6] = 1
    seg[3:, 2:6, 2:6] = 2  # ownership flips at z=2/3
    rows = scan_z_discontinuities(seg, top=3)
    assert rows[0]["z"] == 2
    assert rows[0]["slice_agreement"] == 0.0


def test_skeleton_ownership_merge_evidence():
    from pytorch_connectomics_tpu.metrics.skeleton import Skeleton

    seg = np.zeros((4, 8, 20), np.uint32)
    seg[:, :, :] = 0
    seg[:, 2:6, 1:19] = 7  # one big segment spanning both skeletons
    sk1 = Skeleton(
        nodes=np.array([[1, 3, 3], [1, 3, 8]], float), edges=np.array([[0, 1]])
    )
    sk2 = Skeleton(
        nodes=np.array([[2, 4, 12], [2, 4, 17]], float), edges=np.array([[0, 1]])
    )
    rows = skeleton_ownership(seg, {1: sk1, 2: sk2})
    by_id = {r["skeleton"]: r for r in rows}
    assert by_id[1]["dominant_segment"] == 7
    assert 2 in by_id[1]["merged_with_skeletons"]
    assert 1 in by_id[2]["merged_with_skeletons"]


def test_analyze_segmentation_full():
    seg, gt = _make_case()
    rep = analyze_segmentation(seg, gt, oracle=True, dust=True, z_scan=True)
    for key in ("adapted_rand", "voi_split", "voi_merge", "pred_stats",
                "worst_splits", "worst_merges", "oracle", "dust_sweep"):
        assert key in rep, key
