"""Branch decoder suite + tube QC + skeleton metrics + tuner tests."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.decoding.branch import (
    branch_link,
    branch_merge,
    branch_split,
    multi_component_sections,
    seg_2d,
)
from pytorch_connectomics_tpu.metrics.tube import (
    skeleton_mask_metrics,
    tube_instance_qc,
    tube_qc_summary,
)


def test_seg_2d_unique_ids_per_section():
    pred = np.zeros((3, 8, 8), np.float32)
    pred[:, 1:3, 1:3] = 1.0
    pred[:, 5:7, 5:7] = 1.0
    out = seg_2d(pred[None], threshold=0.5)
    # 2 components x 3 sections = 6 unique ids
    assert len(np.unique(out)) == 7


def test_branch_link_connects_overlapping_sections():
    pred = np.zeros((3, 8, 8), np.float32)
    pred[:, 2:6, 2:6] = 1.0
    sec = seg_2d(pred[None], threshold=0.5)
    linked = branch_link(sec, min_iou=0.3)
    assert len(np.unique(linked)) == 2  # bg + one tube


def test_branch_merge_z_continuity():
    lab = np.zeros((6, 8, 8), np.uint32)
    lab[0:3, 2:6, 2:6] = 1  # tube A ends at z=2
    lab[3:6, 2:6, 2:6] = 2  # tube B starts at z=3 (same footprint)
    merged = branch_merge(lab, min_overlap=4, min_size=20, weak_min_size=20)
    assert len(np.unique(merged)) == 2  # bg + merged tube


def test_branch_merge_margin_rejects_ambiguous():
    """Two equally-good continuation candidates -> the margin gate keeps the
    pair split (reference merge.py:629 docstring: a false merge costs more
    than a residual split)."""
    lab = np.zeros((8, 12, 20), np.uint32)
    lab[0:4, 4:8, 4:16] = 1  # wide tube A ends at z=3
    lab[4:8, 4:8, 4:10] = 2  # candidate B (left half)
    lab[4:8, 4:8, 10:16] = 3  # candidate C (right half), equal IoU
    out = branch_merge(lab, min_size=20, weak_min_size=10_000)
    assert len(np.unique(out)) == 4  # bg + all three stay distinct


def test_branch_merge_seam_affinity_floor():
    """A background-level seam z-affinity vetoes an otherwise-perfect IoU
    match (reference merge.py:221 aff_lo)."""
    lab = np.zeros((6, 8, 8), np.uint32)
    lab[0:3, 2:6, 2:6] = 1
    lab[3:6, 2:6, 2:6] = 2
    aff = np.ones((3, 6, 8, 8), np.float32)
    merged = branch_merge(lab, affinity=aff, min_size=20, weak_min_size=20)
    assert len(np.unique(merged)) == 2  # strong seam -> merged
    aff[2, 3] = 0.0  # kill the z-affinity at the seam
    kept = branch_merge(
        lab, affinity=aff, min_size=20, weak_min_size=10_000, weak_max_gap=0
    )
    assert len(np.unique(kept)) == 3  # vetoed -> still split


def test_complete_fragments_absorbs_specks():
    from pytorch_connectomics_tpu.decoding.branch import complete_fragments

    lab = np.zeros((6, 12, 12), np.uint32)
    lab[:, 2:9, 2:9] = 1  # big tube (6*49 = 294 voxels)
    lab[2, 9, 5] = 2  # 1-voxel lateral speck touching the tube
    out = complete_fragments(lab, min_size=50)
    assert (out == 2).sum() == 0
    assert out[2, 9, 5] == 1  # absorbed into its contact


def test_bridge_weak_gaps_spans_gap_with_velocity():
    """A tube drifting in +y, interrupted for 2 slices, reconnects via the
    velocity-projected match (reference merge.py:348)."""
    lab = np.zeros((12, 24, 12), np.uint32)
    for z in range(5):
        lab[z, 2 + z : 6 + z, 4:8] = 1  # drifts +1 y per z, ends z=4
    for z in range(7, 12):
        lab[z, 2 + z : 6 + z, 4:8] = 2  # resumes at z=7 on the same track
    out = branch_merge(
        lab, min_size=20, weak_min_size=20, weak_max_gap=3, rounds=1
    )
    assert len(np.unique(out)) == 2  # bg + one reconnected tube


def test_longrange_guided_split_by_guide_seg(tmp_path):
    """Guide-seg mode (reference longrange_guided_split.py:534): a primary
    label containing two large guide components splits by nearest seed."""
    from pytorch_connectomics_tpu.decoding.branch import longrange_guided_split

    primary = np.zeros((8, 10, 30), np.uint32)
    primary[:, 2:8, 2:28] = 1  # one falsely-merged slab (8*6*26 = 1248 vox)
    guide = np.zeros_like(primary)
    guide[:, 3:7, 3:12] = 5  # left guide body
    guide[:, 3:7, 18:27] = 9  # right guide body
    out = longrange_guided_split(
        primary, guide_seg=guide,
        min_parent_voxels=500, min_seed_voxels=100,
        min_seed_overlap_voxels=50, report_dir=str(tmp_path),
    )
    left, right = out[4, 5, 6], out[4, 5, 22]
    assert left > 0 and right > 0 and left != right
    # nearest-seed assignment covers the whole parent (nothing dropped)
    assert (out > 0).sum() == (primary > 0).sum()
    assert (tmp_path / "longrange_guided_split.csv").exists()
    # a parent with only ONE retained seed stays intact
    out2 = longrange_guided_split(
        primary, guide_seg=(guide == 5).astype(np.uint32) * 5,
        min_parent_voxels=500, min_seed_voxels=100, min_seed_overlap_voxels=50,
    )
    assert len(np.unique(out2)) == 2


def test_branch_split_detects_multi_component():
    # one label containing two separate tubes (simulated merge error)
    lab = np.zeros((4, 16, 16), np.uint32)
    lab[:, 2:6, 2:6] = 1
    lab[:, 10:14, 10:14] = 1
    assert 1 in multi_component_sections(lab)
    out = branch_split(lab)
    # the two tubes get distinct ids
    assert out[1, 3, 3] != out[1, 11, 11]
    assert out[1, 3, 3] > 0 and out[1, 11, 11] > 0


def test_tube_qc_flags():
    lab = np.zeros((16, 16, 16), np.uint32)
    lab[2:14, 4:8, 4:8] = 1  # healthy tube
    lab[0, 0:2, 0:2] = 2  # border patch fragment
    qc = tube_instance_qc(lab, min_length=4)
    assert qc[1]["short"] == 0.0
    assert qc[2]["border_patch"] == 1.0 and qc[2]["short"] == 1.0
    summary = tube_qc_summary(lab, min_length=4)
    assert summary["n_instances"] == 2


def test_skeleton_mask_metrics_tolerance():
    g = np.zeros((4, 16, 16), bool)
    g[2, 8, 2:14] = True
    p = np.zeros_like(g)
    p[2, 9, 2:14] = True  # off by one voxel
    m = skeleton_mask_metrics(p, g, tolerance=2)
    assert m["f1"] == pytest.approx(1.0)
    m0 = skeleton_mask_metrics(p, g, tolerance=0)
    assert m0["f1"] == 0.0


def test_tuner_grid_and_tpe():
    from pytorch_connectomics_tpu.config.schema import TuningConfig, build_dataclass
    from pytorch_connectomics_tpu.decoding.tuning import DecodingTuner

    cfg = build_dataclass(
        TuningConfig,
        {
            "enabled": True,
            "n_trials": 25,
            "sampler": "tpe",
            "metric": "adapted_rand",
            "direction": "minimize",
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
            "seed": 0,
        },
    )
    tuner = DecodingTuner(cfg, lambda p: (p["x"] - 0.7) ** 2)
    best = tuner.optimize()
    assert abs(best.params["x"] - 0.7) < 0.15

    cfg2 = build_dataclass(
        TuningConfig,
        {"sampler": "grid", "n_trials": 100, "metric": "adapted_rand",
         "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}]},
    )
    tuner2 = DecodingTuner(cfg2, lambda p: (p["x"] - 0.5) ** 2)
    best2 = tuner2.optimize()
    assert best2.params["x"] == pytest.approx(0.5)


def test_tuner_study_roundtrip(tmp_path):
    from pytorch_connectomics_tpu.config.schema import TuningConfig, build_dataclass
    from pytorch_connectomics_tpu.decoding.tuning import DecodingTuner, load_best_params

    cfg = build_dataclass(
        TuningConfig,
        {"sampler": "random", "n_trials": 5, "metric": "adapted_rand",
         "params": [{"name": "steps.0.kwargs.threshold", "type": "float", "low": 0.1, "high": 0.9}]},
    )
    tuner = DecodingTuner(cfg, lambda p: abs(p["steps.0.kwargs.threshold"] - 0.4))
    tuner.optimize()
    path = tuner.save_study(tmp_path / "study.yaml")
    best = load_best_params(path)
    assert "steps.0.kwargs.threshold" in best


def test_external_weights_loader(tmp_path):
    import torch

    from pytorch_connectomics_tpu.training.model_weights import load_external_weights

    # fake torch checkpoint with one conv3d layer matching a flax tree
    w = torch.randn(8, 1, 3, 3, 3)
    b = torch.randn(8)
    torch.save({"state_dict": {"model.conv.weight": w, "model.conv.bias": b}}, tmp_path / "c.pt")
    flax_params = {"Conv_0": {"kernel": np.zeros((3, 3, 3, 1, 8), np.float32), "bias": np.zeros(8, np.float32)}}
    new, stats = load_external_weights(flax_params, str(tmp_path / "c.pt"))
    assert stats["loaded"] == 2
    np.testing.assert_allclose(new["Conv_0"]["kernel"], np.transpose(w.numpy(), (2, 3, 4, 1, 0)))
