"""Coverage for affinity QC, streaming QC, decode graph DAG, and orchestrator
mask routing."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_connectomics_tpu.decoding.qc import (
    StreamingQCAccumulator,
    scan_affinity_quality,
)
from pytorch_connectomics_tpu.decoding.registry import run_graph


def test_qc_flags_bad_slices():
    pred = np.full((3, 16, 32, 32), 0.6, np.float32)
    pred[:, 7] = 0.01  # dead z-slab
    mask, report = scan_affinity_quality(pred, z_mean_drift=0.5)
    assert report.bad_slices == [7]
    assert mask[7].max() == 0.0 and mask[6].min() == 1.0


def test_qc_border_flag():
    pred = np.full((1, 4, 64, 64), 0.5, np.float32)
    pred[:, :, :8, :] = 0.0
    pred[:, :, -8:, :] = 0.0
    pred[:, :, :, :8] = 0.0
    pred[:, :, :, -8:] = 0.0
    # border mean pulled to ~0 -> flagged
    _, report = scan_affinity_quality(pred, border_low_intensity=0.05)
    assert report.border_flagged


def test_streaming_qc_matches_batch():
    rng = np.random.default_rng(0)
    pred = rng.random((3, 16, 32, 32)).astype(np.float32)
    pred[:, 5] *= 0.01
    acc = StreamingQCAccumulator(16)
    for z0 in range(0, 16, 4):
        acc.update(pred[:, z0 : z0 + 4], z0)
    report = acc.finalize(z_mean_drift=0.5)
    _, batch_report = scan_affinity_quality(pred, z_mean_drift=0.5)
    assert report.bad_slices == batch_report.bad_slices == [5]


def test_qc_full_scan_report(tmp_path):
    """Full scan: strided stats, z-cut refinement, border rows against the
    raw image, markdown report with frontmatter (ref qc/affinity.py:307,361)."""
    from pytorch_connectomics_tpu.decoding.qc import (
        AffinityQCParams,
        scan_prediction,
        write_qc_report,
    )

    rng = np.random.default_rng(1)
    pred = np.clip(rng.normal(0.7, 0.05, (3, 40, 64, 64)), 0, 1).astype(np.float32)
    pred[:, :3] = 0.01  # dead head planes
    pred[:, -2:] = 0.01  # dead tail planes
    pred[0, 10, 0, 0] = np.nan
    img = np.full((40, 64, 64), 120.0, np.float32)
    img[:, :8, :] = 5.0  # dark border (background)
    params = AffinityQCParams(z_stride=2, k_edge=4, refine_window=8, border_width=8)
    report = scan_prediction(pred, img=img, params=params)
    assert report.low_z == 3 and report.high_z == 38
    assert report.nan_count == 1 and report.inf_count == 0
    assert report.g_mean.shape == (3,) and report.means.shape[1] == 3
    md = write_qc_report(
        report, tmp_path / "qc.md", params, mask_path="m.h5", image_path="i.h5"
    ).read_text()
    assert md.startswith("---")  # frontmatter
    assert "low_z: 3" in md and "high_z: 38" in md
    assert "ch0(x-aff)" in md and "XY-border" in md
    assert any("z=" in r for r in report.border_rows)


def test_streaming_qc_full_stats():
    from pytorch_connectomics_tpu.decoding.qc import scan_prediction

    from pytorch_connectomics_tpu.decoding.qc import AffinityQCParams

    rng = np.random.default_rng(2)
    pred = np.clip(rng.normal(0.6, 0.1, (3, 24, 32, 32)), 0, 1).astype(np.float32)
    acc = StreamingQCAccumulator(24)
    for z0 in range(0, 24, 6):
        acc.update(pred[:, z0 : z0 + 6], z0)
    rep = acc.finalize()
    full = scan_prediction(pred, params=AffinityQCParams(z_stride=1))
    np.testing.assert_allclose(rep.g_mean, full.g_mean, rtol=1e-5)
    np.testing.assert_allclose(rep.means, full.means, rtol=1e-5)
    np.testing.assert_allclose(rep.g_min, full.g_min, rtol=1e-6)
    np.testing.assert_allclose(rep.g_max, full.g_max, rtol=1e-6)
    # inf counting
    bad = pred.copy()
    bad[1, 4, 0, 0] = np.inf
    acc2 = StreamingQCAccumulator(24)
    acc2.update(bad, 0)
    assert acc2.inf_count == 1


def test_decode_graph_dag():
    pred = np.zeros((1, 4, 8, 8), np.float32)
    pred[0, 1:3, 2:6, 2:6] = 0.9
    graph = {
        "nodes": {
            "fg": {"op": "select_channels", "inputs": ["prediction"], "kwargs": {"channels": "0:1"}},
            "mask": {"op": "threshold", "inputs": ["fg"], "kwargs": {"threshold": 0.5}},
            "seg": {"op": "binary_cc", "inputs": ["mask"], "kwargs": {"threshold": 0.5}},
        },
        "output": "seg",
    }
    seg = run_graph({"prediction": pred}, graph)
    assert len(np.unique(seg)) == 2  # bg + 1 instance


def test_orchestrator_mask_slice_routing():
    from pytorch_connectomics_tpu.config.schema import LossConfig, build_dataclass
    from pytorch_connectomics_tpu.losses import LossOrchestrator

    # channel 1 of the target is a validity mask for the channel-0 loss
    cfg = build_dataclass(
        LossConfig,
        {"losses": [{"function": "WeightedBCEWithLogitsLoss", "weight": 1.0,
                     "pred_slice": "0:1", "target_slice": "0:1", "mask_slice": "1:2"}]},
    )
    orch = LossOrchestrator(cfg)
    pred = jnp.full((1, 2, 4, 4, 1), 10.0)
    # target ch0 wrong everywhere, but mask (ch1) zeroes the whole field
    tgt = jnp.concatenate([jnp.zeros((1, 2, 4, 4, 1)), jnp.zeros((1, 2, 4, 4, 1))], -1)
    total_masked, _ = orch(pred, tgt)
    tgt_open = jnp.concatenate([jnp.zeros((1, 2, 4, 4, 1)), jnp.ones((1, 2, 4, 4, 1))], -1)
    total_open, _ = orch(pred, tgt_open)
    assert float(total_masked) == pytest.approx(0.0, abs=1e-6)
    assert float(total_open) > 1.0
