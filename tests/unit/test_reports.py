"""Evaluation report depth: tube-instance npz dumps and cross-volume
aggregation (reference evaluation/report.py:50-120,374-430)."""

import json

import numpy as np

from pytorch_connectomics_tpu.evaluation.report import (
    aggregate_metrics_summary,
    save_tube_instances,
    write_metrics_report,
)


def _tube_volume():
    lab = np.zeros((12, 16, 16), np.uint32)
    lab[1:11, 4:7, 4:7] = 1  # long tube
    lab[2:4, 10:12, 10:12] = 2  # short fragment
    return lab


def test_tube_instance_dump(tmp_path):
    from pytorch_connectomics_tpu.metrics.tube import tube_instance_qc

    lab = _tube_volume()
    per = tube_instance_qc(lab, min_length=8)
    path = save_tube_instances(tmp_path, "vol1", per, volume_shape=lab.shape,
                               config={"min_length": 8})
    z = np.load(path)
    assert list(z["label"]) == [1, 2]
    assert z["short"][0] == 0.0 and z["short"][1] == 1.0
    assert tuple(z["volume_shape"]) == lab.shape
    assert int(z["config_min_length"]) == 8


def test_metrics_aggregation(tmp_path):
    write_metrics_report(tmp_path, "a", {"jaccard": 0.9, "voi": 0.5})
    write_metrics_report(tmp_path, "b", {"jaccard": 0.7, "voi": 0.3})
    write_metrics_report(tmp_path, "c", {"jaccard": 0.8})
    out = aggregate_metrics_summary(tmp_path)
    summary = json.loads(out.read_text())
    assert summary["jaccard"]["n_volumes"] == 3
    np.testing.assert_allclose(summary["jaccard"]["mean"], 0.8)
    np.testing.assert_allclose(summary["jaccard"]["median"], 0.8)
    assert summary["voi"]["n_volumes"] == 2
    np.testing.assert_allclose(summary["voi"]["max"], 0.5)
    assert (tmp_path / "metrics_summary.txt").exists()


def test_eval_stage_tube_metric(tmp_path):
    from pytorch_connectomics_tpu.config.schema import EvaluationConfig, build_dataclass
    from pytorch_connectomics_tpu.evaluation.stage import run_evaluation_stage

    lab = _tube_volume()
    cfg = build_dataclass(
        EvaluationConfig,
        {"enabled": True, "metrics": ["tube"], "tube": {"min_length": 8}},
    )
    results = run_evaluation_stage(None, lab, lab, cfg, str(tmp_path), "volx")
    assert "tube_n_instances" in results or any(k.startswith("tube_") for k in results)
    assert (tmp_path / "eval_volx_tube_instances.npz").exists()
