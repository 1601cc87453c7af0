"""Multi-objective tuning (Pareto front) and waterz batch-threshold
objectives (reference ``decoding/tuning/optuna_tuner.py:1155``; the
reference's multi-objective mode is a NotImplementedError placeholder —
here it is real)."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.config.schema import TuningConfig, build_dataclass
from pytorch_connectomics_tpu.decoding.tuning import (
    DecodingTuner,
    make_waterz_batch_objective,
    pareto_rank,
)


def test_pareto_rank():
    vals = np.array([[0.0, 1.0], [1.0, 0.0], [0.5, 0.5], [1.0, 1.0], [2.0, 2.0]])
    r = pareto_rank(vals)
    assert r[0] == 0 and r[1] == 0 and r[2] == 0  # non-dominated
    assert r[3] == 1  # dominated by (0.5, 0.5)
    assert r[4] == 2  # dominated by (1, 1)


def test_multi_objective_tuner_pareto_front():
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 40,
            "sampler": "tpe",
            "metrics": ["adapted_rand", "voi"],
            "directions": ["minimize", "minimize"],
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
            "seed": 1,
        },
    )
    # conflicting objectives: f1 = x, f2 = 1 - x -> every x is Pareto-optimal
    tuner = DecodingTuner(cfg, lambda p: [p["x"], 1 - p["x"]])
    best = tuner.optimize()
    assert tuner.multi
    assert len(best.values) == 2
    front = tuner.best_trials
    assert len(front) == len([t for t in tuner.trials if t.state == "complete"])
    # best_trial = best primary metric on the front
    assert best.values[0] == min(t.values[0] for t in front)


def test_multi_objective_converges_on_shared_optimum(tmp_path):
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 30,
            "sampler": "tpe",
            "metrics": ["adapted_rand", "voi"],
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
            "seed": 0,
        },
    )
    # both objectives minimized at x=0.6 -> the front collapses there
    tuner = DecodingTuner(
        cfg, lambda p: [(p["x"] - 0.6) ** 2, abs(p["x"] - 0.6)]
    )
    best = tuner.optimize()
    assert abs(best.params["x"] - 0.6) < 0.15
    assert len(tuner.best_trials) == 1
    path = tuner.save_study(tmp_path / "study.yaml")
    import yaml

    study = yaml.safe_load(path.read_text())
    assert study["metrics"] == ["adapted_rand", "voi"]
    assert "pareto_front" in study and len(study["pareto_front"]) == 1


def test_multi_objective_rejects_scalar_objective():
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 2,
            "sampler": "random",
            "metrics": ["adapted_rand", "voi"],
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
        },
    )
    tuner = DecodingTuner(cfg, lambda p: p["x"])  # scalar: wrong
    with pytest.raises(RuntimeError, match="no completed trials"):
        tuner.optimize()
    assert all(t.state == "failed" for t in tuner.trials)


def _affinity_volume():
    """Two blobs separated by a weak-affinity wall."""
    z, y, x = 8, 24, 24
    aff = np.ones((3, z, y, x), np.float32) * 0.95
    aff[:, :, :, 11:13] = 0.2  # wall in x
    # background frame
    aff[:, :, :2], aff[:, :, -2:] = 0.0, 0.0
    gt = np.zeros((z, y, x), np.uint32)
    gt[:, 2:-2, 2:11] = 1
    gt[:, 2:-2, 13:-2] = 2
    return aff, gt


def test_waterz_batch_objective_matches_per_threshold_decode():
    from pytorch_connectomics_tpu.decoding.decoders import decode_waterz
    from pytorch_connectomics_tpu.decoding.tuning import compute_segmentation_metric

    aff, gt = _affinity_volume()
    decoding = {
        "steps": [
            {"name": "waterz", "kwargs": {"fragment_threshold": 0.5}}
        ],
        "postprocessing": {},
    }
    thresholds = [0.1, 0.5, 0.9]
    obj = make_waterz_batch_objective(
        None, gt, decoding, "adapted_rand", thresholds, minimize=True
    )
    # monkey-ish: objective closure takes prediction at build time
    obj = make_waterz_batch_objective(
        aff, gt, decoding, "adapted_rand", thresholds, minimize=True
    )
    value, attrs = obj({})
    assert set(attrs) == {"best_threshold", "per_threshold_metric"}
    # cross-check each threshold against an independent single decode
    for thr in thresholds:
        single = decode_waterz(aff, threshold=thr, fragment_threshold=0.5)
        want = compute_segmentation_metric("adapted_rand", single, gt)
        got = attrs["per_threshold_metric"][f"{thr:g}"]
        assert got == pytest.approx(want, abs=1e-9)
    assert value == min(attrs["per_threshold_metric"].values())


def test_batch_tuner_end_to_end_records_threshold():
    aff, gt = _affinity_volume()
    decoding = {
        "steps": [{"name": "waterz", "kwargs": {}}],
        "postprocessing": {},
    }
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 4,
            "sampler": "random",
            "metric": "adapted_rand",
            "batch_thresholds": [0.1, 0.3, 0.5, 0.7, 0.9],
            "params": [
                {"name": "steps.0.kwargs.fragment_threshold", "type": "float",
                 "low": 0.3, "high": 0.6}
            ],
            "seed": 0,
        },
    )
    obj = make_waterz_batch_objective(
        aff, gt, decoding, "adapted_rand", cfg.batch_thresholds
    )
    tuner = DecodingTuner(cfg, obj)
    best = tuner.optimize()
    assert "best_threshold" in best.user_attrs
    assert len(best.user_attrs["per_threshold_metric"]) == 5


def test_cmaes_sampler_converges():
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 48,
            "sampler": "cmaes",
            "metric": "adapted_rand",
            "direction": "minimize",
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
            "seed": 3,
        },
    )
    tuner = DecodingTuner(cfg, lambda p: (p["x"] - 0.3) ** 2)
    best = tuner.optimize()
    assert abs(best.params["x"] - 0.3) < 0.1


def test_median_pruner_cuts_bad_trials():
    """Multi-step objectives report running means; trials clearly worse than
    the median at a step get pruned."""
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 20,
            "sampler": "random",
            "pruner": "median",
            "metric": "adapted_rand",
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
            "seed": 0,
        },
    )

    def objective(params, report=None):
        vals = [params["x"], params["x"]]  # two "volumes", value = x
        acc = 0.0
        for k, v in enumerate(vals):
            acc += v
            if report:
                report(k, acc / (k + 1))
        return acc / len(vals)

    tuner = DecodingTuner(cfg, objective)
    tuner.optimize()
    states = [t.state for t in tuner.trials]
    assert "pruned" in states
    # pruned trials never beat the best completed one
    assert tuner.best_trial.state == "complete"


def test_multi_volume_objective_averages_and_reports():
    from pytorch_connectomics_tpu.decoding.tuning import make_multi_volume_objective

    aff1, gt1 = _affinity_volume()
    aff2, gt2 = _affinity_volume()
    decoding = {"steps": [{"name": "waterz", "kwargs": {"fragment_threshold": 0.5}}],
                "postprocessing": {}}
    obj = make_multi_volume_objective([(aff1, gt1), (aff2, gt2)], decoding, "adapted_rand")
    reports = []
    v = obj({"steps.0.kwargs.threshold": 0.5}, report=lambda s, val: reports.append((s, val)))
    assert isinstance(v, float)
    assert len(reports) == 2  # one running mean per volume
    # identical volumes -> mean equals the single-volume value
    single = make_multi_volume_objective([(aff1, gt1)], decoding, "adapted_rand")
    assert v == pytest.approx(single({"steps.0.kwargs.threshold": 0.5}), abs=1e-9)


def test_multi_volume_batch_objective():
    aff, gt = _affinity_volume()
    decoding = {"steps": [{"name": "waterz", "kwargs": {}}], "postprocessing": {}}
    obj = make_waterz_batch_objective(
        [aff, aff], [gt, gt], decoding, "adapted_rand", [0.3, 0.7]
    )
    value, attrs = obj({})
    single = make_waterz_batch_objective(aff, gt, decoding, "adapted_rand", [0.3, 0.7])
    v1, attrs1 = single({})
    assert value == pytest.approx(v1, abs=1e-9)  # identical volumes average to the same
    assert attrs["per_threshold_metric"] == attrs1["per_threshold_metric"]


def test_hyperband_pruner_rungs_and_cutting():
    from pytorch_connectomics_tpu.decoding.tuning import HyperbandPruner

    hp = HyperbandPruner(min_resource=1, reduction_factor=3, n_warmup_trials=3)
    # budgets 1, 3, 9 are rungs; 2 is not
    assert hp._is_rung(1) and hp._is_rung(3) and hp._is_rung(9)
    assert not hp._is_rung(2)
    # step 1 (budget 2, not a rung): never prunes, never records
    assert not hp.should_prune(1, 99.0)
    hp.record(1, 99.0)
    assert hp._rungs == {}
    # warm up rung at budget 1 (step 0) with three good values
    for v in (0.1, 0.2, 0.3):
        assert not hp.should_prune(0, v)
        hp.record(0, v)
    # top-1/3 quantile of {.1,.2,.3} is ~0.166: 0.15 survives, 0.9 is cut
    assert not hp.should_prune(0, 0.15)
    assert hp.should_prune(0, 0.9)


def test_hyperband_pruner_in_tuner_cuts_bad_trials():
    cfg = build_dataclass(
        TuningConfig,
        {
            "n_trials": 30,
            "sampler": "random",
            "pruner": "hyperband",
            "metric": "adapted_rand",
            "params": [{"name": "x", "type": "float", "low": 0.0, "high": 1.0}],
            "seed": 0,
        },
    )

    def objective(params, report=None):
        vals = [params["x"]] * 3
        acc = 0.0
        for k, v in enumerate(vals):
            acc += v
            if report:
                report(k, acc / (k + 1))
        return acc / len(vals)

    tuner = DecodingTuner(cfg, objective)
    tuner.optimize()
    states = [t.state for t in tuner.trials]
    assert "pruned" in states
    assert tuner.best_trial.state == "complete"
