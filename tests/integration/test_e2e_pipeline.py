"""End-to-end pipeline tests through the CLI dispatch: train -> test ->
tune -> tune-test on synthetic volumes (reference e2e philosophy:
``tests/e2e/test_lucchi_training.py``)."""

import textwrap
from pathlib import Path

import numpy as np
import pytest

from pytorch_connectomics_tpu.runtime import dispatch_runtime, parse_args

E2E_CFG = """
experiment_name: e2e
save_path: {save_path}
default:
  pipeline_profile: binary
  model:
    arch: {{type: monai_unet}}
    in_channels: 1
    input_size: [8, 16, 16]
    monai: {{filters: [4, 8], num_res_units: 1}}
  data:
    train: {{image: "random://e2e/im?shape=24x48x48", label: "random://e2e/label?shape=24x48x48"}}
    dataloader: {{batch_size: 4, patch_size: [8, 16, 16]}}
    label_transform:
      targets: [{{name: binary}}]
  inference:
    window: {{window_size: [8, 16, 16], overlap: 0.25, sw_batch_size: 2, blending: bump}}
    test_time_augmentation: {{enabled: false}}
  evaluation:
    enabled: true
    metrics: [jaccard, dice]
train:
  optimization:
    max_epochs: 1
    n_steps_per_epoch: 3
    optimizer: {{name: AdamW, lr: 1e-3}}
  monitor:
    checkpoint: {{save_top_k: 1, save_last: true}}
  system: {{seed: 1, num_workers: 1}}
test:
  data:
    test: {{image: "random://e2e/im?shape=24x48x48", label: "random://e2e/label?shape=24x48x48"}}
"""


@pytest.fixture(scope="module")
def cfg_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    p = d / "e2e.yaml"
    p.write_text(E2E_CFG.format(save_path=str(d / "outputs")))
    return p


@pytest.fixture(scope="module")
def trained(cfg_path, tmp_path_factory):
    run_dir = tmp_path_factory.mktemp("train_run")
    args = parse_args(["--config", str(cfg_path), "--mode", "train", "--output-dir", str(run_dir)])
    results = dispatch_runtime(args)
    ckpt = Path(run_dir) / "checkpoints" / "last"
    assert ckpt.exists()
    return cfg_path, ckpt


def test_train_produces_checkpoint_and_metrics(trained):
    _, ckpt = trained
    assert (ckpt / "state").exists()


def test_test_mode_runs_inference_and_eval(trained, tmp_path):
    cfg_path, ckpt = trained
    args = parse_args([
        "--config", str(cfg_path), "--mode", "test",
        "--checkpoint", str(ckpt), "--output-dir", str(tmp_path / "test_out"),
    ])
    results = dispatch_runtime(args)
    metrics = results["metrics"]
    assert "e2e" in metrics or len(metrics) == 1
    vol_metrics = list(metrics.values())[0]
    assert "jaccard" in vol_metrics
    assert 0.0 <= vol_metrics["jaccard"] <= 1.0
    # raw prediction artifact saved
    preds = list((tmp_path / "test_out").glob("*_prediction.h5"))
    assert preds


def test_test_mode_cache_reuse(trained, tmp_path):
    cfg_path, ckpt = trained
    out = tmp_path / "cache_out"
    args = parse_args([
        "--config", str(cfg_path), "--mode", "test",
        "--checkpoint", str(ckpt), "--output-dir", str(out),
    ])
    r1 = dispatch_runtime(args)
    # second run hits the prediction cache (same output dir)
    r2 = dispatch_runtime(args)
    k = list(r1["metrics"])[0]
    assert r1["metrics"][k]["jaccard"] == pytest.approx(r2["metrics"][k]["jaccard"], abs=1e-5)


def test_tune_mode_decode_search(trained, tmp_path):
    cfg_path, ckpt = trained
    out = tmp_path / "tune_out"
    args = parse_args([
        "--config", str(cfg_path), "--mode", "tune",
        "--checkpoint", str(ckpt), "--output-dir", str(out),
        "decoding.enabled=true",
        'decoding.steps=[{"name": "binary_cc", "kwargs": {"threshold": 0.5}}]',
        "decoding.tuning.enabled=true",
        "decoding.tuning.n_trials=4",
        "decoding.tuning.sampler=random",
        "decoding.tuning.metric=adapted_rand",
        'decoding.tuning.params=[{"name": "steps.0.kwargs.threshold", "type": "float", "low": 0.3, "high": 0.7}]',
    ])
    results = dispatch_runtime(args)
    best = Path(results["best_params"])
    assert best.exists()
    import yaml

    study = yaml.safe_load(best.read_text())
    assert "steps.0.kwargs.threshold" in study["best_params"]
    assert len(study["trials"]) == 4


def test_chunked_test_mode_via_cli(trained, tmp_path):
    """Chunked inference through the full CLI dispatch (zarr-free h5 path
    with halo + manifest resume), matching the whole-volume result."""
    cfg_path, ckpt = trained
    out_whole = tmp_path / "whole"
    out_chunk = tmp_path / "chunk"
    base = ["--config", str(cfg_path), "--mode", "test", "--checkpoint", str(ckpt)]
    r_whole = dispatch_runtime(parse_args(base + ["--output-dir", str(out_whole)]))
    r_chunk = dispatch_runtime(parse_args(base + [
        "--output-dir", str(out_chunk),
        "inference.chunked.enabled=true",
        "inference.chunked.chunk_size=[16, 32, 32]",
        "inference.chunked.halo=[4, 8, 8]",
    ]))
    k = list(r_whole["metrics"])[0]
    assert r_chunk["metrics"][k]["jaccard"] == pytest.approx(
        r_whole["metrics"][k]["jaccard"], abs=0.02
    )
    # manifest written for resume
    assert list(out_chunk.glob("*.manifest.json"))
