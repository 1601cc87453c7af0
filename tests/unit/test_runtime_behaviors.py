"""Behavior-level coverage for previously thin areas: abiss param export,
prediction-cache validation against hash changes, decode-only loading,
experiment-log directions, and UpKern transfer."""

import json

import numpy as np
import pytest


def test_abiss_prepare_run(tmp_path):
    """prepare_abiss_run exports affinities, writes SECRETS/param with the
    reference key set, and computes the octree top mip."""
    from pytorch_connectomics_tpu.runtime.abiss_bridge import prepare_abiss_run

    aff = np.random.default_rng(0).random((3, 8, 16, 16)).astype(np.float32)
    payload, secrets, top_mip = prepare_abiss_run(
        aff, tmp_path, chunk_size_xyz=(16, 16, 8), agg_threshold=0.3
    )
    assert (secrets / "param").exists()
    on_disk = json.loads((secrets / "param").read_text())
    assert on_disk == payload
    for key in (
        "NAME", "AFF_PATH", "WS_PATH", "SEG_PATH", "SCRATCH_PATH",
        "AFF_RESOLUTION", "AFF_CHANNELS", "BBOX", "CHUNK_SIZE",
        "WS_HIGH_THRESHOLD", "WS_LOW_THRESHOLD", "WS_SIZE_THRESHOLD",
        "WS_DUST_THRESHOLD", "AGG_THRESHOLD",
    ):
        assert key in payload, key
    assert payload["AGG_THRESHOLD"] == 0.3
    # BBOX is xyz: [0,0,0, x,y,z] for a (z=8, y=16, x=16) volume
    assert payload["BBOX"] == [0, 0, 0, 16, 16, 8]
    # dust threshold defaults to the size threshold (reference :673)
    assert payload["WS_DUST_THRESHOLD"] == payload["WS_SIZE_THRESHOLD"]
    assert top_mip == 0  # single chunk covers the bbox


def test_abiss_top_mip_and_alignment():
    from pytorch_connectomics_tpu.runtime.abiss_bridge import (
        compute_top_mip,
        validate_upload_alignment,
    )

    # 4x4x2 chunk grid -> ceil-log2 of the largest dim = 2
    assert compute_top_mip([0, 0, 0, 1024, 1024, 512], [256, 256, 256]) == 2
    assert compute_top_mip([0, 0, 0, 256, 256, 256], [256, 256, 256]) == 0
    # aligned: logical 128 boundaries land on storage 64 boundaries
    validate_upload_alignment([0, 0, 0, 256, 256, 256], [0, 0, 0], [128, 128, 128], [64, 64, 64])
    # misaligned: logical 100 boundary not on storage 64 grid
    with pytest.raises(ValueError, match="non-aligned"):
        validate_upload_alignment([0, 0, 0, 256, 256, 256], [0, 0, 0], [100, 100, 100], [64, 64, 64])


def test_abiss_stage_plans(tmp_path):
    """Stage plans carry the reference batch-script commands and env."""
    from pytorch_connectomics_tpu.runtime.abiss_bridge import STAGES_ALL, stage_plan

    plans = {s: stage_plan(tmp_path, s, tmp_path / "secrets", 2, root_tag="tag") for s in STAGES_ALL}
    assert plans["watershed"].argv[-3:] == ("ws", "2", "tag")
    assert plans["watershed"].env["STAGE"] == "ws"
    assert "run_batch.sh" in plans["watershed"].argv[1]
    assert "remap_batch.sh" in plans["remap_watershed"].argv[1]
    assert plans["agglomerate_mean_edge"].argv[-3:] == ("me", "2", "tag")
    assert plans["agglomerate_mean_edge"].env["STAGE"] == "agg"
    assert plans["remap_agglomeration"].argv[-3:] == ("agg", "2", "tag")
    for p in plans.values():
        assert p.env["WORKER_HOME"] == str(tmp_path)
        assert p.env["SECRETS"] == str(tmp_path / "secrets")
    with pytest.raises(ValueError, match="Unknown ABISS stage"):
        stage_plan(tmp_path, "bogus", tmp_path, 0)


def test_prediction_cache_hash_invalidation(tmp_path):
    from pytorch_connectomics_tpu.inference.output import (
        save_prediction,
        validate_prediction_cache,
    )

    pred = np.random.default_rng(1).random((2, 4, 8, 8)).astype(np.float32)
    p = tmp_path / "vol_prediction.h5"
    save_prediction(p, pred, "hash-A", "ckpt", "tag")
    assert validate_prediction_cache(p, "hash-A")
    # a config change must invalidate the cache
    assert not validate_prediction_cache(p, "hash-B")
    assert not validate_prediction_cache(tmp_path / "missing.h5", "hash-A")
    # a checkpoint change must too: config hash does not cover --checkpoint
    # (the queue2 random-weights prediction would otherwise be reused)
    assert validate_prediction_cache(p, "hash-A", "ckpt")
    assert not validate_prediction_cache(p, "hash-A", "other-ckpt")
    # checkpoint=None skips the weight-provenance check (decode-only reuse)
    assert validate_prediction_cache(p, "hash-A", None)
    # a random-init prediction (saved before any training) must NOT validate
    # once a checkpoint exists — the residual hole behind the jaccard-0.022
    # reuse trap — but stays valid for another random-init run
    p2 = tmp_path / "randominit_prediction.h5"
    save_prediction(p2, pred, "hash-A", "", "tag")
    assert not validate_prediction_cache(p2, "hash-A", "ckpt")
    assert validate_prediction_cache(p2, "hash-A", "")
    # true legacy caches (no checkpoint attr at all) stay valid
    from pytorch_connectomics_tpu.data.io import save_volume

    p3 = tmp_path / "legacy_prediction.h5"
    save_volume(str(p3), pred, attrs={"config_hash": "hash-A"})
    assert validate_prediction_cache(p3, "hash-A", "ckpt")


def test_decode_only_pipeline_loads_external_prediction(tmp_path):
    """decoding.load_prediction_path: full test pipeline with no model
    inference (reference waterz_decoding.yaml)."""
    import h5py
    import jax

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.runtime.test_pipeline import run_test_pipeline

    # affinity prediction with two blobs + gt
    aff = np.zeros((3, 8, 16, 16), np.float32)
    aff[:, 1:7, 2:7, 2:14] = 0.95
    aff[:, 1:7, 9:14, 2:14] = 0.95
    gt = np.zeros((8, 16, 16), np.uint32)
    gt[1:7, 2:7, 2:14] = 1
    gt[1:7, 9:14, 2:14] = 2
    with h5py.File(tmp_path / "aff.h5", "w") as f:
        f["main"] = aff
    with h5py.File(tmp_path / "gt.h5", "w") as f:
        f["main"] = gt
    cfg = load_config("tutorials/waterz_decoding.yaml", mode="test")
    cfg.decoding.load_prediction_path = str(tmp_path / "aff.h5")
    cfg.data.test.label = str(tmp_path / "gt.h5")
    cfg.data.test.resolution = None
    model = build_model(cfg.model)
    params = init_model(model, cfg.model, jax.random.PRNGKey(0))
    metrics = run_test_pipeline(cfg, model, params, tmp_path / "out")
    (vol_metrics,) = metrics.values()
    assert vol_metrics["adapted_rand"] < 0.05  # near-perfect decode
    # decoded artifact carries the decode-recipe tag
    decoded = list((tmp_path / "out").glob("*decoded*"))
    assert decoded and "waterz" in decoded[0].name


def test_experiment_log_directions(tmp_path):
    from pytorch_connectomics_tpu.decoding.experiment_log import ExperimentLog

    log = ExperimentLog(tmp_path / "e.jsonl")
    log.append("decode", "h1", {"t": 0.3}, {"adapted_rand": 0.4, "nerl": 0.5})
    log.append("decode", "h1", {"t": 0.6}, {"adapted_rand": 0.2, "nerl": 0.8})
    log.append("decode", "h2", {"t": 0.9}, {"adapted_rand": 0.7, "nerl": 0.2})
    assert log.best("adapted_rand")["params"]["t"] == 0.6  # minimized
    # reload from disk
    log2 = ExperimentLog(tmp_path / "e.jsonl")
    assert len(log2.entries()) == 3


def test_upkern_weight_inflation():
    """UpKern kernel 3->5 transfer (reference mednext_models.py:487)."""
    import jax

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.training.model_weights import upkern_transfer

    def make(k):
        cfg = build_dataclass(
            ModelConfig,
            {"arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 1,
             "input_size": [16, 16, 16],
             "mednext": {"size": "S", "kernel_size": k},
             "loss": {"losses": [{"function": "DiceLoss"}]},
             "compute_dtype": "float32"},
        )
        model = build_model(cfg)
        return model, init_model(model, cfg, jax.random.PRNGKey(0))

    _, v3 = make(3)
    _, v5 = make(5)
    inflated, stats = upkern_transfer(v5["params"], v3["params"])
    assert stats["inflated"] > 0 and stats["copied"] > 0
    k3 = np.asarray(v3["params"]["_Stage_0"]["MedNeXtBlock_0"]["Conv_0"]["kernel"])
    k5 = np.asarray(inflated["_Stage_0"]["MedNeXtBlock_0"]["Conv_0"]["kernel"])
    assert k5.shape[:3] == (5, 5, 5)
    # the inflated kernel is a trilinear resize of the 3^3 source: the
    # center tap is preserved exactly
    np.testing.assert_allclose(k5[2, 2, 2], k3[1, 1, 1], rtol=1e-5)
    # pointwise convs (same shape in both models) copy verbatim
    p3 = np.asarray(v3["params"]["_Stage_0"]["MedNeXtBlock_0"]["Conv_1"]["kernel"])
    p5 = np.asarray(inflated["_Stage_0"]["MedNeXtBlock_0"]["Conv_1"]["kernel"])
    np.testing.assert_array_equal(p3, p5)


def test_decode_stage_cache_reuse(tmp_path, monkeypatch):
    """Second run with a valid prediction cache reuses the decoded artifact
    instead of re-decoding (reference cache_resolver re-entrancy)."""
    import h5py
    import numpy as np

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.runtime.test_pipeline import run_test_pipeline
    from pytorch_connectomics_tpu.models import build_model, init_model
    import jax

    aff = np.zeros((3, 8, 16, 16), np.float32)
    aff[:, 1:7, 2:7, 2:14] = 0.95
    aff[:, 1:7, 9:14, 2:14] = 0.95
    img = aff.mean(axis=0)
    ip = str(tmp_path / "im.h5")
    with h5py.File(ip, "w") as f:
        f.create_dataset("main", data=img)

    raw = {
        "model": {
            "arch": {"type": "monai_unet"},
            "in_channels": 1, "out_channels": 3,
            "input_size": [8, 16, 16],
            "monai": {"filters": [4, 8, 8], "num_res_units": 1},
            "loss": {"losses": [{"function": "DiceLoss"}]},
        },
        "data": {"test": {"image": ip}},
        "inference": {"window": {"window_size": [8, 16, 16], "sw_batch_size": 1}},
        "decoding": {
            "enabled": True,
            "steps": [{"name": "affinity_cc", "kwargs": {"threshold": 0.5}}],
        },
        "evaluation": {"enabled": False},
    }
    cfg = load_config(raw_dict=raw, mode="test")
    model = build_model(cfg.model)
    params = init_model(model, cfg.model, jax.random.PRNGKey(0))["params"]
    run_test_pipeline(cfg, model, params, tmp_path / "out")
    dec = list((tmp_path / "out").glob("*decoded*"))
    assert dec, "no decoded artifact written"
    mtime = dec[0].stat().st_mtime_ns

    # second run: prediction cache valid -> decode skipped (artifact untouched)
    import pytorch_connectomics_tpu.runtime.test_pipeline as tp

    def boom(*a, **k):
        raise AssertionError("decode should have been skipped")

    monkeypatch.setattr(tp, "run_decoding_stage", boom)
    run_test_pipeline(cfg, model, params, tmp_path / "out")
    assert dec[0].stat().st_mtime_ns == mtime


def test_cli_demo_flag_and_config_requirement():
    """--demo runs without --config (resolves tutorials/minimal.yaml,
    fast-dev-run train); without either, parsing errors out (reference
    scripts/main.py --demo)."""
    import pytest

    from pytorch_connectomics_tpu.runtime.cli import parse_args, setup_config

    args = parse_args(["--demo"])
    assert args.demo and args.config is None
    cfg = setup_config(args)
    assert args.config.endswith("minimal.yaml")
    assert args.mode == "train" and args.fast_dev_run
    assert cfg.optimization.max_epochs == 1

    with pytest.raises(SystemExit):
        parse_args([])


def test_run_dir_timestamp_coordination(tmp_path, monkeypatch):
    """Multi-host run-dir agreement: process 0 publishes the timestamp via
    <base>/.latest_timestamp; other processes adopt it (reference
    training/lightning/runtime.py:71-116)."""
    import jax

    from pytorch_connectomics_tpu.config.loader import load_config
    from pytorch_connectomics_tpu.runtime.dispatch import setup_runtime_directories

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "experiment_name: coord\n"
        "model: {arch: {type: monai_unet}, in_channels: 1, out_channels: 1,\n"
        "  input_size: [8, 16, 16], monai: {filters: [4, 8]},\n"
        "  loss: {losses: [{function: DiceLoss}]}}\n"
        "data:\n"
        "  train: {image: 'random://ts/im?shape=8x16x16', label: 'random://ts/label?shape=8x16x16'}\n"
        "  dataloader: {patch_size: [8, 16, 16]}\n"
        f"save_path: {tmp_path / 'runs'}\n"
    )
    cfg = load_config(cfg_file, mode="train")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    d0 = setup_runtime_directories(cfg, "train")
    assert (tmp_path / "runs" / ".latest_timestamp").read_text() == d0.name
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    d1 = setup_runtime_directories(cfg, "train")
    assert d1 == d0  # non-zero rank adopted process 0's timestamp


def test_resolve_latest_checkpoint(tmp_path):
    """test/tune modes without --checkpoint must find the newest trained
    checkpoint under save_path (the queue2 production run inferred with
    random weights because nothing resolved one — jaccard 0.022)."""
    import os
    import time

    from pytorch_connectomics_tpu.config.schema import Config
    from pytorch_connectomics_tpu.runtime.dispatch import resolve_latest_checkpoint

    cfg = Config()
    cfg.save_path = str(tmp_path / "exp")
    assert resolve_latest_checkpoint(cfg) is None

    old = tmp_path / "exp" / "20260101_000000" / "checkpoints"
    (old / "epoch=000-loss=1.0" / "state").mkdir(parents=True)
    new = tmp_path / "exp" / "20260102_000000" / "checkpoints"
    (new / "last" / "state").mkdir(parents=True)
    now = time.time()
    os.utime(old / "epoch=000-loss=1.0" / "state", (now - 100, now - 100))
    os.utime(new / "last" / "state", (now, now))

    got = resolve_latest_checkpoint(cfg)
    assert got is not None and got.endswith("20260102_000000/checkpoints/last")

    # newest run dir missing 'last' -> top-k entry still resolves
    import shutil

    shutil.rmtree(new / "last")
    got = resolve_latest_checkpoint(cfg)
    assert got is not None and "epoch=000-loss=1.0" in got
