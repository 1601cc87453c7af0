"""Smoke tests for the utility scripts (run via subprocess like a user)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]


def run(args, **kw):
    kw.setdefault("timeout", 300)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True, text=True, **kw
    )


@pytest.fixture(scope="module")
def vol_h5(tmp_path_factory):
    from pytorch_connectomics_tpu.data.io import save_volume

    d = tmp_path_factory.mktemp("vols")
    vol = (np.random.rand(8, 32, 32) * 255).astype(np.uint8)
    save_volume(str(d / "vol.h5"), vol)
    seg = np.zeros((8, 32, 32), np.uint32)
    seg[2:6, 4:12, 4:12] = 1
    seg[2:6, 20:28, 20:28] = 2
    save_volume(str(d / "seg.h5"), seg)
    return d


def test_downsample_script(vol_h5):
    r = run(["scripts/downsample.py", str(vol_h5 / "vol.h5"), str(vol_h5 / "ds.h5"), "--factors", "1", "2", "2"])
    assert r.returncode == 0, r.stderr
    from pytorch_connectomics_tpu.data.io import read_volume

    assert read_volume(str(vol_h5 / "ds.h5")).shape == (8, 16, 16)


def test_uncrop_script(vol_h5):
    r = run(["scripts/uncrop.py", str(vol_h5 / "vol.h5"), str(vol_h5 / "un.h5"),
             "--full-shape", "16", "64", "64", "--offset", "4", "16", "16"])
    assert r.returncode == 0, r.stderr


def test_convert_uint8_script(vol_h5):
    r = run(["scripts/convert_h5_to_uint8.py", str(vol_h5 / "vol.h5"), str(vol_h5 / "u8.h5")])
    assert r.returncode == 0, r.stderr


def test_evaluate_prediction_script(vol_h5):
    r = run(["scripts/evaluate_prediction.py", str(vol_h5 / "seg.h5"), str(vol_h5 / "seg.h5"),
             "--metrics", "adapted_rand", "voi"])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["adapted_rand"] == pytest.approx(0.0, abs=1e-9)


def test_error_analysis_script(vol_h5):
    r = run(["scripts/error_analysis_seg.py", str(vol_h5 / "seg.h5"), str(vol_h5 / "seg.h5")])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["matching"]["f1"] == 1.0


def test_launcher_emits_shard_commands():
    r = run(["scripts/launcher.py", "--config", "tutorials/minimal.yaml", "--num-shards", "3"])
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("--shard-id") == 3


def test_download_data_lists_missing(tmp_path):
    r = run(["scripts/download_data.py", "lucchi++", "--root", str(tmp_path)])
    assert r.returncode == 0, r.stderr
    assert "lucchi++" in r.stdout


def test_rank_sharded_test_pipeline(monkeypatch, tmp_path):
    """RANK/WORLD_SIZE env splits test volumes across ranks without comm
    (reference DistributedEvaluationSampler behavior, called in-process with
    explicit rank like the reference tests do)."""
    from pytorch_connectomics_tpu.runtime.sharding import (
        assign_volumes_to_ranks,
        detect_rank_world,
    )

    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "2")
    rank, world = detect_rank_world()
    assert (rank, world) == (1, 2)
    vols = [f"v{i}.h5" for i in range(5)]
    r0 = assign_volumes_to_ranks(vols, 0, 2)
    r1 = assign_volumes_to_ranks(vols, 1, 2)
    assert sorted(r0 + r1) == sorted(vols)
    assert not set(r0) & set(r1)


def test_compare_config_resolved_diff():
    r = run(["scripts/compare_config.py", "tutorials/mitoem.yaml",
             "tutorials/mitoem_h.yaml", "--mode", "test"])
    assert r.returncode == 0, r.stderr
    assert "resolved differences" in r.stdout
    assert "experiment_name" in r.stdout


def test_eval_curvilinear_cli(vol_h5, tmp_path):
    from pytorch_connectomics_tpu.data.io import save_volume

    tube = np.zeros((8, 32, 32), np.uint8)
    tube[:, 15:17, :] = 1
    pred = np.zeros_like(tube)
    pred[:, 16:18, :] = 1
    save_volume(str(tmp_path / "p.h5"), pred)
    save_volume(str(tmp_path / "g.h5"), tube)
    r = run(["scripts/eval_curvilinear.py", "--pred", str(tmp_path / "p.h5"),
             "--gt", str(tmp_path / "g.h5"), "--tolerance", "2"])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["mean"]["f1"] == 1.0  # 1-voxel offset within tolerance 2


def test_copy_uri_file_scheme(tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("x")
    r = run(["scripts/copy_uri.py", str(src), f"file://{tmp_path}/dest/"])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "dest" / "a.txt").exists()


def test_h5_to_precomputed_multiscale(vol_h5, tmp_path):
    layer = tmp_path / "layer"
    r = run(["scripts/h5_to_precomputed.py", str(vol_h5 / "vol.h5"), str(layer),
             "--chunk", "8", "16", "16", "--resolution", "30", "6", "6",
             "--mips", "2"])
    assert r.returncode == 0, r.stderr
    from pytorch_connectomics_tpu.data.precomputed import open_precomputed

    assert open_precomputed(layer, resolution=[30, 6, 6]).shape == (8, 32, 32)
    assert open_precomputed(layer, resolution=[30, 12, 12]).shape == (8, 16, 16)


def test_cc3d_chunks_script_modes(vol_h5, tmp_path):
    """Chunked decode CLI: cc and waterz modes both equal their whole-volume
    decoders on a stored affinity volume."""
    from pytorch_connectomics_tpu.data.io import read_volume, save_volume
    from pytorch_connectomics_tpu.decoding.decoders import (
        decode_affinity_cc,
        decode_waterz,
    )

    rng = np.random.default_rng(5)
    aff = (rng.integers(0, 257, (3, 8, 16, 16)) / 256.0).astype(np.float32)
    save_volume(str(tmp_path / "aff.h5"), aff)

    r = run(["scripts/cc3d_chunks.py", str(tmp_path / "aff.h5"), str(tmp_path / "cc.h5"),
             "--threshold", "0.75", "--chunk", "8", "8", "8"])
    assert r.returncode == 0, r.stderr
    assert np.array_equal(
        read_volume(str(tmp_path / "cc.h5")), decode_affinity_cc(aff, 0.75))

    r = run(["scripts/cc3d_chunks.py", str(tmp_path / "aff.h5"), str(tmp_path / "wz.h5"),
             "--mode", "waterz", "--threshold", "0.4", "--fragment-threshold", "0.9",
             "--chunk", "8", "8", "8"])
    assert r.returncode == 0, r.stderr
    assert np.array_equal(
        read_volume(str(tmp_path / "wz.h5")),
        decode_waterz(aff, threshold=0.4, fragments="cc", fragment_threshold=0.9))


def test_decode_bench_smoke():
    r = run(["scripts/decode_bench.py", "--shape", "16", "32", "32", "--reps", "1"])
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "decode_throughput"
    for key in ("ccl3d_26", "watershed_seeded", "agglomerate_mean", "mutex_watershed"):
        assert out["results"][key] > 0


def test_downsample_modes_and_chunked_equivalence(vol_h5, tmp_path):
    r1 = run(["scripts/downsample.py", str(vol_h5 / "vol.h5"),
              str(tmp_path / "w.h5"), "--factors", "2", "2", "2"])
    assert r1.returncode == 0, r1.stderr
    r2 = run(["scripts/downsample.py", str(vol_h5 / "vol.h5"),
              str(tmp_path / "c.h5"), "--factors", "2", "2", "2",
              "--chunk", "4", "16", "16"])
    assert r2.returncode == 0, r2.stderr
    import h5py

    with h5py.File(tmp_path / "w.h5") as f:
        whole = f["main"][:]
    with h5py.File(tmp_path / "c.h5") as f:
        chunked = f["main"][:]
    np.testing.assert_allclose(whole, chunked, atol=1e-6)
    # label volumes auto-detect strided mode and keep ids
    r3 = run(["scripts/downsample.py", str(vol_h5 / "seg.h5"),
              str(tmp_path / "l.h5"), "--factors", "2", "2", "2"])
    assert r3.returncode == 0, r3.stderr
    with h5py.File(tmp_path / "l.h5") as f:
        lab = f["main"][:]
    assert set(np.unique(lab)) <= {0, 1, 2}


def test_benchmark_script_apply_fns_accept_train_step_kwargs():
    """make_train_step calls apply_fn(v, x, train=True, rngs={...}); every
    benchmark script's local wrapper must accept both (a wrapper without
    ``rngs`` crashed the blob benchmark live after dropout wiring landed)."""
    for name in (
        "quality_benchmark.py",
        "blob_quality_benchmark.py",
        "instance_quality_benchmark.py",
        "train_bench.py",
    ):
        src = (REPO / "scripts" / name).read_text()
        assert "def apply_fn(v, x, train=False, rngs=None):" in src, name


@pytest.mark.slow
def test_quality_benchmark_smoke_cpu(tmp_path):
    """End-to-end quality benchmark on CPU at tiny settings: exercises the
    real make_train_step -> sliding-window -> Jaccard path the TPU runs,
    writing its tracking row to a tmp file instead of QUALITY.md."""
    qfile = tmp_path / "quality.md"
    r = run(
        ["scripts/quality_benchmark.py"],
        env={
            **os.environ,
            "QB_PLATFORM": "cpu",
            "QB_STEPS": "2",
            "QB_PATCH": "32",
            "QB_BATCH": "2",
            "QB_TRAIN_SHAPE": "32,64,64",
            "QB_TEST_SHAPE": "32,64,64",
            "QB_TTA": "0",
            "QB_QUALITY_FILE": str(qfile),
        },
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "synthetic_v2_jaccard"
    assert 0.0 <= out["value"] <= 1.0
    assert qfile.exists() and "| 2 |" in qfile.read_text()


def test_qb_insert_table_row_targets_correct_table(tmp_path):
    """Rows must land under their own task table, not at file end — two
    round-4 rows were misfiled under the blob table before _qb_common."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from _qb_common import insert_table_row
    finally:
        sys.path.pop(0)

    q = tmp_path / "Q.md"
    bin_hdr = "| date | task | jaccard |"
    blob_hdr = "| date | arch | bcd AP |"
    # fresh file: section block written with the row
    insert_table_row(q, bin_hdr, f"# T\n\n{bin_hdr}\n|---|---|---|\n", "| d1 | v2 | 0.9 |")
    # second table appended after the first
    insert_table_row(q, blob_hdr, f"\n## Blob\n\n{blob_hdr}\n|---|---|---|\n", "| d1 | base | 0.3 |")
    # new binary row must go under the BINARY table, before the blob section
    insert_table_row(q, bin_hdr, "unused", "| d2 | v2 | 0.95 |")
    text = q.read_text()
    assert text.index("| d2 | v2 | 0.95 |") < text.index("## Blob")
    # prose between rows (QUALITY.md's blend-fix blockquote) doesn't truncate
    # the table span: the new row goes after the LAST row, past the note
    lines = text.splitlines()
    i = lines.index("| d1 | base | 0.3 |")
    lines[i + 1 : i + 1] = ["> note", "| d2 | base | 0.4 |"]
    q.write_text("\n".join(lines) + "\n")
    insert_table_row(q, blob_hdr, "unused", "| d3 | base | 0.5 |")
    text = q.read_text()
    assert text.index("> note") < text.index("| d3 | base | 0.5 |")
    assert text.index("| d2 | base | 0.4 |") < text.index("| d3 | base | 0.5 |")


@pytest.mark.slow
def test_quality_benchmark_smoke_cpu_overlap_fallback(tmp_path):
    """Same path at overlap 0.25 (stride doesn't divide the window):
    predict_volume_device must route to the snap-grid HBM-accumulator
    engine — this exact configuration crashed the parity engine live on
    the TPU before the fallback existed."""
    qfile = tmp_path / "quality.md"
    r = run(
        ["scripts/quality_benchmark.py"],
        env={
            **os.environ,
            "QB_PLATFORM": "cpu",
            "QB_STEPS": "2",
            "QB_PATCH": "32",
            "QB_BATCH": "2",
            "QB_TRAIN_SHAPE": "32,64,64",
            "QB_TEST_SHAPE": "32,64,64",
            "QB_TTA": "0",
            "QB_OVERLAP": "0.25",
            "QB_QUALITY_FILE": str(qfile),
        },
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert 0.0 <= out["value"] <= 1.0
    assert "/ov0.25" in qfile.read_text()


@pytest.mark.slow
def test_instance_quality_benchmark_smoke_cpu(tmp_path):
    """Instance QB end-to-end on CPU at tiny settings, including the
    param save -> load round-trip used by the overlap-frontier legs
    (identical weights across sweeps)."""
    qfile = tmp_path / "quality.md"
    pfile = tmp_path / "params.msgpack"
    env = {
        **os.environ,
        "IQ_PLATFORM": "cpu",
        "IQ_STEPS": "2",
        "IQ_PATCH": "32",
        "IQ_BATCH": "2",
        "IQ_TRAIN_SHAPE": "32,64,64",
        "IQ_TEST_SHAPE": "32,64,64",
        "IQ_TTA": "0",
        "IQ_QUALITY_FILE": str(qfile),
    }
    r = run(
        ["scripts/instance_quality_benchmark.py"],
        env={**env, "IQ_SAVE_PARAMS": str(pfile)},
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert pfile.exists() and pfile.stat().st_size > 1000
    # reload saved params, inference-only, non-dividing overlap
    r2 = run(
        ["scripts/instance_quality_benchmark.py"],
        env={**env, "IQ_LOAD_PARAMS": str(pfile), "IQ_OVERLAP": "0.25"},
        timeout=1200,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    text = qfile.read_text()
    assert "/ov0.25/ld" in text


@pytest.mark.slow
def test_cli_train_then_test_auto_resolves_checkpoint(tmp_path):
    """`--mode test` without --checkpoint must restore the newest checkpoint
    from the train leg (the round-4 production queue silently inferred with
    random weights before this existed)."""
    sp = str(tmp_path / "exp")
    r = run(
        ["scripts/main.py", "--config", "tutorials/minimal.yaml",
         "--mode", "train", f"save_path={sp}"],
        timeout=900,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    r2 = run(
        ["scripts/main.py", "--config", "tutorials/minimal.yaml",
         "--mode", "test", f"save_path={sp}",
         "data.test.image=random://minimal/test_image?shape=32,64,64",
         "data.test.label=random://minimal/test_label?shape=32,64,64",
         "inference.window.window_size=[32,64,64]",
         "inference.window.sw_batch_size=1"],
        timeout=900,
    )
    out = r2.stdout + r2.stderr
    assert r2.returncode == 0, out[-3000:]
    assert "auto-resolved checkpoint" in out, out[-3000:]
    assert "restored checkpoint" in out, out[-3000:]
