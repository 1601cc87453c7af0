"""Realistic-volume end-to-end run (VERDICT r2 Weak #8): one test at a
Lucchi-class test-volume size (64 x 256 x 256 = 4.2 Mvox, vs the reference
test volume's 130 Mvox) through the real CLI path — train a few steps, then
infer (sliding window + patch-local TTA) -> decode -> evaluate, and check
the whole-vs-chunked oracle at the same size. Marked slow; everything else
in the suite runs at toy sizes."""

import textwrap

import numpy as np
import pytest

from pytorch_connectomics_tpu.runtime import dispatch_runtime, parse_args

CFG = """
experiment_name: e2e_real
save_path: {save_path}
default:
  pipeline_profile: binary
  model:
    arch: {{type: monai_unet}}
    in_channels: 1
    input_size: [16, 64, 64]
    monai: {{filters: [4, 8], num_res_units: 1}}
  data:
    train: {{image: "random://e2er/im?shape=32x96x96", label: "random://e2er/label?shape=32x96x96"}}
    dataloader: {{batch_size: 2, patch_size: [16, 64, 64]}}
    label_transform:
      targets: [{{name: binary}}]
  inference:
    window: {{window_size: [16, 64, 64], overlap: 0.5, sw_batch_size: 4, blending: bump}}
    test_time_augmentation:
      enabled: true
      flip_axes: xy
      patch_first_local: true
      act: sigmoid
  decoding:
    enabled: true
    steps: [{{name: binary_cc, kwargs: {{threshold: 0.5, min_size: 64}}}}]
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
    test: {{image: "random://e2er/test?shape=64x256x256", label: "random://e2er/testlbl?shape=64x256x256"}}
"""


@pytest.mark.slow
def test_realistic_volume_train_test_chunked(tmp_path):
    import h5py

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(textwrap.dedent(CFG.format(save_path=tmp_path / "out")))

    dispatch_runtime(parse_args(["--config", str(cfg_file), "--mode", "train"]))
    ckpts = sorted((tmp_path / "out").rglob("last*"))
    assert ckpts, "no checkpoint written"

    base = ["--config", str(cfg_file), "--mode", "test",
            "--checkpoint", str(ckpts[0])]
    out_whole = tmp_path / "whole"
    out_chunk = tmp_path / "chunk"
    r_whole = dispatch_runtime(parse_args(base + ["--output-dir", str(out_whole)]))
    k = list(r_whole["metrics"])[0]
    m = r_whole["metrics"][k]
    assert np.isfinite(m["jaccard"]) and np.isfinite(m["dice"])

    preds = sorted(out_whole.glob("*prediction*.h5"))
    assert preds, "no prediction artifact written"
    with h5py.File(preds[0], "r") as f:
        whole = f[next(iter(f))][:]
    assert whole.shape[-3:] == (64, 256, 256)
    decoded = sorted(out_whole.glob("*decoded*.h5"))
    assert decoded, "no decoded artifact written"

    # chunked oracle at the same size: 2x2x2 chunk grid + halo reproduces
    # the whole-volume result
    r_chunk = dispatch_runtime(parse_args(base + [
        "--output-dir", str(out_chunk),
        "inference.chunked.enabled=true",
        "inference.chunked.chunk_size=[32, 128, 128]",
        "inference.chunked.halo=[8, 32, 32]",
    ]))
    assert r_chunk["metrics"][k]["jaccard"] == pytest.approx(m["jaccard"], abs=0.02)
    chunk_preds = sorted(out_chunk.glob("*prediction*.h5"))
    assert chunk_preds
    with h5py.File(chunk_preds[0], "r") as f:
        chunked = f[next(iter(f))][:]
    np.testing.assert_allclose(
        np.asarray(chunked, np.float32), np.asarray(whole, np.float32), atol=0.05
    )
    # and the interior (away from chunk seam halos) matches tightly
    np.testing.assert_allclose(
        np.asarray(chunked, np.float32)[..., 8:-8, 16:-16, 16:-16],
        np.asarray(whole, np.float32)[..., 8:-8, 16:-16, 16:-16],
        atol=2e-3,
    )
