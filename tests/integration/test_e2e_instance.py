"""End-to-end instance pipeline through the CLI dispatch on the
synthetic:// task schemes: affinity -> waterz (SNEMI recipe) and
bcd profile -> bcd watershed (MitoEM recipe), tiny shapes.

Covers: synthetic:// data scheme, affinity label transform, flip-TTA with
affinity realignment (manager-wired), decode registry (waterz /
bcd_watershed via the stock bcd pipeline profile), instance evaluation."""

from pathlib import Path

import pytest

from pytorch_connectomics_tpu.runtime import dispatch_runtime, parse_args

AFF_CFG = """
experiment_name: e2e_instance
save_path: {save_path}
default:
  model:
    arch: {{type: monai_unet}}
    in_channels: 1
    out_channels: 3
    input_size: [8, 16, 16]
    monai: {{filters: [4, 8], num_res_units: 1}}
    loss:
      losses:
        - {{function: BCEWithLogitsLoss, weight: 1.0}}
  data:
    train:
      image: "synthetic://instance/train_image?shape=16,32,32&seed=5&cells=8"
      label: "synthetic://instance/train_label?shape=16,32,32&seed=5&cells=8"
    dataloader: {{batch_size: 2, patch_size: [8, 16, 16]}}
    label_transform:
      targets:
        - {{name: affinity, kwargs: {{offsets: ["0-0-1", "0-1-0", "1-0-0"]}}}}
  inference:
    window: {{window_size: [8, 16, 16], overlap: 0.25, sw_batch_size: 2}}
    test_time_augmentation: {{enabled: true, flip_axes: [[2]]}}
    model: {{act: sigmoid}}
  decoding:
    enabled: true
    steps:
      - {{name: waterz, kwargs: {{threshold: 0.5, fragment_threshold: 0.5}}}}
  evaluation:
    enabled: true
    metrics: [adapted_rand, voi]
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
    test:
      image: "synthetic://instance/test_image?shape=16,32,32&seed=6&cells=8"
      label: "synthetic://instance/test_label?shape=16,32,32&seed=6&cells=8"
"""

BCD_CFG = """
experiment_name: e2e_bcd
save_path: {save_path}
default:
  pipeline_profile: bcd
  model:
    arch: {{type: monai_unet}}
    in_channels: 1
    input_size: [8, 16, 16]
    monai: {{filters: [4, 8], num_res_units: 1}}
  data:
    train:
      image: "synthetic://blobs/train_image?shape=16,32,32&seed=7&cells=6"
      label: "synthetic://blobs/train_label?shape=16,32,32&seed=7&cells=6"
    dataloader: {{batch_size: 2, patch_size: [8, 16, 16]}}
  inference:
    window: {{window_size: [8, 16, 16], overlap: 0.25, sw_batch_size: 2}}
    test_time_augmentation: {{enabled: false}}
  evaluation:
    enabled: true
    metrics: [adapted_rand, voi]
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
    test:
      image: "synthetic://blobs/test_image?shape=16,32,32&seed=8&cells=6"
      label: "synthetic://blobs/test_label?shape=16,32,32&seed=8&cells=6"
"""


@pytest.mark.parametrize("cfg_text,metric", [(AFF_CFG, "adapted_rand"), (BCD_CFG, "adapted_rand")],
                         ids=["affinity_waterz", "bcd_profile"])
def test_instance_pipeline_end_to_end(tmp_path, cfg_text, metric):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(cfg_text.format(save_path=str(tmp_path / "outputs")))
    run_dir = tmp_path / "run"
    args = parse_args(["--config", str(cfg), "--mode", "train", "--output-dir", str(run_dir)])
    dispatch_runtime(args)
    assert (Path(run_dir) / "checkpoints" / "last").exists()
    args = parse_args([
        "--config", str(cfg), "--mode", "test",
        "--checkpoint", str(Path(run_dir) / "checkpoints" / "last"),
    ])
    results = dispatch_runtime(args)
    vol_metrics = next(iter(results["metrics"].values()))
    assert metric in vol_metrics and "voi" in vol_metrics
    import numpy as np

    assert np.isfinite(vol_metrics[metric])
