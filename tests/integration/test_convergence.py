"""Learning sanity: a tiny UNet must actually learn an easy synthetic
binary segmentation task (blobs thresholded from smooth noise) — catching
broken gradients/optimizer/orchestrator wiring that shape tests miss."""

import math

import numpy as np
import pytest

from pytorch_connectomics_tpu.config import load_config
from pytorch_connectomics_tpu.training import Trainer


CFG = {
    "experiment_name": "converge",
    "model": {
        "arch": {"type": "monai_unet"},
        "in_channels": 1,
        "out_channels": 1,
        "input_size": [8, 16, 16],
        "monai": {"filters": [8, 16], "num_res_units": 1},
        "loss": {
            "losses": [
                {"function": "DiceLoss", "weight": 1.0, "kwargs": {"sigmoid": True}},
                {"function": "WeightedBCEWithLogitsLoss", "weight": 1.0},
            ]
        },
    },
    "data": {
        # label is exactly image > 0.6 on the synthetic volume -> learnable
        "train": {"image": "random://cv/im?shape=32x64x64", "label": "random://cv/label?shape=32x64x64"},
        "val": {"image": "random://cv/im?shape=32x64x64", "label": "random://cv/label?shape=32x64x64"},
        "dataloader": {"batch_size": 8, "patch_size": [8, 16, 16]},
        "label_transform": {"targets": [{"name": "binary"}]},
    },
    "optimization": {
        "max_epochs": 3,
        "n_steps_per_epoch": 15,
        "optimizer": {"name": "AdamW", "lr": 3e-3},
        "gradient_clip_val": 1.0,
        "limit_val_batches": 2,
    },
    "monitor": {"logging": {"scalar": {"loss_every_n_steps": 5}}},
    "system": {"seed": 0, "num_workers": 1},
}


def test_training_learns_synthetic_blobs(tmp_path):
    cfg = load_config(raw_dict=CFG, mode="train")
    trainer = Trainer(cfg, run_dir=tmp_path)
    _, val_pipe = __import__(
        "pytorch_connectomics_tpu.data.pipeline", fromlist=["build_pipelines"]
    ).build_pipelines(cfg)
    before = trainer.validate(val_pipe)
    metrics = trainer.fit()
    after = trainer.validate(val_pipe)
    assert after["val_loss"] < before["val_loss"] * 0.9, (before, after)
    assert after["val_jaccard"] > max(0.25, before["val_jaccard"])
    assert math.isfinite(metrics["train_loss_total_epoch"])
