"""Training engine tests: optimizer/schedules, train state, end-to-end tiny
training on a synthetic volume (the reference's e2e philosophy:
``tests/e2e/test_lucchi_training.py``) over the 8-device CPU mesh."""

import math

import jax
import numpy as np
import pytest

from pytorch_connectomics_tpu.config import load_config
from pytorch_connectomics_tpu.config.schema import OptimizationConfig, build_dataclass
from pytorch_connectomics_tpu.training import Trainer, build_optimizer, build_schedule
from pytorch_connectomics_tpu.training.optim import build_schedule


def opt_cfg(**kw):
    return build_dataclass(OptimizationConfig, kw)


def test_warmup_cosine_schedule():
    cfg = opt_cfg(
        optimizer={"name": "AdamW", "lr": 1e-3},
        scheduler={"name": "WarmupCosineLR", "warmup_epochs": 2, "warmup_start_lr": 1e-6, "min_lr": 1e-6},
        max_epochs=10,
    )
    sched = build_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-6, rel=0.1)
    assert float(sched(20)) == pytest.approx(1e-3, rel=0.05)  # end of warmup
    assert float(sched(100)) < 1e-4  # decayed


def test_step_lr_schedule():
    cfg = opt_cfg(
        optimizer={"name": "SGD", "lr": 1e-2},
        scheduler={"name": "StepLR", "step_size": 2, "gamma": 0.1},
        max_epochs=10,
    )
    sched = build_schedule(cfg, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(1e-4)


def test_multistep_schedule():
    cfg = opt_cfg(
        optimizer={"name": "AdamW", "lr": 1.0},
        scheduler={"name": "MultiStepLR", "milestones": [1, 2], "gamma": 0.5},
        max_epochs=5,
    )
    sched = build_schedule(cfg, steps_per_epoch=10)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(15)) == pytest.approx(0.5)
    assert float(sched(25)) == pytest.approx(0.25)


MINI_TRAIN = """
experiment_name: train_mini
default:
  model:
    arch: {type: monai_unet}
    in_channels: 1
    out_channels: 1
    input_size: [8, 16, 16]
    monai: {filters: [4, 8], num_res_units: 1}
    loss:
      losses:
        - {function: DiceLoss, weight: 1.0, kwargs: {sigmoid: true}}
        - {function: WeightedBCEWithLogitsLoss, weight: 1.0}
  data:
    train: {image: "random://tr/im?shape=24x48x48", label: "random://tr/label?shape=24x48x48"}
    val: {image: "random://tr/im?shape=24x48x48", label: "random://tr/label?shape=24x48x48"}
    dataloader: {batch_size: 8, patch_size: [8, 16, 16]}
    label_transform:
      targets: [{name: binary}]
    augmentation:
      flip: {enabled: true, prob: 0.5}
      intensity: {enabled: true, gaussian_noise_prob: 0.5, gaussian_noise_std: 0.05}
train:
  optimization:
    max_epochs: 2
    n_steps_per_epoch: 4
    optimizer: {name: AdamW, lr: 1e-3}
    scheduler: {name: WarmupCosineLR, warmup_epochs: 1}
    gradient_clip_val: 1.0
  monitor:
    logging: {scalar: {loss_every_n_steps: 2}}
    checkpoint: {save_top_k: 1, save_last: true, monitor: train_loss_total_epoch}
    ema: {enabled: true, decay: 0.9}
  system: {seed: 3, num_workers: 1}
"""


@pytest.fixture(scope="module")
def mini_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "mini.yaml"
    p.write_text(MINI_TRAIN)
    return load_config(p, mode="train")


def test_end_to_end_training_loss_decreases(mini_cfg, tmp_path):
    trainer = Trainer(mini_cfg, run_dir=tmp_path / "run")
    assert trainer.mesh.devices.size == 8  # virtual CPU mesh
    metrics = trainer.fit()
    assert math.isfinite(metrics["train_loss_total_epoch"])
    assert "val_loss" in metrics and math.isfinite(metrics["val_loss"])
    assert "val_jaccard" in metrics
    # checkpoints written
    assert (tmp_path / "run" / "checkpoints" / "last").exists()
    assert trainer.state.ema_params is not None


def test_checkpoint_restore_roundtrip(mini_cfg, tmp_path):
    t1 = Trainer(mini_cfg, run_dir=tmp_path / "a")
    t1.fit(max_epochs=1)
    step1 = int(t1.state.step)
    t2 = Trainer(mini_cfg, run_dir=tmp_path / "b")
    t2.restore(t1.ckpt.last_path())
    assert int(t2.state.step) == step1
    p1 = jax.tree.leaves(t1.state.params)[0]
    p2 = jax.tree.leaves(t2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_step_interval_checkpointing(mini_cfg, tmp_path):
    """monitor.checkpoint.every_n_steps refreshes the 'last' checkpoint
    mid-epoch (reference every_n_train_steps, trainer.py:97)."""
    import copy

    cfg = copy.deepcopy(mini_cfg)
    cfg.monitor.checkpoint.every_n_steps = 2
    t = Trainer(cfg, run_dir=tmp_path / "stepck")
    t.fit(max_epochs=1)
    last = t.ckpt.last_path()
    assert last is not None
    meta = t.ckpt.read_metadata(last)
    assert int(meta["step"]) == 4  # final save at epoch end (step 4)
    # restore from the mid-epoch-refreshed last works
    t2 = Trainer(cfg, run_dir=tmp_path / "stepck2")
    t2.restore(last)
    assert int(t2.state.step) == 4


def test_params_only_restore_across_optimizer_chains(mini_cfg, tmp_path):
    """Inference restore must not depend on the train-stage optimizer
    structure: a checkpoint saved with gradient clipping (2-element optax
    chain) must restore params-only into a trainer built without it (this
    exact mismatch broke the round-4 production test leg on the TPU)."""
    import copy

    cfg1 = copy.deepcopy(mini_cfg)
    cfg1.optimization.gradient_clip_val = 1.0
    t1 = Trainer(cfg1, run_dir=tmp_path / "clip")
    t1.fit(max_epochs=1)

    cfg2 = copy.deepcopy(mini_cfg)
    cfg2.optimization.gradient_clip_val = None
    t2 = Trainer(cfg2, run_dir=tmp_path / "noclip")
    with pytest.raises(ValueError):
        t2.restore(t1.ckpt.last_path())  # full-state restore: mismatch
    t2.restore(t1.ckpt.last_path(), params_only=True)
    assert int(t2.state.step) == int(t1.state.step)
    p1 = jax.tree.leaves(t1.state.params)[0]
    p2 = jax.tree.leaves(t2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    # EMA slots restored too (mini_cfg enables EMA)
    if t1.state.ema_params is not None:
        e1 = jax.tree.leaves(t1.state.ema_params)[0]
        e2 = jax.tree.leaves(t2.state.ema_params)[0]
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_checkpoint_reset_optimizer(mini_cfg, tmp_path):
    t1 = Trainer(mini_cfg, run_dir=tmp_path / "c")
    t1.fit(max_epochs=1)
    t2 = Trainer(mini_cfg, run_dir=tmp_path / "d")
    t2.restore(t1.ckpt.last_path(), reset_optimizer=True, reset_epoch=True)
    assert int(t2.state.step) == 0


def test_profiler_trace_capture(tmp_path):
    """monitor.profile_steps captures a jax.profiler trace into run_dir."""
    from pytorch_connectomics_tpu.config.schema import Config, build_dataclass
    from pytorch_connectomics_tpu.parallel.mesh import make_mesh
    from pytorch_connectomics_tpu.training.loop import Trainer

    cfg = build_dataclass(
        Config,
        {
            "model": {
                "arch": {"type": "monai_unet"},
                "in_channels": 1, "out_channels": 1,
                "input_size": [8, 16, 16],
                "monai": {"filters": [4, 8, 8], "num_res_units": 1},
                "loss": {"losses": [{"function": "DiceLoss",
                                     "kwargs": {"sigmoid": True}}]},
            },
            "data": {
                "train": {"image": "random://prof/image", "label": "random://prof/label"},
                "dataloader": {"patch_size": [8, 16, 16], "batch_size": 2},
            },
            "optimization": {"max_epochs": 1, "n_steps_per_epoch": 4},
            "monitor": {"profile_steps": [2, 3]},
        },
    )
    tr = Trainer(cfg, run_dir=tmp_path, mesh=make_mesh({"data": 1}))
    tr.fit()
    prof_dir = tmp_path / "profile"
    assert prof_dir.exists()
    assert any(prof_dir.rglob("*")), "no trace files written"
