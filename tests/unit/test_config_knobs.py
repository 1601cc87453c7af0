"""Every declared config knob must act — these tests pin the wirings for
knobs that were once silently ignored (reference contracts cited per test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_connectomics_tpu.config.schema import (
    LossConfig,
    ModelConfig,
    OptimizationConfig,
    build_dataclass,
)


def test_scheduler_interval_step_vs_epoch():
    """scheduler.interval='step' interprets step_size/milestones as raw steps
    (reference Lightning scheduler interval contract)."""
    from pytorch_connectomics_tpu.training.optim import build_schedule

    base = {"max_epochs": 10, "n_steps_per_epoch": 100, "optimizer": {"lr": 1.0}}
    se = build_schedule(build_dataclass(OptimizationConfig, {
        **base, "scheduler": {"name": "StepLR", "step_size": 2, "gamma": 0.5}}), 100)
    ss = build_schedule(build_dataclass(OptimizationConfig, {
        **base, "scheduler": {"name": "StepLR", "step_size": 2, "gamma": 0.5,
                              "interval": "step"}}), 100)
    assert float(se(199)) == 1.0 and float(se(200)) == 0.5
    assert float(ss(1)) == 1.0 and float(ss(2)) == 0.5


def test_loss_spatial_weight_routing():
    """Per-term spatial_weight: 'mask' folds the weight map into the loss
    mask, 'none' drops it, default scales (reference spatial_weight_arg,
    losses/plan.py:37 / orchestrator.py:199)."""
    from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator

    lc = build_dataclass(LossConfig, {"losses": [
        {"function": "WeightedMSELoss", "weight": 1.0, "spatial_weight": "mask"},
        {"function": "WeightedMSELoss", "weight": 1.0, "spatial_weight": "none"},
        {"function": "WeightedMSELoss", "weight": 1.0},
    ]})
    orch = LossOrchestrator(lc)
    # error 2 in the weighted half, error 6 in the unweighted half
    pred = jnp.concatenate(
        [jnp.full((1, 2, 4, 4, 1), 2.0), jnp.full((1, 2, 4, 4, 1), 6.0)], axis=1
    )
    tgt = jnp.zeros((1, 4, 4, 4, 1))
    w = jnp.concatenate([jnp.ones((1, 2, 4, 4, 1)), jnp.zeros((1, 2, 4, 4, 1))], axis=1)
    _, logs = orch(pred, tgt, weight=w)
    per_term = [float(logs[f"loss_{t.name}"]) for t in orch.terms]
    assert per_term[1] == 20.0  # 'none': plain MSE over everything (4+36)/2
    assert per_term[0] == 4.0   # 'mask': mean over the VALID region only
    assert per_term[2] == 2.0   # default weight: sum(w*err)/N
    with pytest.raises(ValueError):
        LossOrchestrator(build_dataclass(LossConfig, {"losses": [
            {"function": "DiceLoss", "spatial_weight": "bogus"}]}))


def test_model_dropout_and_param_dtype():
    """monai.dropout is live in train mode (different rngs change the output)
    and off in eval; model.param_dtype casts stored params."""
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(ModelConfig, {
        "arch": {"type": "monai_unet"}, "in_channels": 1, "out_channels": 1,
        "input_size": [8, 16, 16], "monai": {"filters": [4, 8], "dropout": 0.5},
        "param_dtype": "bfloat16",
        "loss": {"losses": [{"function": "DiceLoss"}]},
    })
    m = build_model(cfg)
    p = init_model(m, cfg, jax.random.PRNGKey(0))
    assert jax.tree.leaves(p)[0].dtype == jnp.bfloat16
    x = jnp.ones((1, 8, 16, 16, 1))
    a = m.apply(p, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    b = m.apply(p, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    e1 = m.apply(p, x, train=False)
    e2 = m.apply(p, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_rsunet_group_norm_groups():
    """rsunet.group_norm_groups reaches the GroupNorm layers: different group
    counts normalize at different granularity, so outputs differ on the same
    params-by-seed random input."""
    from pytorch_connectomics_tpu.models import build_model, init_model

    def run(groups):
        cfg = build_dataclass(ModelConfig, {
            "arch": {"type": "rsunet"}, "in_channels": 1, "out_channels": 1,
            "input_size": [8, 16, 16],
            "rsunet": {"width": [8, 16], "group_norm_groups": groups},
            "loss": {"losses": [{"function": "DiceLoss"}]},
        })
        m = build_model(cfg)
        p = init_model(m, cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 16, 16, 1))
        return np.asarray(m.apply(p, x, train=False))

    o1, o4 = run(1), run(4)
    assert np.isfinite(o1).all() and np.isfinite(o4).all()
    assert not np.allclose(o1, o4)


def test_chunked_roi_filter_skips_padding_chunks():
    """chunked.roi_filter drops chunks whose core is pure virtual padding
    (reference ROI filtering, inference/chunked.py:217-258)."""
    from pytorch_connectomics_tpu.chunked.grid import build_chunk_grid

    # emulate the filter predicate on a padded accessor geometry
    pad = (8, 0, 0)
    base = (8, 16, 16)
    vol_shape = tuple(b + 2 * p for b, p in zip(base, pad))
    chunks = build_chunk_grid(vol_shape, (8, 16, 16), (0, 0, 0))
    lo = pad
    hi = [p + b for p, b in zip(pad, base)]
    kept = [c for c in chunks
            if all(c.start[i] < hi[i] and c.stop[i] > lo[i] for i in range(3))]
    assert len(chunks) == 3 and len(kept) == 1
    assert kept[0].start[0] == 8


def test_internal_path_wiring():
    from pytorch_connectomics_tpu.data.pipeline import _with_internal_path

    assert _with_internal_path("v.h5", "raw") == "v.h5::raw"
    assert _with_internal_path(["a.h5", "b.h5::x"], "raw") == ["a.h5::raw", "b.h5::x"]
    assert _with_internal_path("random://x/im?shape=4x4x4", "raw").startswith("random://")
    assert _with_internal_path(None, "raw") is None


def test_manager_head_spans_multihead():
    """InferenceManager exposes per-head channel spans (sorted-name order,
    matching the merged concat) for save_all_heads."""
    from pytorch_connectomics_tpu.config.schema import Config
    from pytorch_connectomics_tpu.inference.manager import InferenceManager
    from pytorch_connectomics_tpu.models import build_model

    cfg = build_dataclass(Config, {
        "model": {
            "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 3,
            "input_size": [8, 16, 16],
            "mednext": {"size": "custom", "base_channels": 4,
                        "block_counts": [1, 1, 1, 1, 1, 1, 1, 1, 1],
                        "heads": [{"name": "binary", "out_channels": 1},
                                  {"name": "aff", "out_channels": 2}]},
            "loss": {"losses": [{"function": "DiceLoss"}]},
        },
    })
    mgr = InferenceManager(cfg, build_model(cfg.model))
    assert mgr.head_spans == [("aff", 0, 2), ("binary", 2, 3)]


def test_num_samples_sets_steps_per_epoch(tmp_path):
    """dataloader.num_samples derives steps/epoch when n_steps_per_epoch is
    unset (reference sample-count math, data/datasets/sampling.py)."""
    from pytorch_connectomics_tpu.config.loader import load_config
    from pytorch_connectomics_tpu.training.loop import Trainer

    yaml = """
experiment_name: knobs
model:
  arch: {type: monai_unet}
  in_channels: 1
  out_channels: 1
  input_size: [8, 16, 16]
  monai: {filters: [4, 8]}
  loss: {losses: [{function: DiceLoss}]}
data:
  train: {image: "random://kn/im?shape=16x32x32", label: "random://kn/label?shape=16x32x32"}
  dataloader: {batch_size: 4, patch_size: [8, 16, 16], num_samples: 32}
  label_transform: {targets: [{name: binary}]}
train:
  optimization: {max_epochs: 1}
"""
    p = tmp_path / "kn.yaml"
    p.write_text(yaml)
    cfg = load_config(p, mode="train")
    tr = Trainer(cfg, run_dir=tmp_path / "run")
    assert tr.steps_per_epoch == 8  # 32 samples / batch 4


def test_max_steps_bounds_training(tmp_path):
    """optimization.max_steps stops the run mid-epoch and extends past
    max_epochs when larger (reference step-based training,
    trainer.py:258-271)."""
    from pytorch_connectomics_tpu.config.loader import load_config
    from pytorch_connectomics_tpu.training.loop import Trainer

    yaml = """
experiment_name: msteps
model:
  arch: {type: monai_unet}
  in_channels: 1
  out_channels: 1
  input_size: [8, 16, 16]
  monai: {filters: [4, 8]}
  loss: {losses: [{function: DiceLoss}]}
data:
  train: {image: "random://ms/im?shape=16x32x32", label: "random://ms/label?shape=16x32x32"}
  dataloader: {batch_size: 8, patch_size: [8, 16, 16]}
  label_transform: {targets: [{name: binary}]}
train:
  optimization: {max_epochs: 1, n_steps_per_epoch: 4, max_steps: 6}
"""
    p = tmp_path / "ms.yaml"
    p.write_text(yaml)
    cfg = load_config(p, mode="train")
    tr = Trainer(cfg, run_dir=tmp_path / "run")
    tr.fit()
    assert int(tr.state.step) == 6  # 1.5 epochs: bounded by steps, not epochs
