"""Knowledge distillation (training/distill.py) + anisotropic patchify stem.

Round-4 additions: distill the stock MedNeXt teacher into the fast patchify
student (VERDICT r3 next-item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from pytorch_connectomics_tpu.config.schema import (
    ModelConfig,
    OptimizationConfig,
    build_dataclass,
)
from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator
from pytorch_connectomics_tpu.models import build_model, init_model
from pytorch_connectomics_tpu.training.distill import (
    DistillSpec,
    build_distill_spec,
    load_teacher_params,
    soft_target_loss,
)
from pytorch_connectomics_tpu.training.optim import build_optimizer
from pytorch_connectomics_tpu.training.state import create_train_state, make_train_step


def _tiny_cfg(patchify=False, stride=None, input_size=(16, 16, 16)):
    return build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 1,
            "input_size": list(input_size),
            "mednext": {
                "size": "custom",
                "base_channels": 4,
                "exp_ratio": 2,
                "block_counts": [1] * 9,
                "kernel_size": 3,
                "patchify_stem": patchify,
                "patchify_stride": stride,
            },
            "loss": {"losses": [{"function": "BCEWithLogitsLoss"}]},
            "compute_dtype": "float32",
        },
    )


def test_soft_target_loss_minimized_at_teacher():
    k = jax.random.PRNGKey(0)
    t = jax.random.normal(k, (2, 4, 4, 4, 1))
    # gradient at student == teacher must vanish (soft BCE minimum)
    g = jax.grad(lambda s: soft_target_loss(s, t, temperature=2.0))(t)
    assert float(jnp.max(jnp.abs(g))) < 1e-6
    # moving away from the teacher increases the loss
    base = float(soft_target_loss(t, t))
    off = float(soft_target_loss(t + 1.0, t))
    assert off > base


def test_soft_target_loss_dict_heads_and_ds_skip():
    k = jax.random.PRNGKey(1)
    a = jax.random.normal(k, (1, 4, 4, 4, 2))
    s = {"out": a, "ds_0": a * 100}
    t = {"out": a, "ds_0": a * -100}
    # ds_* heads are excluded — identical "out" means zero gradient
    g = jax.grad(lambda x: soft_target_loss({"out": x, "ds_0": x * 100}, t))(a)
    assert float(jnp.max(jnp.abs(g))) < 1e-6
    assert np.isfinite(float(soft_target_loss(s, t)))


def test_soft_target_loss_mse_mode():
    k = jax.random.PRNGKey(2)
    s = jax.random.normal(k, (1, 4, 4, 4, 1))
    assert float(soft_target_loss(s, s, mode="mse")) == 0.0
    assert float(soft_target_loss(s + 2.0, s, mode="mse")) == pytest.approx(4.0, rel=1e-5)


def test_train_step_with_distill_moves_student_toward_teacher():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    teacher_v = init_model(model, cfg, jax.random.PRNGKey(7))
    student_v = init_model(model, cfg, jax.random.PRNGKey(8))

    opt_cfg = build_dataclass(
        OptimizationConfig,
        {"optimizer": {"name": "Adam", "lr": 1e-2}, "max_epochs": 1,
         "n_steps_per_epoch": 4},
    )
    tx, _ = build_optimizer(opt_cfg, 4)
    orch = LossOrchestrator(cfg.loss)
    spec = DistillSpec(
        apply_fn=lambda v, x: model.apply(v, x, train=False),
        params=teacher_v["params"],
        alpha=0.7,
        temperature=2.0,
    )

    def apply_fn(v, x, train=False, rngs=None):
        return model.apply(v, x, train=train, rngs=rngs)

    step = jax.jit(make_train_step(apply_fn, orch, tx, distill=spec))
    state = create_train_state(student_v["params"], tx)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 16, 1))
    y = (jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 16, 1)) > 0.5).astype(
        jnp.float32
    )
    batch = {"image": x, "label": y}
    _, logs0 = step(state, batch)
    assert "loss_distill" in logs0 and "loss_hard" in logs0
    # mixed total = (1-alpha)*hard + alpha*distill
    np.testing.assert_allclose(
        float(logs0["loss_total"]),
        0.3 * float(logs0["loss_hard"]) + 0.7 * float(logs0["loss_distill"]),
        rtol=1e-5,
    )
    # several steps of pure distillation reduce the distill loss
    spec_pure = DistillSpec(
        apply_fn=spec.apply_fn, params=teacher_v["params"], alpha=1.0
    )
    step_pure = jax.jit(make_train_step(apply_fn, orch, tx, distill=spec_pure))
    st = create_train_state(student_v["params"], tx)
    first = None
    for _ in range(8):
        st, logs = step_pure(st, batch)
        if first is None:
            first = float(logs["loss_distill"])
    assert float(logs["loss_distill"]) < first


def test_build_distill_spec_from_config(tmp_path):
    cfg = _tiny_cfg(patchify=True)
    # teacher = same config with the patchify stem off (teacher_model merge)
    t_cfg = _tiny_cfg(patchify=False)
    t_model = build_model(t_cfg)
    t_params = init_model(t_model, t_cfg, jax.random.PRNGKey(0))["params"]
    p = tmp_path / "teacher.msgpack"
    p.write_bytes(serialization.to_bytes(jax.device_get(t_params)))

    opt_cfg = build_dataclass(
        OptimizationConfig,
        {
            "distill": {
                "teacher_checkpoint": str(p),
                "teacher_model": {"mednext": {"patchify_stem": False}},
                "alpha": 0.25,
                "temperature": 3.0,
            }
        },
    )
    spec = build_distill_spec(opt_cfg.distill, cfg)
    assert spec is not None and spec.alpha == 0.25 and spec.temperature == 3.0
    x = jnp.zeros((1, 16, 16, 16, 1))
    out = spec.apply_fn({"params": spec.params}, x)
    assert out.shape == (1, 16, 16, 16, 1)
    # round-trip: msgpack params equal the originals
    chex_tree = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        spec.params,
        jax.device_get(t_params),
    )
    del chex_tree
    # disabled when no checkpoint configured
    assert build_distill_spec(build_dataclass(OptimizationConfig, {}).distill, cfg) is None


def test_load_teacher_params_roundtrip(tmp_path):
    tree = {"conv": {"kernel": np.ones((3, 3, 1, 2), np.float32)}}
    p = tmp_path / "w.msgpack"
    p.write_bytes(serialization.to_bytes(tree))
    out = load_teacher_params(p)
    np.testing.assert_array_equal(out["conv"]["kernel"], tree["conv"]["kernel"])


@pytest.mark.parametrize("stride", [(1, 2, 2), (2, 2, 2)])
def test_patchify_stride_preserves_shape(stride):
    # each axis must be divisible by stem_stride * 16 (4 encoder downs)
    shape = tuple(16 * s for s in stride)
    cfg = _tiny_cfg(patchify=True, stride=list(stride), input_size=shape)
    model = build_model(cfg)
    v = init_model(model, cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, *shape, 1))
    out = model.apply(v, x)
    assert out.shape == (1, *shape, 1)
    # aniso stem must NOT downsample z inside the stem conv: check the stem
    # kernel is 1 along z for stride (1,2,2)
    stem_k = v["params"]["stem"]["kernel"]
    if stride[0] == 1:
        assert stem_k.shape[0] == 1
    else:
        assert stem_k.shape[0] == 2
