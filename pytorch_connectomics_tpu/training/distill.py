"""Knowledge distillation: train a fast student under a frozen teacher.

Motivation (round-3 finding, docs/performance.md): the patchify-stem MedNeXt
variant is ~6x faster at inference on the v5e but plateaus ~0.015 Jaccard
below the stock model when trained on hard labels alone. Distilling the
converged stock model's soft predictions into the student is the standard
lever for exactly this gap (Hinton et al., 2015 — "Distilling the Knowledge
in a Neural Network").

The reference has no distillation subsystem; this is a TPU-native extension
configured via ``optimization.distill`` (schema ``DistillConfig``). The
teacher forward runs frozen (``stop_gradient``) inside the SAME jitted train
step as the student — one XLA program, no host round-trips, and XLA overlaps
the two forwards where the schedule allows.

Losses are per-channel sigmoid distillation (EM heads are per-voxel binary /
affinity / distance maps, not softmax classifiers):

  L_distill = T^2 * BCE(student_logits / T, sigmoid(teacher_logits / T))

and the total is ``(1 - alpha) * L_hard + alpha * L_distill``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DistillSpec:
    """Runtime bundle passed to ``make_train_step``."""

    apply_fn: Callable  # teacher forward: (variables, image) -> logits pytree
    params: Any  # frozen teacher params
    alpha: float = 0.5
    temperature: float = 2.0
    # "sigmoid" (per-channel binary soft targets) | "mse" (logit matching)
    mode: str = "sigmoid"


def _main_output(out):
    """Strip deep-supervision heads; keep the full-resolution prediction(s)."""
    if isinstance(out, dict):
        main = {k: v for k, v in out.items() if not k.startswith("ds_")}
        if set(main) == {"out"}:
            return main["out"]
        return main
    return out


def soft_target_loss(
    student_logits, teacher_logits, temperature: float = 2.0, mode: str = "sigmoid"
):
    """Distillation loss between matching logit pytrees (dicts or tensors).

    Sigmoid mode scales by T^2 so the gradient magnitude is independent of the
    temperature (Hinton et al. §2). Teacher side is stop-gradiented here so
    callers can pass live traces.
    """
    s = _main_output(student_logits)
    t = _main_output(teacher_logits)
    s_leaves = s if isinstance(s, dict) else {"out": s}
    t_leaves = t if isinstance(t, dict) else {"out": t}
    keys = sorted(set(s_leaves) & set(t_leaves))
    if not keys:
        raise ValueError(
            f"no matching heads between student {sorted(s_leaves)} and "
            f"teacher {sorted(t_leaves)}"
        )
    total = 0.0
    for k in keys:
        sl = s_leaves[k].astype(jnp.float32)
        tl = jax.lax.stop_gradient(t_leaves[k].astype(jnp.float32))
        if mode == "mse":
            total = total + jnp.mean((sl - tl) ** 2)
            continue
        T = temperature
        soft = jax.nn.sigmoid(tl / T)
        z = sl / T
        # numerically-stable BCE-with-logits against soft targets
        bce = jnp.maximum(z, 0) - z * soft + jnp.log1p(jnp.exp(-jnp.abs(z)))
        total = total + (T * T) * jnp.mean(bce)
    return total / len(keys)


def load_teacher_params(path: str | Path) -> Any:
    """Load frozen teacher params from a flax msgpack file or an Orbax
    checkpoint directory (both produced by this framework)."""
    p = Path(path)
    if p.is_dir():
        import orbax.checkpoint as ocp

        if (p / "state").exists():
            p = p / "state"
        restored = ocp.StandardCheckpointer().restore(p.resolve())
        params = restored.get("params", restored)
        return params.get("model", params)
    from flax import serialization

    return serialization.msgpack_restore(p.read_bytes())


def build_distill_spec(distill_cfg, model_cfg) -> Optional[DistillSpec]:
    """Construct the runtime spec from ``optimization.distill``.

    The teacher architecture defaults to the student's ``ModelConfig`` with
    the ``teacher_model`` dict merged on top (e.g. ``{"mednext":
    {"patchify_stem": false}}`` to distill stock -> patchify). Returns None
    when no teacher checkpoint is configured.
    """
    if distill_cfg is None or not getattr(distill_cfg, "teacher_checkpoint", None):
        return None
    from ..config.schema import ModelConfig, build_dataclass, to_dict
    from ..models import build_model

    base = to_dict(model_cfg)
    overrides = dict(distill_cfg.teacher_model or {})

    def _merge(dst: Dict, src: Dict):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                _merge(dst[k], v)
            else:
                dst[k] = v

    _merge(base, overrides)
    teacher_cfg = build_dataclass(ModelConfig, base)
    teacher = build_model(teacher_cfg)
    params = load_teacher_params(distill_cfg.teacher_checkpoint)

    def teacher_apply(variables, x):
        return teacher.apply(variables, x, train=False)

    return DistillSpec(
        apply_fn=teacher_apply,
        params=params,
        alpha=float(distill_cfg.alpha),
        temperature=float(distill_cfg.temperature),
        mode=str(distill_cfg.mode),
    )
