"""Optimizer + LR schedule builders on optax.

Reference: ``connectomics/training/optimization/build.py:186-266`` and the
Detectron2-style warmup schedulers (``optimization/lr_scheduler.py:16``).
Schedules are pure ``step -> lr`` functions (jit-safe inside optax);
ReduceLROnPlateau is realized as a host-controlled ``lr_scale`` multiplier
(see ``loop.py``) since it depends on validation metrics.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import optax

from ..config.schema import OptimizationConfig, OptimizerConfig, SchedulerConfig


def build_schedule(
    opt_cfg: OptimizationConfig, steps_per_epoch: int
) -> Callable[[int], float]:
    s = opt_cfg.scheduler
    base_lr = float(opt_cfg.optimizer.lr)
    name = (s.name or "").lower()
    total_epochs = opt_cfg.max_epochs
    total_steps = opt_cfg.max_steps or max(1, total_epochs * steps_per_epoch)
    params = s.params or {}
    # scheduler.interval (reference Lightning contract): "epoch" (default)
    # interprets warmup_epochs/t_max/t_0/step_size/milestones in epochs;
    # "step" interprets them as raw optimizer steps
    unit = 1 if s.interval == "step" else steps_per_epoch

    warmup_steps = s.warmup_steps
    if warmup_steps is None:
        warmup_steps = int(params.get("warmup_epochs", s.warmup_epochs) * unit)

    if name in ("", "none", "constant"):
        return optax.constant_schedule(base_lr)
    if name == "warmupcosinelr":
        min_lr = float(params.get("min_lr", s.min_lr))
        start = float(params.get("warmup_start_lr", s.warmup_start_lr))
        # short runs (smoke tests, step-override CLI runs) can configure a
        # warmup longer than the run; clamp so decay_steps stays positive
        warm = min(max(1, warmup_steps), max(1, total_steps - 1))
        return optax.warmup_cosine_decay_schedule(
            init_value=start,
            peak_value=base_lr,
            warmup_steps=warm,
            decay_steps=total_steps,
            end_value=min_lr,
        )
    if name == "cosineannealinglr":
        t_max = int(params.get("t_max", s.t_max or total_epochs)) * unit
        return optax.cosine_decay_schedule(base_lr, max(1, t_max), alpha=s.min_lr / base_lr if base_lr else 0.0)
    if name == "cosineannealingwarmrestarts":
        t0 = int(params.get("t_0", s.t_0 or 10)) * unit
        schedules = []
        boundaries = []
        t = t0
        acc = 0
        while acc < total_steps:
            schedules.append(optax.cosine_decay_schedule(base_lr, max(1, t)))
            acc += t
            boundaries.append(acc)
            t *= max(1, s.t_mult)
        return optax.join_schedules(schedules, boundaries[:-1])
    if name == "steplr":
        step_size = int(params.get("step_size", s.step_size)) * unit
        return lambda count: base_lr * (s.gamma ** (count // max(1, step_size)))
    if name == "multisteplr":
        milestones = [int(m) * unit for m in (s.milestones or params.get("milestones", []))]

        def multi(count):
            k = sum(jnp.asarray(count) >= m for m in milestones)
            return base_lr * (s.gamma**k)

        return multi
    if name == "warmupmultisteplr":
        milestones = [int(m) * unit for m in (s.milestones or params.get("milestones", []))]
        start = float(params.get("warmup_start_lr", s.warmup_start_lr))

        def wmulti(count):
            count = jnp.asarray(count)
            frac = jnp.clip(count / max(1, warmup_steps), 0.0, 1.0)
            warm = start + (base_lr - start) * frac
            k = sum(count >= m for m in milestones)
            return jnp.where(count < warmup_steps, warm, base_lr * (s.gamma**k))

        return wmulti
    if name == "reducelronplateau":
        # plateau handled by host-side lr_scale; base schedule constant
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown scheduler '{s.name}'")


def build_optimizer(
    opt_cfg: OptimizationConfig, steps_per_epoch: int
) -> Tuple[optax.GradientTransformation, Callable[[int], float]]:
    o = opt_cfg.optimizer
    schedule = build_schedule(opt_cfg, steps_per_epoch)
    name = o.name.lower()

    weight_decay = float(o.weight_decay)

    def decay_mask(params):
        """No decay for bias / norm scale params (reference bias param-group
        handling, ``optimization/build.py:108-140``)."""
        import jax

        def is_decay(path, x):
            names = [getattr(k, "key", str(k)) for k in path]
            leaf = names[-1] if names else ""
            return not (leaf in ("bias", "scale") or x.ndim <= 1)

        return jax.tree_util.tree_map_with_path(is_decay, params)

    if name == "adamw":
        tx = optax.adamw(
            schedule, b1=o.betas[0], b2=o.betas[1], eps=o.eps,
            weight_decay=weight_decay, mask=decay_mask if o.no_decay_bias else None,
        )
    elif name == "adam":
        tx = optax.adam(schedule, b1=o.betas[0], b2=o.betas[1], eps=o.eps)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=o.momentum, nesterov=False)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "lamb":
        tx = optax.lamb(schedule, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer '{o.name}'")

    chain = []
    if opt_cfg.gradient_clip_val:
        chain.append(optax.clip_by_global_norm(float(opt_cfg.gradient_clip_val)))
    chain.append(tx)
    if opt_cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(optax.chain(*chain), opt_cfg.accumulate_grad_batches)
    else:
        tx = optax.chain(*chain)
    return tx, schedule
