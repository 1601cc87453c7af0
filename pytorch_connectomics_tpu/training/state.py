"""Train state pytree and the jitted train/val step factories.

The whole step — forward, loss orchestration, backward, optimizer update,
EMA — is one XLA program. Under a multi-device mesh the batch is sharded on
the ``data`` axis and XLA inserts the gradient all-reduce over ICI (the
DDP-equivalent; reference ``trainer.py:231-256``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.orchestrator import LossOrchestrator
from ..metrics.binary import binary_accuracy, dice_coefficient, jaccard_index


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    lr_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.ones(()))
    balancer: Optional[jnp.ndarray] = None


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    ema: bool = False,
    num_balancer_terms: int = 0,
    gradnorm_terms: int = 0,
) -> TrainState:
    wrapped = {"model": params}
    if num_balancer_terms:
        wrapped["balancer"] = jnp.zeros((num_balancer_terms,), jnp.float32)
    # GradNorm state (non-trainable): row 0 = task weights, row 1 = L_i(0)
    balancer = (
        jnp.stack([jnp.ones(gradnorm_terms), jnp.zeros(gradnorm_terms)])
        if gradnorm_terms
        else None
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=wrapped,
        opt_state=tx.init(wrapped),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        lr_scale=jnp.ones(()),
        balancer=balancer,
    )


def make_train_step(
    apply_fn: Callable,
    orchestrator: LossOrchestrator,
    tx: optax.GradientTransformation,
    ema_decay: Optional[float] = None,
    augment_fn: Optional[Callable] = None,
    seed: int = 0,
    balancing: Optional[str] = None,
    balancing_alpha: float = 1.5,
    balancing_lr: float = 0.025,
    distill: Optional[Any] = None,
) -> Callable:
    """Returns ``train_step(state, batch) -> (state, logs)`` (pure, jittable).

    ``batch``: {"image": NDHWC, "label": NDHWC, optional "mask"/"weight"}.
    ``augment_fn(batch, key)``: on-device augmentation fused into the step
    (``ops/augment_jax.py``); keyed deterministically by the step counter.
    ``balancing="gradnorm"``: per-term weights live in ``state.balancer``
    (row 0 = weights, row 1 = initial losses) and update every step from
    loss-ratio training rates (reference ``losses/balancing.py:90``).
    ``balancing="gradnorm_exact"``: same state, but the update uses MEASURED
    per-term gradient norms at the trunk/head boundary (one loss-only
    backward per term — see ``losses/balancing.py``).
    ``distill``: a ``training.distill.DistillSpec`` — runs the frozen teacher
    forward inside the same XLA program and mixes its soft-target loss in.
    """
    gradnorm = balancing in ("gradnorm", "gradnorm_exact")
    gradnorm_exact = balancing == "gradnorm_exact"

    def loss_fn(params, batch, term_weights, step):
        # dropout rng keyed by the step counter: deterministic, resumable,
        # and distinct from the augmentation stream (fold_in(seed+1, step))
        drop_key = jax.random.fold_in(jax.random.PRNGKey(seed + 1), step)
        out = apply_fn(
            {"params": params["model"]}, batch["image"], train=True,
            rngs={"dropout": drop_key},
        )
        total, logs = orchestrator(
            out,
            batch.get("label"),
            mask=batch.get("mask"),
            weight=batch.get("weight"),
            balancer_params=params.get("balancer"),
            term_weights=term_weights,
        )
        if distill is not None:
            from .distill import soft_target_loss

            teacher_out = distill.apply_fn(
                {"params": distill.params}, batch["image"]
            )
            d_loss = soft_target_loss(
                out, teacher_out, temperature=distill.temperature,
                mode=distill.mode,
            )
            logs["loss_hard"] = total
            logs["loss_distill"] = d_loss
            total = (1.0 - distill.alpha) * total + distill.alpha * d_loss
            logs["loss_total"] = total
        if gradnorm_exact:
            # surface the model outputs (aux, non-differentiated) so the
            # step can measure per-term gradient norms without a re-forward
            logs["_out"] = jax.lax.stop_gradient(out)
        return total, logs

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if augment_fn is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            batch = augment_fn(batch, key)
        term_w = state.balancer[0] if (gradnorm and state.balancer is not None) else None
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, term_w, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # host-controlled plateau factor multiplies the whole update
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema,
                params["model"],
            )
        balancer = state.balancer
        model_out = logs.pop("_out", None)
        if gradnorm and balancer is not None:
            from ..losses.balancing import gradnorm_exact_weights, gradnorm_weights

            term_losses = [logs[f"loss_{t.name}"] for t in orchestrator.terms]
            current = jnp.stack(term_losses)
            initial = jnp.where(state.step == 0, current, balancer[1])
            if gradnorm_exact and model_out is not None:
                # per-term gradient norms at the trunk/head boundary:
                # d loss_i / d model_output — a loss-only backward per term
                # (elementwise; no conv backward), reference semantics of
                # balancing.py:140 (autograd.grad per loss on shared params)
                def _term_loss_of_out(o, i):
                    _, lg = orchestrator(
                        o, batch.get("label"), mask=batch.get("mask"),
                        weight=batch.get("weight"),
                    )
                    return lg[f"loss_{orchestrator.terms[i].name}"]

                g_norms = jnp.stack([
                    optax.global_norm(
                        jax.grad(_term_loss_of_out)(model_out, i)
                    )
                    for i in range(len(orchestrator.terms))
                ])
                new_w = gradnorm_exact_weights(
                    g_norms, term_losses, initial, balancer[0],
                    alpha=balancing_alpha, lr=balancing_lr,
                )
                for i, t in enumerate(orchestrator.terms):
                    logs[f"gradnorm_g_{t.name}"] = g_norms[i]
            else:
                new_w = gradnorm_weights(
                    term_losses, initial, balancer[0],
                    alpha=balancing_alpha, lr=balancing_lr,
                )
            balancer = jnp.stack([new_w, initial])
            for i, t in enumerate(orchestrator.terms):
                logs[f"gradnorm_w_{t.name}"] = new_w[i]
        logs["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema_params=ema,
                balancer=balancer,
            ),
            logs,
        )

    return train_step


def make_val_step(
    apply_fn: Callable,
    orchestrator: LossOrchestrator,
    use_ema: bool = False,
) -> Callable:
    """Returns ``val_step(state, batch) -> logs`` with loss + binary metrics
    (reference val metric set, ``model.py:916-987``)."""

    def val_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params["model"]
        out = apply_fn({"params": params}, batch["image"], train=False)
        total, logs = orchestrator(
            out, batch.get("label"), mask=batch.get("mask"), weight=batch.get("weight")
        )
        main = out["out"] if isinstance(out, dict) and "out" in out else out
        if not isinstance(main, dict) and "label" in batch:
            t = batch["label"]
            c = min(main.shape[-1], t.shape[-1])
            logs["val_jaccard"] = jaccard_index(main[..., :c], t[..., :c])
            logs["val_dice"] = dice_coefficient(main[..., :c], t[..., :c])
            logs["val_accuracy"] = binary_accuracy(main[..., :c], t[..., :c])
        logs["val_loss"] = total
        return logs

    return val_step
