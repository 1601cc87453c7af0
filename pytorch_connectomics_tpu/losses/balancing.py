"""Multi-task loss balancing: Kendall uncertainty (in the orchestrator) and
GradNorm (Chen et al. 2018) in two variants.

Reference: ``connectomics/training/losses/balancing.py:64,90``.

- ``gradnorm`` (cheap default): loss-ratio approximation — inverse training
  rates from L_i/L_i(0) only, no gradient measurement.
- ``gradnorm_exact``: uses MEASURED per-term gradient norms taken at the
  shared-trunk/head boundary (d loss_i / d model_output via one loss-only
  backward per term inside the jitted step — no extra model backward). This
  matches the reference's real-gradient semantics: a term whose loss is
  small but whose gradients dominate is down-weighted correctly.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def uncertainty_weighted_total(losses: Sequence[jnp.ndarray], log_vars: jnp.ndarray) -> jnp.ndarray:
    """Kendall: sum exp(-s_i) L_i + s_i/2 (log_vars are trainable)."""
    return sum(
        jnp.exp(-log_vars[i]) * L + 0.5 * log_vars[i] for i, L in enumerate(losses)
    )


def gradnorm_exact_weights(
    grad_norms: jnp.ndarray,
    losses: Sequence[jnp.ndarray],
    initial_losses: jnp.ndarray,
    weights: jnp.ndarray,
    alpha: float = 1.5,
    lr: float = 0.025,
) -> jnp.ndarray:
    """GradNorm update from MEASURED per-term gradient norms (Chen et al.
    2018 eq. 1-2; reference ``losses/balancing.py:90-150`` measures real
    grads with autograd — here the caller supplies ``grad_norms`` taken at
    the shared-trunk/head boundary via one cheap loss-only backward per
    term).

    Weighted norms ``Gw_i = w_i * G_i`` are driven toward
    ``mean(Gw) * r_i^alpha`` where ``r_i`` is the inverse training rate
    ``(L_i / L_i(0)) / mean(.)``; the closed-form per-step solution is
    ``w*_i = target_i / G_i``, and weights EMA toward it."""
    L = jnp.stack([jnp.asarray(x) for x in losses])
    G = jnp.maximum(jnp.asarray(grad_norms), 1e-12)
    ratios = L / jnp.maximum(initial_losses, 1e-8)
    inv_rate = ratios / jnp.maximum(ratios.mean(), 1e-8)
    target = (weights * G).mean() * inv_rate**alpha
    desired = target / G
    new_w = weights * (1.0 - lr) + lr * desired
    new_w = new_w * (len(losses) / jnp.maximum(new_w.sum(), 1e-8))
    return jax.lax.stop_gradient(new_w)


def gradnorm_weights(
    losses: Sequence[jnp.ndarray],
    initial_losses: jnp.ndarray,
    weights: jnp.ndarray,
    alpha: float = 1.5,
    lr: float = 0.025,
) -> jnp.ndarray:
    """One GradNorm weight update from current/initial per-term losses.

    Uses loss-ratio inverse training rates r_i = (L_i/L_i(0)) / mean(...),
    target G_i ∝ mean(G) * r_i^alpha; weights move toward targets and are
    renormalized to sum to the task count."""
    L = jnp.stack([jnp.asarray(x) for x in losses])
    ratios = L / jnp.maximum(initial_losses, 1e-8)
    inv_rate = ratios / jnp.maximum(ratios.mean(), 1e-8)
    target = inv_rate**alpha
    new_w = weights * (1.0 - lr) + lr * target
    new_w = new_w * (len(losses) / jnp.maximum(new_w.sum(), 1e-8))
    return jax.lax.stop_gradient(new_w)
