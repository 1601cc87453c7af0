"""Binary/semantic segmentation metrics (jit-safe jnp).

Reference: torchmetrics usage in ``training/lightning/model.py:916-987``
(jaccard/dice/accuracy) — here as pure functions over logits or probs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _binarize(pred, target, threshold=0.5, from_logits=True):
    p = pred.astype(jnp.float32)
    if from_logits:
        p = 1.0 / (1.0 + jnp.exp(-p))
    return (p > threshold).astype(jnp.float32), (target > 0.5).astype(jnp.float32)


def jaccard_index(pred, target, threshold=0.5, from_logits=True, eps=1e-7):
    p, t = _binarize(pred, target, threshold, from_logits)
    inter = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - inter
    return (inter + eps) / (union + eps)


def dice_coefficient(pred, target, threshold=0.5, from_logits=True, eps=1e-7):
    p, t = _binarize(pred, target, threshold, from_logits)
    inter = jnp.sum(p * t)
    return (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(t) + eps)


def binary_accuracy(pred, target, threshold=0.5, from_logits=True):
    p, t = _binarize(pred, target, threshold, from_logits)
    return jnp.mean((p == t).astype(jnp.float32))


def precision_recall(pred, target, threshold=0.5, from_logits=True, eps=1e-7):
    p, t = _binarize(pred, target, threshold, from_logits)
    tp = jnp.sum(p * t)
    return tp / (jnp.sum(p) + eps), tp / (jnp.sum(t) + eps)
