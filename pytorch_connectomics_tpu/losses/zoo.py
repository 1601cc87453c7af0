"""Loss zoo — JAX reimplementation of the reference loss catalogue
(``connectomics/models/losses/losses.py:88-803`` and MONAI DiceLoss).

Every loss takes ``(pred, target, weight=None, mask=None)`` with NDHWC
tensors and returns a scalar. ``weight`` is a voxel-wise spatial weight map;
``mask`` restricts the loss to valid voxels. Losses operate on logits unless
noted.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _masked_mean(x, weight=None, mask=None):
    if weight is not None:
        x = x * weight
    if mask is not None:
        x = x * mask
        denom = jnp.maximum(mask.sum(), 1.0)
        return x.sum() / denom
    return x.mean()


def bce_with_logits(pred, target, weight=None, mask=None, pos_weight=None, **kw):
    """Weighted binary cross-entropy on logits
    (reference ``WeightedBCEWithLogitsLoss``)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(p)
    log_not_p = jax.nn.log_sigmoid(-p)
    if pos_weight is not None:
        loss = -(pos_weight * t * log_p + (1.0 - t) * log_not_p)
    else:
        loss = -(t * log_p + (1.0 - t) * log_not_p)
    return _masked_mean(loss, weight, mask)


def auto_pos_weight(target, mask=None, clip: float = 100.0):
    """neg/pos ratio, the reference's ``pos_weight: auto``
    (``orchestrator.py:129-198``)."""
    t = target > 0.5
    if mask is not None:
        valid = mask > 0
        pos = jnp.sum(t & valid)
        neg = jnp.sum((~t) & valid)
    else:
        pos = jnp.sum(t)
        neg = t.size - pos
    return jnp.clip(neg / jnp.maximum(pos, 1.0), 1.0, clip)


def bce_auto_pos(pred, target, weight=None, mask=None, **kw):
    pw = auto_pos_weight(target, mask)
    return bce_with_logits(pred, target, weight, mask, pos_weight=pw)


def per_channel_bce(pred, target, weight=None, mask=None, auto_pos_weight_flag=True, **kw):
    """Per-channel BCE with per-channel auto pos_weight
    (reference ``PerChannelBCE``)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    axes = tuple(range(p.ndim - 1))  # all but channel
    tpos = t > 0.5
    if mask is not None:
        valid = mask > 0
        pos = jnp.sum(tpos & (valid > 0), axis=axes)
        neg = jnp.sum((~tpos) & (valid > 0), axis=axes)
    else:
        pos = jnp.sum(tpos, axis=axes)
        neg = tpos.size / tpos.shape[-1] - pos
    pw = jnp.clip(neg / jnp.maximum(pos, 1.0), 1.0, 100.0) if auto_pos_weight_flag else jnp.ones_like(pos, jnp.float32)
    log_p = jax.nn.log_sigmoid(p)
    log_not_p = jax.nn.log_sigmoid(-p)
    loss = -(pw * t * log_p + (1.0 - t) * log_not_p)
    return _masked_mean(loss, weight, mask)


def dice_loss(pred, target, weight=None, mask=None, sigmoid=True, softmax=False,
              smooth_nr=1e-5, smooth_dr=1e-5, squared_pred=False, **kw):
    """Soft Dice (MONAI-compatible smoothing semantics)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if sigmoid:
        p = jax.nn.sigmoid(p)
    elif softmax:
        p = jax.nn.softmax(p, axis=-1)
    if mask is not None:
        p = p * mask
        t = t * mask
    axes = tuple(range(1, p.ndim - 1))  # spatial
    inter = jnp.sum(p * t, axis=axes)
    if squared_pred:
        denom = jnp.sum(p * p, axis=axes) + jnp.sum(t * t, axis=axes)
    else:
        denom = jnp.sum(p, axis=axes) + jnp.sum(t, axis=axes)
    dice = (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def mse_loss(pred, target, weight=None, mask=None, tanh=False, **kw):
    p = pred.astype(jnp.float32)
    if tanh:
        p = jnp.tanh(p)
    return _masked_mean((p - target.astype(jnp.float32)) ** 2, weight, mask)


def mae_loss(pred, target, weight=None, mask=None, tanh=False, **kw):
    p = pred.astype(jnp.float32)
    if tanh:
        p = jnp.tanh(p)
    return _masked_mean(jnp.abs(p - target.astype(jnp.float32)), weight, mask)


def smooth_l1_loss(pred, target, weight=None, mask=None, beta=1.0, tanh=False, **kw):
    p = pred.astype(jnp.float32)
    if tanh:
        p = jnp.tanh(p)
    d = jnp.abs(p - target.astype(jnp.float32))
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return _masked_mean(loss, weight, mask)


def cross_entropy_loss(pred, target, weight=None, mask=None, **kw):
    """Multi-class CE; target is integer class map (..., 1) or one-hot."""
    p = pred.astype(jnp.float32)
    logp = jax.nn.log_softmax(p, axis=-1)
    if target.shape[-1] == p.shape[-1]:
        nll = -(target.astype(jnp.float32) * logp).sum(axis=-1)
    else:
        idx = target[..., 0].astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]
    if weight is not None and weight.shape[-1] == 1:
        weight = weight[..., 0]
    if mask is not None and mask.shape[-1] == 1:
        mask = mask[..., 0]
    return _masked_mean(nll, weight, mask)


def focal_loss(pred, target, weight=None, mask=None, alpha=0.25, gamma=2.0, **kw):
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    pt = p * t + (1 - p) * (1 - t)
    at = alpha * t + (1 - alpha) * (1 - t)
    bce = -(t * jnp.log(jnp.clip(p, 1e-7)) + (1 - t) * jnp.log(jnp.clip(1 - p, 1e-7)))
    return _masked_mean(at * (1 - pt) ** gamma * bce, weight, mask)


def tversky_loss(pred, target, weight=None, mask=None, alpha=0.5, beta=0.5,
                 sigmoid=True, smooth=1e-5, **kw):
    p = pred.astype(jnp.float32)
    if sigmoid:
        p = jax.nn.sigmoid(p)
    t = target.astype(jnp.float32)
    if mask is not None:
        p, t = p * mask, t * mask
    axes = tuple(range(1, p.ndim - 1))
    tp = jnp.sum(p * t, axis=axes)
    fp = jnp.sum(p * (1 - t), axis=axes)
    fn = jnp.sum((1 - p) * t, axis=axes)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return jnp.mean(1.0 - tv)


def scnp_loss(pred, target, weight=None, mask=None, neighborhood_size=3,
              auto_pos_weight_flag=True, **kw):
    """Same-Class Neighbor Penalization (reference ``ScnpLoss``,
    ``losses.py:354-453``; Lipman et al., CVPR 2026). Each voxel's logit is
    replaced by its worst same-class neighbor in an ``N^3`` window — min
    logit over foreground neighbors for foreground voxels, max logit over
    background neighbors for background voxels — then scored with the same
    per-channel class-balanced BCE as :func:`per_channel_bce`. Max-pooling
    is differentiable, so the gradient routes to the worst neighbor,
    penalizing topological errors (holes, isolated false positives)."""
    ns = int(neighborhood_size)
    if ns < 1 or ns % 2 == 0:
        raise ValueError(f"neighborhood_size must be a positive odd int, got {ns}")
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    fg = (t > 0.5).astype(jnp.float32)
    bg = 1.0 - fg
    large = 9999.0
    win = (1, ns, ns, ns, 1) if p.ndim == 5 else (1, ns, ns, 1)
    ones = (1,) * p.ndim

    def _maxpool(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, win, ones, "SAME")

    t1 = -_maxpool(-(p * fg + large * bg))  # min logit over fg neighbors
    t2 = _maxpool(p * bg - large * fg)      # max logit over bg neighbors
    z_tilde = t1 * fg + t2 * bg
    return per_channel_bce(z_tilde, t, weight=weight, mask=mask,
                           auto_pos_weight_flag=auto_pos_weight_flag)


# -- soft skeletonization (SoftClDice; reference losses.py:47-86) -----------


def _soft_erode(img):
    # min-pool 3x3x3 via negated max-pool, NDHWC
    return -jax.lax.reduce_window(
        -img, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "SAME"
    )


def _soft_dilate(img):
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "SAME"
    )


def soft_skeletonize(img, num_iters: int = 5):
    img1 = _soft_dilate(_soft_erode(img))  # soft opening
    skel = jax.nn.relu(img - img1)
    for _ in range(num_iters):
        img = _soft_erode(img)
        img1 = _soft_dilate(_soft_erode(img))
        delta = jax.nn.relu(img - img1)
        skel = skel + jax.nn.relu(delta - skel * delta)
    return skel


def soft_cldice_loss(pred, target, weight=None, mask=None, num_iters=5,
                     sigmoid=True, smooth=1.0, **kw):
    """Differentiable centerline-Dice via soft skeletonization pooling ops."""
    p = pred.astype(jnp.float32)
    if sigmoid:
        p = jax.nn.sigmoid(p)
    t = target.astype(jnp.float32)
    sp = soft_skeletonize(p, num_iters)
    st = soft_skeletonize(t, num_iters)
    tprec = (jnp.sum(sp * t) + smooth) / (jnp.sum(sp) + smooth)
    tsens = (jnp.sum(st * p) + smooth) / (jnp.sum(st) + smooth)
    return 1.0 - 2.0 * tprec * tsens / (tprec + tsens)


# -- regularizers (reference models/losses/regularization.py) ---------------


def binary_reg(pred, target=None, weight=None, mask=None, **kw):
    """Push sigmoid outputs away from 0.5 (BinaryReg, regularization.py:21)."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    dist = jnp.abs(p - 0.5)
    return jnp.mean(1.0 / (dist + 1e-2))


def foreground_dt_consistency(pred, target, weight=None, mask=None, **kw):
    """Consistency between predicted FG prob and distance-transform target."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    return _masked_mean(jnp.abs(p - (t > 0).astype(jnp.float32)), weight, mask)


def contour_consistency(pred, pred2, weight=None, mask=None, **kw):
    """Mask/contour agreement: contour should sit at mask gradient."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    c = jax.nn.sigmoid(pred2.astype(jnp.float32))
    gz = jnp.abs(jnp.diff(p, axis=1, prepend=p[:, :1]))
    gy = jnp.abs(jnp.diff(p, axis=2, prepend=p[:, :, :1]))
    gx = jnp.abs(jnp.diff(p, axis=3, prepend=p[:, :, :, :1]))
    grad = jnp.clip(gz + gy + gx, 0.0, 1.0)
    return _masked_mean((grad - c) ** 2, weight, mask)


def nonoverlap_reg(pred, target=None, weight=None, mask=None, **kw):
    """Penalize overlapping sigmoid channels (NonOverlapReg)."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    prod = jnp.prod(p, axis=-1)
    return jnp.mean(prod)


def gan_loss(pred, target, weight=None, mask=None, mode="lsgan", **kw):
    """LSGAN / vanilla discriminator loss on logits; target is 0/1."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if mode == "lsgan":
        return jnp.mean((p - t) ** 2)
    return bce_with_logits(p, t)


def _malis_entry(pred, target, weight=None, mask=None, **kw):
    from .malis import malis_loss

    return malis_loss(pred, target, weight, mask, **kw)


LOSS_REGISTRY: Dict[str, Callable] = {
    "MalisLoss": _malis_entry,
    "WeightedBCEWithLogitsLoss": bce_with_logits,
    "BCEWithLogitsLoss": bce_with_logits,
    "PerChannelBCEWithLogitsLoss": per_channel_bce,
    "PerChannelBCE": per_channel_bce,
    "DiceLoss": dice_loss,
    "GeneralizedDiceLoss": dice_loss,
    "WeightedMSELoss": mse_loss,
    "MSELoss": mse_loss,
    "WeightedMAELoss": mae_loss,
    "MAELoss": mae_loss,
    "L1Loss": mae_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "CrossEntropyLoss": cross_entropy_loss,
    "FocalLoss": focal_loss,
    "TverskyLoss": tversky_loss,
    "SoftClDiceLoss": soft_cldice_loss,
    "ScnpLoss": scnp_loss,
    "BinaryReg": binary_reg,
    "ForegroundDTConsistency": foreground_dt_consistency,
    "ContourDTConsistency": contour_consistency,
    "NonOverlapReg": nonoverlap_reg,
    "GANLoss": gan_loss,
}


def get_loss(name: str) -> Callable:
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss '{name}'; available: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]
