"""Intensity normalization & preprocessing (host-side, numpy).

Reference: ``SmartNormalizeIntensityd`` (``data/augmentation/transforms.py:1067``)
and the nnU-Net preprocessing subset (``data/processing/nnunet_preprocess.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def smart_normalize(vol: np.ndarray) -> np.ndarray:
    """uint8/uint16 -> [0,1] by dtype range; float -> min-max if outside [0,1]."""
    if vol.dtype == np.uint8:
        return vol.astype(np.float32) / 255.0
    if vol.dtype == np.uint16:
        return vol.astype(np.float32) / 65535.0
    v = vol.astype(np.float32)
    vmin, vmax = float(v.min()), float(v.max())
    if vmin >= 0.0 and vmax <= 1.0:
        return v
    if vmax > vmin:
        return (v - vmin) / (vmax - vmin)
    return np.zeros_like(v)


def zscore_normalize(vol: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    v = vol.astype(np.float32)
    return (v - v.mean()) / (v.std() + eps)


def percentile_normalize(
    vol: np.ndarray, lower: float = 0.5, upper: float = 99.5
) -> np.ndarray:
    v = vol.astype(np.float32)
    lo, hi = np.percentile(v, [lower, upper])
    v = np.clip(v, lo, hi)
    return (v - lo) / max(1e-8, hi - lo)


def normalize_volume(vol: np.ndarray, method: str = "smart", clip_percentiles=None) -> np.ndarray:
    if clip_percentiles:
        vol = percentile_normalize(vol, *clip_percentiles)
        method = "none" if method in ("smart", "percentile") else method
    if method in ("smart", None, ""):
        return smart_normalize(vol)
    if method == "zscore":
        return zscore_normalize(vol)
    if method == "percentile":
        return percentile_normalize(vol)
    if method == "scale":
        return vol.astype(np.float32) / 255.0
    if method == "none":
        return vol.astype(np.float32)
    raise ValueError(f"unknown normalization '{method}'")


def downscale_volume(vol: np.ndarray, factors: Sequence[int]) -> np.ndarray:
    """Integer-stride downscale (reference ``read_downscale`` guard,
    ``data_factory.py:84``)."""
    sl = tuple(slice(None, None, int(f)) for f in factors)
    return vol[sl]


def resize_volume(vol: np.ndarray, target: Sequence[int], order: int = 1) -> np.ndarray:
    """Resize the trailing spatial axes to exactly ``target`` — linear
    (order=1) for images, nearest (order=0) for labels/masks (reference
    ``ResizeByFactord`` / ``data.data_transform.resize``,
    ``augmentation/build.py:246-267``). ``ndimage.zoom`` can land one voxel
    off the requested size; the result is center-aligned to the exact target."""
    from scipy import ndimage

    target = tuple(int(t) for t in target)
    lead = vol.ndim - len(target)
    if lead < 0:
        raise ValueError(f"resize target {target} has more axes than volume {vol.shape}")
    spatial = vol.shape[lead:]
    if tuple(spatial) == target:
        return vol
    zoom = [1.0] * lead + [t / s for t, s in zip(target, spatial)]
    out = ndimage.zoom(
        vol.astype(np.float32) if order else vol, zoom, order=order,
        mode="nearest", grid_mode=True,
    )
    full_target = vol.shape[:lead] + target
    if out.shape != full_target:
        out = center_align(out, full_target)
    return out


def center_align(vol: np.ndarray, target_shape: Sequence[int], pad_value=0) -> np.ndarray:
    """Center crop/pad to ``target_shape`` (reference ``align_to_image``:
    minor shape mismatches between mask/label and image/prediction are
    reconciled symmetrically)."""
    target_shape = tuple(int(t) for t in target_shape)
    if len(target_shape) != vol.ndim:
        raise ValueError(f"center_align target {target_shape} vs volume {vol.shape}")
    slices, pads = [], []
    for s, t in zip(vol.shape, target_shape):
        if s >= t:
            lo = (s - t) // 2
            slices.append(slice(lo, lo + t))
            pads.append((0, 0))
        else:
            slices.append(slice(None))
            need = t - s
            pads.append((need // 2, need - need // 2))
    out = vol[tuple(slices)]
    if any(p != (0, 0) for p in pads):
        out = np.pad(out, pads, mode="constant", constant_values=pad_value)
    return out


def apply_data_transform(
    vol: np.ndarray, dt_cfg, is_label: bool, allow_binarize: bool = True
) -> np.ndarray:
    """Paired data transform (reference ``DataTransformConfig``,
    ``config/schema/data.py:90``): resize to a target size (images linear,
    labels/masks nearest), optional label binarization (``value >
    threshold``), optional extra border padding. Applied identically to
    image/label/mask/label_aux volumes so they stay spatially aligned."""
    if dt_cfg is None:
        return vol
    if getattr(dt_cfg, "resize", None):
        vol = resize_volume(vol, dt_cfg.resize, order=0 if is_label else 1)
    if is_label and allow_binarize and getattr(dt_cfg, "binarize", False):
        vol = (vol > float(getattr(dt_cfg, "threshold", 0.0))).astype(np.float32)
    pad = list(getattr(dt_cfg, "pad_size", None) or ())
    if any(pad):
        lead = vol.ndim - len(pad)
        pads = [(0, 0)] * lead + [(int(p), int(p)) for p in pad]
        mode = {"reflect": "reflect", "replicate": "edge", "edge": "edge",
                "constant": "constant"}[getattr(dt_cfg, "pad_mode", "reflect")]
        vol = np.pad(vol, pads, mode="constant" if is_label else mode)
    return vol


def pad_to_min_shape(
    vol: np.ndarray, min_shape: Sequence[int], mode: str = "reflect"
) -> Tuple[np.ndarray, Tuple[Tuple[int, int], ...]]:
    """Grow-to-ROI pad so crops of ``min_shape`` always fit
    (reference ``window.py:583-601``)."""
    pads = []
    spatial_offset = vol.ndim - len(min_shape)
    for i in range(vol.ndim):
        if i < spatial_offset:
            pads.append((0, 0))
            continue
        need = max(0, min_shape[i - spatial_offset] - vol.shape[i])
        pads.append((need // 2, need - need // 2))
    if any(p != (0, 0) for p in pads):
        np_mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant"}[mode]
        vol = np.pad(vol, pads, mode=np_mode)
    return vol, tuple(pads)
