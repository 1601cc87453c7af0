"""nnU-Net-style preprocessing: foreground crop, spacing-aware resampling
(separate-z for anisotropic EM), zscore/percentile normalization, and the
inverse restore for saving predictions.

Reference: ``connectomics/data/processing/nnunet_preprocess.py`` (689 LoC).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

from .bbox import crop_to_foreground
from .preprocess import percentile_normalize, zscore_normalize


@dataclass
class PreprocessRecord:
    """Everything needed to undo preprocessing at save time."""

    original_shape: Tuple[int, ...] = ()
    crop_slices: Optional[Tuple] = None
    source_spacing: Optional[Tuple[float, ...]] = None
    target_spacing: Optional[Tuple[float, ...]] = None


def resample_volume(
    vol: np.ndarray,
    source_spacing: Sequence[float],
    target_spacing: Sequence[float],
    is_label: bool = False,
    separate_z_threshold: float = 3.0,
) -> np.ndarray:
    """Spacing-aware resample. When z-spacing is >= ``separate_z_threshold``
    times the in-plane spacing (EM anisotropy), resample XY per-slice and
    use nearest neighbor along z (nnU-Net separate-z rule)."""
    src = np.asarray(source_spacing, float)
    tgt = np.asarray(target_spacing, float)
    if np.allclose(src, tgt):
        return vol
    zoom = src / tgt
    order = 0 if is_label else 1
    aniso = src[0] / max(src[1], src[2])
    if aniso >= separate_z_threshold:
        # in-plane resample per slice
        new_yx = tuple(int(round(s * z)) for s, z in zip(vol.shape[1:], zoom[1:]))
        planes = [
            ndimage.zoom(vol[z], (new_yx[0] / vol.shape[1], new_yx[1] / vol.shape[2]), order=order)
            for z in range(vol.shape[0])
        ]
        stacked = np.stack(planes)
        # nearest along z
        new_z = int(round(vol.shape[0] * zoom[0]))
        idx = np.clip(np.round(np.linspace(0, vol.shape[0] - 1, new_z)).astype(int), 0, vol.shape[0] - 1)
        return stacked[idx]
    return ndimage.zoom(vol, tuple(zoom), order=order)


def nnunet_preprocess(
    image: np.ndarray,
    label: Optional[np.ndarray] = None,
    source_spacing: Optional[Sequence[float]] = None,
    target_spacing: Optional[Sequence[float]] = None,
    normalization: str = "zscore",
    crop_foreground: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray], PreprocessRecord]:
    rec = PreprocessRecord(original_shape=tuple(image.shape))
    img = image.astype(np.float32)
    lbl = label
    if crop_foreground:
        nz = img > img.min()
        img, sl = crop_to_foreground(img, nz)
        rec.crop_slices = sl
        if lbl is not None:
            lbl = lbl[sl]
    if source_spacing and target_spacing:
        rec.source_spacing = tuple(float(s) for s in source_spacing)
        rec.target_spacing = tuple(float(s) for s in target_spacing)
        img = resample_volume(img, source_spacing, target_spacing, is_label=False)
        if lbl is not None:
            lbl = resample_volume(lbl, source_spacing, target_spacing, is_label=True)
    if normalization == "zscore":
        img = zscore_normalize(img)
    elif normalization == "percentile":
        img = percentile_normalize(img)
    return img, lbl, rec


def nnunet_restore(pred: np.ndarray, rec: PreprocessRecord, is_label: bool = True) -> np.ndarray:
    """Invert resample + crop so predictions align with the source volume."""
    out = pred
    if rec.source_spacing and rec.target_spacing:
        out = resample_volume(out, rec.target_spacing, rec.source_spacing, is_label=is_label)
    if rec.crop_slices is not None and rec.original_shape:
        full = np.zeros(rec.original_shape, out.dtype)
        # resampling can be off by a voxel; clip into the crop region
        region = tuple(
            slice(s.start, min(s.stop, s.start + o))
            for s, o in zip(rec.crop_slices, out.shape)
        )
        crop = tuple(slice(0, r.stop - r.start) for r in region)
        full[region] = out[crop]
        return full
    return out
