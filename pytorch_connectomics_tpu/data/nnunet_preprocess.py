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
    anisotropy_threshold: float = 3.0
    force_separate_z: Optional[bool] = None


def resolve_separate_z(
    source_spacing: Sequence[float],
    target_spacing: Sequence[float],
    anisotropy_threshold: float = 3.0,
    force_separate_z: Optional[bool] = None,
) -> Tuple[bool, Optional[int]]:
    """nnU-Net separate-z rule (reference ``_resolve_separate_z``,
    nnunet_preprocess.py:456): split the resample when EITHER spacing is
    more anisotropic than the threshold; the low-res axis is the largest
    source spacing (not assumed to be z)."""
    if force_separate_z is not None:
        if not force_separate_z:
            return False, None
        return True, int(np.argmax(np.asarray(source_spacing)))
    for spacing in (source_spacing, target_spacing):
        s = np.asarray(spacing, np.float64)
        if float(s.max() / max(s.min(), 1e-8)) > anisotropy_threshold:
            return True, int(np.argmax(np.asarray(source_spacing)))
    return False, None


def resample_volume(
    vol: np.ndarray,
    source_spacing: Sequence[float],
    target_spacing: Sequence[float],
    is_label: bool = False,
    separate_z_threshold: float = 3.0,
    force_separate_z: Optional[bool] = None,
) -> np.ndarray:
    """Spacing-aware resample. In separate-z mode the in-plane axes are
    resampled per low-res slice at full order and the low-res axis uses
    nearest-neighbor (order 0), matching nnU-Net for anisotropic EM."""
    src = np.asarray(source_spacing, float)
    tgt = np.asarray(target_spacing, float)
    if np.allclose(src, tgt):
        return vol
    zoom = src / tgt
    order = 0 if is_label else 1
    separate, axis = resolve_separate_z(
        src, tgt, separate_z_threshold, force_separate_z
    )
    if separate and axis is not None:
        v = np.moveaxis(vol, axis, 0)
        zm = [zoom[axis]] + [zoom[d] for d in range(3) if d != axis]
        plane_zoom = tuple(zm[1:])
        new_plane = tuple(
            int(round(s * z)) for s, z in zip(v.shape[1:], plane_zoom)
        )
        planes = [
            ndimage.zoom(
                v[k],
                (new_plane[0] / v.shape[1], new_plane[1] / v.shape[2]),
                order=order,
            )
            for k in range(v.shape[0])
        ]
        stacked = np.stack(planes)
        new_low = int(round(v.shape[0] * zm[0]))
        idx = np.clip(
            np.round(np.linspace(0, v.shape[0] - 1, new_low)).astype(int),
            0, v.shape[0] - 1,
        )
        return np.moveaxis(stacked[idx], 0, axis)
    return ndimage.zoom(vol, tuple(zoom), order=order)


def nnunet_preprocess(
    image: np.ndarray,
    label: Optional[np.ndarray] = None,
    source_spacing: Optional[Sequence[float]] = None,
    target_spacing: Optional[Sequence[float]] = None,
    normalization: str = "zscore",
    crop_foreground: bool = True,
    anisotropy_threshold: float = 3.0,
    force_separate_z: Optional[bool] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray], PreprocessRecord]:
    rec = PreprocessRecord(
        original_shape=tuple(image.shape),
        anisotropy_threshold=anisotropy_threshold,
        force_separate_z=force_separate_z,
    )
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
        img = resample_volume(
            img, source_spacing, target_spacing, is_label=False,
            separate_z_threshold=anisotropy_threshold,
            force_separate_z=force_separate_z,
        )
        if lbl is not None:
            lbl = resample_volume(
                lbl, source_spacing, target_spacing, is_label=True,
                separate_z_threshold=anisotropy_threshold,
                force_separate_z=force_separate_z,
            )
    if normalization == "zscore":
        img = zscore_normalize(img)
    elif normalization == "percentile":
        img = percentile_normalize(img)
    return img, lbl, rec


def preprocess_fn_from_config(cfg_block, split_resolution=None):
    """Build a ``(img, lbl) -> (img, lbl, rec)`` hook from a
    ``NNUNetPreprocessingConfig`` block, or None when disabled
    (reference ``data_factory.py`` / ``build.py:161`` transform wiring)."""
    if cfg_block is None or not cfg_block.enabled:
        return None
    src = cfg_block.source_spacing or split_resolution

    def fn(img, lbl=None):
        return nnunet_preprocess(
            img,
            lbl,
            source_spacing=src,
            target_spacing=cfg_block.target_spacing,
            normalization=cfg_block.normalization,
            crop_foreground=cfg_block.crop_to_nonzero,
            anisotropy_threshold=cfg_block.anisotropy_threshold,
            force_separate_z=cfg_block.force_separate_z,
        )

    return fn


def nnunet_restore(pred: np.ndarray, rec: PreprocessRecord, is_label: bool = True) -> np.ndarray:
    """Invert resample + crop so predictions align with the source volume."""
    out = pred
    if rec.source_spacing and rec.target_spacing:
        out = resample_volume(
            out, rec.target_spacing, rec.source_spacing, is_label=is_label,
            separate_z_threshold=rec.anisotropy_threshold,
            force_separate_z=rec.force_separate_z,
        )
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
