"""Pre-decode prediction crops: crop_pad and affinity-offset-aware crops.

Reference: ``connectomics/training/lightning/prediction_crops.py`` — when a
model was trained with padded context or long-range affinity offsets, the
prediction borders are invalid and must be cropped (or masked) before
decoding/evaluation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from ..data.targets.affinity import max_offset_pad


def crop_prediction(
    pred: np.ndarray, crop_pad: Sequence[int], channel_axis: int = -1
) -> np.ndarray:
    """Symmetric spatial crop by ``crop_pad`` voxels per axis (z, y, x)."""
    cz, cy, cx = (int(c) for c in crop_pad)
    if channel_axis == -1 or channel_axis == pred.ndim - 1:
        sl = (slice(cz, pred.shape[0] - cz or None),
              slice(cy, pred.shape[1] - cy or None),
              slice(cx, pred.shape[2] - cx or None))
        return pred[sl]
    sl = (slice(None),
          slice(cz, pred.shape[1] - cz or None),
          slice(cy, pred.shape[2] - cy or None),
          slice(cx, pred.shape[3] - cx or None))
    return pred[sl]


def affinity_border_mask(
    shape_zyx: Sequence[int],
    offsets: Sequence[Union[str, Sequence[int]]],
) -> np.ndarray:
    """(Z,Y,X) mask zeroing the border band where long-range affinities have
    no valid neighbor (reference affinity-offset-aware crop)."""
    pz, py, px = max_offset_pad(offsets)
    m = np.zeros(tuple(shape_zyx), np.float32)
    m[pz: shape_zyx[0] - pz or None,
      py: shape_zyx[1] - py or None,
      px: shape_zyx[2] - px or None] = 1.0
    return m


def apply_prediction_crops(
    pred: np.ndarray,
    crop_pad: Optional[Sequence[int]] = None,
    affinity_offsets: Optional[Sequence] = None,
    channel_axis: int = -1,
) -> np.ndarray:
    out = pred
    if crop_pad:
        out = crop_prediction(out, crop_pad, channel_axis)
    if affinity_offsets:
        spatial = out.shape[:3] if channel_axis in (-1, out.ndim - 1) else out.shape[1:]
        mask = affinity_border_mask(spatial, affinity_offsets)
        out = out * (mask[..., None] if channel_axis in (-1, out.ndim - 1) else mask[None])
    return out
