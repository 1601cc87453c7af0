"""Fast bounding-box utilities over instance volumes
(reference ``connectomics/data/processing/bbox.py`` + ``bbox_processor.py``)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def instance_bboxes(labels: np.ndarray) -> Dict[int, Tuple[Tuple[int, int], ...]]:
    """{id: ((z0,z1),(y0,y1),(x0,x1))} half-open bounds, vectorized via
    per-axis projections."""
    lab = np.asarray(labels)
    ids = np.unique(lab)
    ids = ids[ids > 0]
    out: Dict[int, Tuple[Tuple[int, int], ...]] = {}
    if ids.size == 0:
        return out
    from scipy import ndimage

    objs = ndimage.find_objects(lab.astype(np.int64))
    for iid in ids:
        sl = objs[int(iid) - 1]
        if sl is None:
            continue
        out[int(iid)] = tuple((s.start, s.stop) for s in sl)
    return out


def bbox_volume(b: Tuple[Tuple[int, int], ...]) -> int:
    v = 1
    for lo, hi in b:
        v *= hi - lo
    return v


def expand_bbox(
    b: Tuple[Tuple[int, int], ...], margin: Sequence[int], shape: Sequence[int]
) -> Tuple[Tuple[int, int], ...]:
    return tuple(
        (max(0, lo - m), min(s, hi + m)) for (lo, hi), m, s in zip(b, margin, shape)
    )


def bbox_slices(b: Tuple[Tuple[int, int], ...]) -> Tuple[slice, ...]:
    return tuple(slice(lo, hi) for lo, hi in b)


def crop_to_foreground(
    volume: np.ndarray, mask: Optional[np.ndarray] = None, margin: Sequence[int] = (0, 0, 0)
) -> Tuple[np.ndarray, Tuple[slice, ...]]:
    """nnU-Net style foreground crop; returns (cropped, slices)
    (reference ``nnunet_preprocess.py`` crop step)."""
    m = np.asarray(mask if mask is not None else volume > 0)
    if not m.any():
        return volume, tuple(slice(0, s) for s in volume.shape)
    coords = np.argwhere(m)
    lo = coords.min(axis=0)
    hi = coords.max(axis=0) + 1
    b = expand_bbox(tuple(zip(lo, hi)), margin, volume.shape)
    sl = bbox_slices(b)
    return volume[sl], sl
