"""Fast bounding-box utilities over instance volumes
(reference ``connectomics/data/processing/bbox.py`` + ``bbox_processor.py``)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

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


def seg_to_iou(
    seg0: np.ndarray,
    seg1: np.ndarray,
    uid0: Optional[np.ndarray] = None,
    th_iou: float = 0.0,
) -> np.ndarray:
    """Best-overlap match of every segment in ``seg0`` against ``seg1``
    (reference ``processing/iou.py:25``): rows
    ``[id0, best_id1, count0, count1, overlap]`` (int64). ``th_iou > 0``
    filters to rows whose IoU exceeds it (same 5-column schema)."""
    a = np.asarray(seg0).ravel().astype(np.int64)
    b = np.asarray(seg1).ravel().astype(np.int64)
    fg = a > 0
    u0, c0 = np.unique(a[fg], return_counts=True)
    u1, c1 = np.unique(b[b > 0], return_counts=True)
    size1 = dict(zip(u1.tolist(), c1.tolist()))
    best: Dict[int, Tuple[int, int]] = {}
    if fg.any():
        nb = int(b.max()) + 1
        keys = a[fg] * nb + b[fg]
        uk, kc = np.unique(keys, return_counts=True)
        for k, ov in zip(uk.tolist(), kc.tolist()):
            i0, i1 = k // nb, k % nb
            if i1 == 0:
                continue
            if i0 not in best or ov > best[i0][1]:
                best[i0] = (i1, ov)
    want = u0 if uid0 is None else np.asarray(uid0, np.int64)
    size0 = dict(zip(u0.tolist(), c0.tolist()))
    rows = []
    for i0 in want.tolist():
        i1, ov = best.get(i0, (0, 0))
        rows.append([i0, i1, size0.get(i0, 0), size1.get(i1, 0), ov])
    out = np.asarray(rows, np.int64).reshape(-1, 5)
    if th_iou > 0 and out.size:
        iou = out[:, 4] / np.maximum(out[:, 2] + out[:, 3] - out[:, 4], 1)
        out = out[iou > th_iou]  # reference keeps all 5 columns (iou.py:120)
    return out


def segs_to_iou(get_seg, index: Sequence[int], th_iou: float = 0.0) -> List[np.ndarray]:
    """Track segments across consecutive slices: one ``seg_to_iou`` result
    per (index[i], index[i+1]) boundary (reference ``processing/iou.py:130``)."""
    out: List[np.ndarray] = []
    if len(index) < 2:
        return out
    seg0 = get_seg(index[0])
    for z in list(index)[1:]:
        seg1 = get_seg(z)
        out.append(seg_to_iou(seg0, seg1, th_iou=th_iou))
        seg0 = seg1
    return out
