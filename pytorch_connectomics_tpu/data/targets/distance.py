"""Distance-transform targets: instance/semantic EDT, signed distance (SDT),
and a skeleton-aware EDT approximation.

Reference: ``connectomics/data/processing/distance.py`` (instance EDT :84,
semantic :31, SDT :205, skeleton-aware :299 via kimimaro).  Our
skeleton-aware variant uses the distance-ridge (local EDT maxima) as a
skeleton proxy instead of TEASAR — same normalization contract
(per-instance distance normalized by distance at the skeleton, scaled by
``alpha``), no native dependency.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from scipy import ndimage


def _per_instance(seg: np.ndarray):
    ids = np.unique(seg)
    return ids[ids > 0]


def instance_edt(
    seg: np.ndarray,
    mode: str = "3d",
    normalize: bool = True,
    sampling: Optional[Sequence[float]] = None,
    bg_value: float = 0.0,
) -> np.ndarray:
    """Per-instance euclidean distance transform, normalized to [0,1] within
    each instance (reference ``distance.py:84``)."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    out = np.full(seg.shape, bg_value, dtype=np.float32)
    if mode == "2d":
        for z in range(seg.shape[0]):
            out[z] = _instance_edt_slice(seg[z], normalize, sampling, bg_value)
        return out
    for iid in _per_instance(seg):
        m = seg == iid
        # bound the EDT to the instance bbox for speed
        obj = ndimage.find_objects(m.astype(np.uint8))[0]
        d = ndimage.distance_transform_edt(m[obj], sampling=sampling)
        if normalize and d.max() > 0:
            d = d / d.max()
        out[obj] = np.where(m[obj], d.astype(np.float32), out[obj])
    return out


def _instance_edt_slice(seg2d, normalize, sampling, bg_value):
    out = np.full(seg2d.shape, bg_value, dtype=np.float32)
    for iid in _per_instance(seg2d):
        m = seg2d == iid
        obj = ndimage.find_objects(m.astype(np.uint8))[0]
        d = ndimage.distance_transform_edt(m[obj], sampling=sampling[1:] if sampling else None)
        if normalize and d.max() > 0:
            d = d / d.max()
        out[obj] = np.where(m[obj], d.astype(np.float32), out[obj])
    return out


def semantic_edt(
    mask: np.ndarray,
    mode: str = "3d",
    normalize: bool = True,
    sampling: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Foreground EDT of a binary mask (reference ``distance.py:31``)."""
    mask = np.asarray(mask) > 0
    if mask.ndim == 4:
        mask = mask[0]
    if mode == "2d":
        d = np.stack([ndimage.distance_transform_edt(m) for m in mask]).astype(np.float32)
    else:
        d = ndimage.distance_transform_edt(mask, sampling=sampling).astype(np.float32)
    if normalize and d.max() > 0:
        d = d / d.max()
    return d


def signed_distance(
    seg: np.ndarray,
    mode: str = "3d",
    truncate: float = 8.0,
    per_instance: bool = True,
) -> np.ndarray:
    """Signed distance transform in [-1, 1]: positive inside instances,
    negative outside, truncated at ``truncate`` voxels
    (reference ``distance.py:205``)."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    fg = seg > 0
    if per_instance:
        inside = np.zeros(seg.shape, dtype=np.float32)
        # boundaries between touching instances count as outside
        boundaries = instance_boundary_mask(seg)
        interior = fg & ~boundaries
        inside = ndimage.distance_transform_edt(interior).astype(np.float32)
    else:
        inside = ndimage.distance_transform_edt(fg).astype(np.float32)
    outside = ndimage.distance_transform_edt(~fg).astype(np.float32)
    sdt = np.clip(inside, 0, truncate) / truncate - np.clip(outside, 0, truncate) / truncate
    return sdt.astype(np.float32)


def skeleton_aware_edt(
    seg: np.ndarray,
    alpha: float = 0.8,
    bg_value: float = -1.0,
    mode: str = "3d",
) -> np.ndarray:
    """Skeleton-aware EDT: per-instance distance normalized by the distance
    value at the instance's ridge (EDT local maxima), raised to ``alpha``
    (reference ``distance.py:299,509`` — kimimaro skeletons replaced by the
    medial ridge, which the TEASAR skeleton approximates)."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    out = np.full(seg.shape, bg_value, dtype=np.float32)
    for iid in _per_instance(seg):
        m = seg == iid
        obj = ndimage.find_objects(m.astype(np.uint8))[0]
        sub = m[obj]
        d = ndimage.distance_transform_edt(sub).astype(np.float32)
        ridge = float(d.max())
        if ridge <= 0:
            continue
        v = np.clip(d / ridge, 0.0, 1.0) ** alpha
        out[obj] = np.where(sub, v, out[obj])
    return out


def _boundary_shift(seg: np.ndarray, axes, edge_mode: str) -> np.ndarray:
    """Shift-and-compare boundary over ``axes``; both neighbors of a differing
    pair are marked (reference ``target.py:53-120``). Edge modes:
    ``all`` = every label change; ``seg-all`` = changes touching foreground;
    ``seg-no-bg`` = changes between two foreground instances only."""
    boundary = np.zeros(seg.shape, dtype=bool)
    for ax in axes:
        a = np.swapaxes(seg, 0, ax)
        b = np.zeros_like(a, dtype=bool)
        lo, hi = a[:-1], a[1:]
        if edge_mode == "all":
            diff = lo != hi
        elif edge_mode == "seg-all":
            diff = (lo != hi) & ((lo > 0) | (hi > 0))
        elif edge_mode == "seg-no-bg":
            diff = (lo != hi) & (lo > 0) & (hi > 0)
        else:
            raise ValueError(f"unknown edge_mode {edge_mode!r}")
        b[1:] |= diff
        b[:-1] |= diff
        boundary |= np.swapaxes(b, 0, ax)
    return boundary


def _boundary_morph(seg: np.ndarray, thickness: int, edge_mode: str) -> np.ndarray:
    """Thickness>1 boundaries via grey erosion/dilation over a box window of
    edge ``thickness`` (reference ``target.py:146-157``)."""
    if edge_mode == "all":
        eroded = ndimage.grey_erosion(seg, thickness, mode="reflect")
        return seg != eroded
    if edge_mode == "seg-all":
        eroded = ndimage.grey_erosion(seg, thickness, mode="reflect")
        return (seg > 0) & (seg != eroded)
    if edge_mode == "seg-no-bg":
        dilated = ndimage.grey_dilation(seg, thickness, mode="reflect")
        masked = np.where(seg > 0, dilated, np.inf)
        eroded = ndimage.grey_erosion(masked, thickness, mode="reflect")
        return (seg > 0) & (dilated != eroded)
    raise ValueError(f"unknown edge_mode {edge_mode!r}")


def instance_boundary_mask(
    seg: np.ndarray,
    thickness: int = 1,
    mode: str = "3d",
    edge_mode: Optional[str] = None,
) -> np.ndarray:
    """Boundary voxels between different instances / background.

    ``edge_mode=None`` keeps the historic behavior (any label change,
    restricted to foreground, isotropic dilation for thickness>1 — what the
    bcd decoder trains against). ``"all" | "seg-all" | "seg-no-bg"``
    reproduce the reference bit-exactly (``processing/target.py:122-178``;
    locked by ``tests/unit/test_target_parity.py``), including its
    box-window grey-morphology thickness semantics."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    axes = (1, 2) if mode == "2d" else (0, 1, 2)
    if edge_mode is None:
        boundary = _boundary_shift(seg, axes, "all")
        boundary &= seg > 0
        if thickness > 1:
            st = ndimage.generate_binary_structure(3, 1)
            boundary = ndimage.binary_dilation(boundary, st, iterations=thickness - 1)
            boundary &= seg > 0
        return boundary
    if thickness == 1:
        return _boundary_shift(seg, axes, edge_mode)
    if mode == "2d":
        out = np.zeros(seg.shape, dtype=bool)
        for z in range(seg.shape[0]):
            out[z] = _boundary_morph(seg[z], thickness, edge_mode)
        return out
    return _boundary_morph(seg, thickness, edge_mode)


def seg_erosion_instance(seg: np.ndarray, tsz_h=1) -> np.ndarray:
    """Window-based instance erosion (Kisuk Lee thesis A.1.4; reference
    ``processing/segment.py:25``): a voxel survives only when the box window
    centered on it contains exactly ONE positive id — so instances separate
    at touching boundaries. Scalar ``tsz_h`` erodes in-plane only (window
    ``2h+1`` over the last two axes); a per-axis sequence gives anisotropic
    N-D erosion. Negative ids mark ignore/unlabeled voxels and pass through
    unchanged (zeroing them would relabel ignore as supervised background)."""
    seg = np.asarray(seg)
    if np.isscalar(tsz_h):
        w = 2 * int(tsz_h) + 1
        size = (1,) * (seg.ndim - 2) + (w, w)
    else:
        halves = tuple(int(h) for h in tsz_h)
        if len(halves) != seg.ndim:
            raise ValueError(f"tsz_h has {len(halves)} entries for a {seg.ndim}-D seg")
        size = tuple(2 * h + 1 for h in halves)
    # exactly-one-positive-id test via window max/min over positive ids:
    # background (0) maps to a sentinel above every id so the min skips it
    sentinel = seg.max() + 1
    wmax = ndimage.maximum_filter(seg, size=size, mode="reflect")
    wmin = ndimage.minimum_filter(np.where(seg > 0, seg, sentinel), size=size, mode="reflect")
    keep = (wmax == wmin) | (seg < 0)
    return seg * keep


def erode_instances(seg: np.ndarray, iterations: int = 1, mode: str = "3d") -> np.ndarray:
    """Shrink each instance by eroding at inter-instance boundaries
    (reference ``SegErosiond``, ``processing/transforms.py:466``)."""
    if iterations <= 0:
        return seg
    seg = np.asarray(seg)
    squeeze = False
    if seg.ndim == 4:
        seg, squeeze = seg[0], True
    out = seg.copy()
    for _ in range(iterations):
        b = instance_boundary_mask(out, 1, mode)
        out = np.where(b, 0, out)
    return out[None] if squeeze else out
