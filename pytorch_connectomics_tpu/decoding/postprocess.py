"""Decode postprocessing (reference ``connectomics/decoding/postprocess.py``
and ``decoding/utils.py``): small/large-instance filtering, cc relabel,
manual mask editing (remove/add/merge/watershed-split), 2D→3D IoU stitching,
and the binary median/morphology pipeline."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np
from scipy import ndimage

from ..config.schema import DecodingPostprocessConfig
from ..ops import connected_components, edt, remove_small, renumber, watershed


def cast2dtype(segm: np.ndarray) -> np.ndarray:
    """Downcast a segmentation to the smallest uint dtype that holds its max
    id (reference ``decoding/utils.py:26``)."""
    max_id = int(segm.max()) if segm.size else 0
    for dt in (np.uint8, np.uint16, np.uint32):
        if max_id <= np.iinfo(dt).max:
            return segm.astype(dt)
    return segm.astype(np.uint64)


def remove_small_instances(
    labels: np.ndarray, min_size: int, mode: str = "background"
) -> np.ndarray:
    """Drop or merge instances below ``min_size`` voxels (reference
    ``decoding/utils.py:40``). Modes: ``none``, ``background`` (drop to 0),
    ``background_2d`` (per-z-slice drop), ``neighbor`` (merge into the
    largest-contact neighbor), ``neighbor_2d``."""
    valid = ("none", "background", "background_2d", "neighbor", "neighbor_2d")
    if mode not in valid:
        raise ValueError(f"remove_small_instances mode {mode!r} not in {valid}")
    if mode == "none" or not min_size:
        return labels
    if mode == "background":
        out, _ = remove_small(np.asarray(labels, dtype=np.uint32).copy(), min_size)
        out, _ = renumber(out)
        return out
    if mode == "background_2d":
        out = np.asarray(labels, dtype=np.uint32).copy()
        for z in range(out.shape[0]):
            out[z] = remove_small(out[z], min_size)[0]
        out, _ = renumber(out)
        return out
    do_3d = mode == "neighbor"
    if do_3d:
        return merge_small_objects(np.asarray(labels).copy(), min_size, do_3d=True)
    out = np.asarray(labels).copy()
    for z in range(out.shape[0]):
        out[z] = merge_small_objects(out[z].copy(), min_size, do_3d=False)
    return out


def merge_small_objects(
    segm: np.ndarray, thres_small: int, do_3d: bool = False
) -> np.ndarray:
    """Merge each sub-threshold instance into the neighboring id with the
    greatest boundary contact (reference ``decoding/utils.py:78``)."""
    struct = np.ones((1, 3, 3), bool) if (do_3d and segm.ndim == 3) else None
    # one compact-relabel pass + one find_objects call gives every bbox up
    # front; the per-instance work below then touches only its own crop
    # (the naive per-id full-volume scan is O(n_small x volume))
    ids, inv, counts = np.unique(segm, return_inverse=True, return_counts=True)
    comp = (inv + 1).reshape(segm.shape).astype(np.int32)
    bboxes = list(ndimage.find_objects(comp))  # ids[k] -> bboxes[k]
    id2k = {int(i): k for k, i in enumerate(ids.tolist())}
    for k, (idx, cnt) in enumerate(zip(ids.tolist(), counts.tolist())):
        if idx == 0 or cnt >= thres_small:
            continue
        sl = bboxes[k]
        if sl is None:
            continue
        # bbox crop (+2 relax) keeps the dilation local
        slices = tuple(
            slice(max(0, s.start - 2), min(dim, s.stop + 2))
            for s, dim in zip(sl, segm.shape)
        )
        region = segm[slices]
        crop_mask = region == idx
        if struct is not None:
            ring = ndimage.binary_dilation(crop_mask, struct) & ~crop_mask
        else:
            ring = ndimage.binary_dilation(crop_mask) & ~crop_mask
        neighbors = region[ring]
        neighbors = neighbors[neighbors != idx]
        nz = neighbors[neighbors != 0]
        pool = nz if nz.size else neighbors
        if pool.size:
            # NB: an instance whose ring is all background merges into 0
            # (erased) — reference decoding/utils.py:78 behaves identically
            u, ct = np.unique(pool, return_counts=True)
            target = int(u[np.argmax(ct)])
            region[crop_mask] = target
            # a later-processed small target must see its grown extent:
            # widen its precomputed bbox to cover the absorbed instance
            tk = id2k.get(target)
            if tk is not None and tk > k and bboxes[tk] is not None:
                bboxes[tk] = tuple(
                    slice(min(a.start, b.start), max(a.stop, b.stop))
                    for a, b in zip(bboxes[tk], sl)
                )
    return segm


def remove_large_instances(segm: np.ndarray, max_size: int = 2000) -> np.ndarray:
    """Zero out instances larger than ``max_size`` voxels (reference
    ``decoding/utils.py:112``)."""
    out = np.copy(segm)
    sizes = np.bincount(segm.ravel().astype(np.int64))
    out[(sizes > max_size)[segm.astype(np.int64)]] = 0
    return out


def cc_instance_filter(labels: np.ndarray, connectivity: int = 6) -> np.ndarray:
    """Split disconnected instances (cc3d relabel pass)."""
    lab = np.asarray(labels, dtype=np.uint32)
    fg = lab > 0
    cc, _ = connected_components(fg, connectivity)
    combined = cc.astype(np.int64) * (int(lab.max()) + 1) + lab.astype(np.int64)
    _, inv = np.unique(combined, return_inverse=True)
    out = inv.reshape(lab.shape).astype(np.uint32)
    out[~fg] = 0
    out, _ = renumber(out)
    return out


# -- manual mask editing (reference postprocess.py:65-167) --------------------


def binarize_and_median(
    pred: np.ndarray, size: Sequence[int] = (7, 7, 7), thres: float = 0.8
) -> np.ndarray:
    """Threshold a probability map then median-filter the binary mask
    (reference ``postprocess.py:46``)."""
    return ndimage.median_filter((np.asarray(pred) > thres).astype(np.uint8), size=tuple(size))


def remove_masks(vol: np.ndarray, indices: List[int]) -> np.ndarray:
    """Zero the given instance ids (reference ``postprocess.py:65``)."""
    vol[np.isin(vol, np.asarray(indices, vol.dtype))] = 0
    return vol


def add_masks(vol_base: np.ndarray, vol: np.ndarray, indices: List[int]) -> np.ndarray:
    """Paste instances from ``vol`` into ``vol_base`` under fresh ids above
    the base's max; overwrites any underlying voxels (reference
    ``postprocess.py:80``)."""
    max_idx = int(vol_base.max())
    for i, idx in enumerate(indices):
        vol_base[vol == idx] = max_idx + i + 1
    return vol_base


def merge_masks(vol: np.ndarray, indices: List[List[int]]) -> np.ndarray:
    """Merge each group of ids into the group's first id (reference
    ``postprocess.py:99``)."""
    for group in indices:
        if not group:
            continue
        vol[np.isin(vol, np.asarray(group, vol.dtype))] = group[0]
    return vol


def watershed_split(
    vol: np.ndarray, index: int, min_distance: int = 5
) -> np.ndarray:
    """Split one instance into parts by an EDT watershed seeded at distance
    peaks at least ``min_distance`` apart; new parts get fresh ids above the
    volume max (reference ``postprocess.py:119``)."""
    if vol.ndim != 3:
        raise ValueError(f"watershed_split expects a 3-D label array, got {vol.shape}")
    max_idx = int(vol.max())
    mask = vol == index
    if not mask.any():
        return vol
    slices = ndimage.find_objects(mask.astype(np.uint8))[0]
    slices = tuple(
        slice(max(0, s.start - 1), min(dim, s.stop + 1))
        for s, dim in zip(slices, vol.shape)
    )
    crop = mask[slices]
    dist = edt(crop)
    # peak markers: local maxima of the EDT separated by >= min_distance
    fp = np.ones((2 * min_distance + 1,) * 3, bool)
    peaks = (dist >= ndimage.maximum_filter(dist, footprint=fp) - 1e-9) & crop & (dist > 0)
    markers, n = connected_components(peaks, 26)
    if n < 2:
        return vol
    parts = watershed((-dist).astype(np.float32), markers.astype(np.uint32), mask=crop)
    region = vol[slices]
    part_ids = np.unique(parts)
    part_ids = part_ids[part_ids != 0]
    for i, pid in enumerate(part_ids.tolist()):
        region[parts == pid] = max_idx + i + 1
    vol[slices] = region
    return vol


# -- 2D -> 3D stitching (reference postprocess.py:169-236) ---------------------


def intersection_over_union(masks_true: np.ndarray, masks_pred: np.ndarray) -> np.ndarray:
    """Pairwise IoU matrix of shape (true_max+1, pred_max+1), index 0 =
    background (reference ``postprocess.py:211``)."""
    a = np.asarray(masks_true).ravel().astype(np.int64)
    b = np.asarray(masks_pred).ravel().astype(np.int64)
    na, nb = int(a.max()) + 1, int(b.max()) + 1
    overlap = np.bincount(a * nb + b, minlength=na * nb).reshape(na, nb).astype(np.float64)
    denom = overlap.sum(axis=0, keepdims=True) + overlap.sum(axis=1, keepdims=True) - overlap
    iou = np.zeros_like(overlap)
    np.divide(overlap, denom, out=iou, where=denom > 0)
    return iou


def stitch_3d(masks: np.ndarray, stitch_threshold: float = 0.25) -> np.ndarray:
    """Greedy z-stitching of a stack of 2-D labelings into 3-D instances:
    each slice's labels adopt the best-IoU label from the slice below when
    IoU >= ``stitch_threshold``, else get fresh ids (reference
    ``postprocess.py:169``, cellpose-style)."""
    # fresh ids grow past the per-slice max; a small input dtype (uint8/16
    # 2-D CC output) would silently wrap and alias unrelated instances
    masks = np.asarray(masks).astype(np.int64, copy=True)
    mmax = int(masks[0].max())
    seen_any = False
    for i in range(len(masks) - 1):
        iou = intersection_over_union(masks[i + 1], masks[i])[1:, 1:]
        if not iou.size:
            if seen_any:
                icount = int(masks[i + 1].max())
                lut = np.concatenate(
                    [[0], np.arange(mmax + 1, mmax + icount + 1, dtype=np.int64)]
                )
                mmax += icount
                masks[i + 1] = lut[masks[i + 1]]
            else:
                mmax = int(masks[i + 1].max())
            continue
        iou[iou < stitch_threshold] = 0.0
        iou[iou < iou.max(axis=0)] = 0.0
        lut = iou.argmax(axis=1) + 1
        unmatched = np.nonzero(iou.max(axis=1) == 0.0)[0]
        lut[unmatched] = np.arange(mmax + 1, mmax + len(unmatched) + 1)
        mmax += len(unmatched)
        masks[i + 1] = np.concatenate([[0], lut])[masks[i + 1]]
        seen_any = True
    return masks


# -- binary pipeline (reference postprocess.py:238) ----------------------------


def apply_binary_postprocessing(pred: np.ndarray, config: Dict[str, Any]) -> np.ndarray:
    """Binary cleanup pipeline (reference ``postprocess.py:238``): binarize →
    median filter → morphological opening → closing → connected-component
    size/top-k filtering. ``config`` keys: ``threshold`` (when ``pred`` is a
    probability map), ``median_filter_size``, ``opening_iterations``,
    ``closing_iterations``, ``connected_components`` {``top_k``, ``min_size``,
    ``connectivity``}."""
    arr = np.asarray(pred)
    thres = float(config.get("threshold", 0.5))
    mask = (arr > thres).astype(np.uint8) if arr.dtype.kind == "f" else (arr > 0).astype(np.uint8)
    size = config.get("median_filter_size")
    if size:
        size = tuple(size) if isinstance(size, (list, tuple)) else int(size)
        mask = ndimage.median_filter(mask, size=size)
    n_open = int(config.get("opening_iterations", 0))
    if n_open:
        mask = ndimage.binary_opening(mask, iterations=n_open).astype(np.uint8)
    n_close = int(config.get("closing_iterations", 0))
    if n_close:
        mask = ndimage.binary_closing(mask, iterations=n_close).astype(np.uint8)
    cc_cfg = config.get("connected_components")
    if cc_cfg:
        connectivity = int(cc_cfg.get("connectivity", 6))
        labels, _ = connected_components(mask > 0, connectivity)
        min_size = int(cc_cfg.get("min_size", 0))
        if min_size:
            labels, _ = remove_small(labels, min_size)
        top_k = cc_cfg.get("top_k")
        if top_k:
            sizes = np.bincount(labels.ravel().astype(np.int64))
            sizes[0] = 0
            keep = np.argsort(sizes)[::-1][: int(top_k)]
            labels = np.where(np.isin(labels, keep[sizes[keep] > 0]), labels, 0)
        mask = (labels > 0).astype(np.uint8)
    return mask


def apply_postprocessing(
    labels: np.ndarray, cfg: Optional[DecodingPostprocessConfig]
) -> np.ndarray:
    if cfg is None:
        return labels
    out = np.asarray(labels)
    binary_cfg = getattr(cfg, "binary", None)
    if binary_cfg:
        out = apply_binary_postprocessing(out, dict(binary_cfg))
    if cfg.split_disconnected:
        out = cc_instance_filter(out, cfg.connectivity)
    if cfg.min_instance_size:
        out = remove_small_instances(
            out, cfg.min_instance_size, mode=getattr(cfg, "small_instance_mode", "background")
        )
    max_size = getattr(cfg, "max_instance_size", None)
    if max_size:
        out = remove_large_instances(out, max_size)
    if cfg.transpose:
        out = np.transpose(out, cfg.transpose)
    return out
