"""Built-in decoders: prediction maps -> instance segmentations.

Reference decoders being reimplemented on our native C++ ops:
- ``decode_binary_contour_distance_watershed`` (``decoders/segmentation.py:74``)
- ``decode_distance_watershed`` (``segmentation.py:290``)
- ``decode_affinity_cc`` (``segmentation.py:498``) — C++ affinity CC
- ``decode_waterz`` (``decoders/waterz.py:33``) — C++ watershed fragments +
  hierarchical mean-affinity agglomeration
- mutex watershed (``decoders/mutex_watershed.py``) — C++
- ``polarity2instance`` (``decoders/synapse.py``)
- marker-based growth (``segmentation_grow.py``), shape smoothing
  (``shape_smooth.py``)

Prediction layout: (C, Z, Y, X) float32 probabilities (post-activation).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from scipy import ndimage

from ..ops import (
    affinity_connected_components,
    agglomerate,
    binary_dilation,
    binary_erosion,
    connected_components,
    mutex_watershed as _mutex_ws,
    remove_small,
    renumber,
    watershed,
)
from .registry import register_decoder


def _chan(pred: np.ndarray) -> np.ndarray:
    return pred if pred.ndim == 4 else pred[None]


@register_decoder("binary_cc")
def decode_binary_cc(pred, threshold=0.5, connectivity=6, min_size=0, **kw):
    """Threshold channel 0 + connected components."""
    p = _chan(np.asarray(pred))
    labels, _ = connected_components(p[0] > threshold, connectivity)
    if min_size:
        labels, _ = remove_small(labels, min_size)
    return labels


@register_decoder("bcd_watershed")
def decode_bcd_watershed(
    pred,
    binary_threshold=0.9,
    boundary_threshold=0.85,
    seed_threshold=0.5,
    min_size=0,
    **kw,
):
    """Binary+contour+distance watershed (reference
    ``decode_binary_contour_distance_watershed``, ``segmentation.py:74``):
    channels [binary, boundary, distance]; seeds from high-binary/low-boundary
    cores, grown by watershed on inverted distance within the binary mask."""
    p = _chan(np.asarray(pred, dtype=np.float32))
    binary, boundary = p[0], p[1]
    distance = p[2] if p.shape[0] > 2 else None
    fg = binary > 0.5
    core = (binary > binary_threshold) & (boundary < (1.0 - boundary_threshold))
    if distance is not None:
        core &= distance > seed_threshold
    seeds, _ = connected_components(core, 6)
    energy = boundary if distance is None else -distance
    labels = watershed(energy.astype(np.float32), seeds, mask=fg)
    if min_size:
        labels, _ = remove_small(labels, min_size)
    return labels


@register_decoder("distance_watershed")
def decode_distance_watershed(
    pred, seed_threshold=0.7, mask_threshold=0.0, min_size=0, tanh_input=False, **kw
):
    """Distance-map watershed (reference ``decode_distance_watershed``,
    ``segmentation.py:290``): seeds at distance maxima, grow downhill."""
    p = _chan(np.asarray(pred, dtype=np.float32))
    dist = p[0]
    fg = dist > mask_threshold
    seeds, _ = connected_components(dist > seed_threshold, 6)
    labels = watershed((-dist).astype(np.float32), seeds, mask=fg)
    if min_size:
        labels, _ = remove_small(labels, min_size)
    return labels


@register_decoder("affinity_cc")
def decode_affinity_cc(pred, threshold=0.75, min_size=0, **kw):
    """BANIS affinity-threshold connected components
    (reference ``segmentation.py:498``; NISB headline decode @0.75)."""
    p = _chan(np.asarray(pred, dtype=np.float32))
    labels, _ = affinity_connected_components(p[:3], threshold)
    if min_size:
        labels, _ = remove_small(labels, min_size)
    return labels


@register_decoder("waterz")
def decode_waterz(
    pred,
    threshold=0.5,
    fragments="watershed",
    fragment_threshold=0.5,
    min_size=0,
    thresholds=None,
    return_all_thresholds=False,
    **kw,
):
    """waterz-equivalent: watershed fragments over mean short-range affinity,
    then hierarchical mean-affinity agglomeration to ``threshold``
    (reference ``decoders/waterz.py:33``).

    Batch mode (reference ``tuning/optuna_tuner.py:1155``): pass
    ``thresholds=[...]`` with ``return_all_thresholds=True`` to sweep many
    merge thresholds in ONE watershed + RAG pass; returns {thr: labels}.
    """
    p = _chan(np.asarray(pred, dtype=np.float32))[:3]
    mean_aff = p.mean(axis=0)
    if fragments == "cc":
        frags, _ = affinity_connected_components(p, max(0.9, fragment_threshold))
    else:
        fg = mean_aff > fragment_threshold
        # seeds from local maxima plateaus of mean affinity
        smooth = ndimage.gaussian_filter(mean_aff, 1.0)
        maxima = smooth > (ndimage.maximum_filter(smooth, size=3) - 1e-6)
        seeds, _ = connected_components(maxima & fg, 6)
        frags = watershed((-smooth).astype(np.float32), seeds, mask=fg)
    if thresholds is not None and return_all_thresholds:
        from ..ops.native import agglomerate_multi

        by_thr = agglomerate_multi(frags, p, thresholds)
        out = {}
        for thr, (labels, _) in by_thr.items():
            if min_size:
                labels, _ = remove_small(labels.copy(), min_size)
            out[thr] = labels
        return out
    labels, _ = agglomerate(frags, p, threshold)
    if min_size:
        labels, _ = remove_small(labels, min_size)
    return labels


@register_decoder("channel_gate")
def decode_channel_gate(pred, signal_channels=0, gate_channel=-1, **kw):
    """Multiply selected signal channels by one gate channel (reference
    ``decoders/transforms.py:10``). Channels accept an int, a list of ints,
    or a slice string like ``"0:3"``."""
    from ..utils.slicing import parse_slice

    arr = _chan(np.asarray(pred))

    def _resolve(spec, what):
        if isinstance(spec, (int, np.integer)):
            idx = [int(spec) % arr.shape[0]]
        elif isinstance(spec, str):
            idx = list(range(arr.shape[0]))[parse_slice(spec)]
        else:
            idx = [int(i) % arr.shape[0] for i in spec]
        if not idx:
            raise ValueError(f"channel_gate.{what} resolved to no channels")
        return idx

    sig = _resolve(signal_channels, "signal_channels")
    gate = _resolve(gate_channel, "gate_channel")
    if len(gate) != 1:
        raise ValueError(f"channel_gate.gate_channel must be one channel, got {gate}")
    return (arr[sig] * arr[gate[0] : gate[0] + 1]).astype(arr.dtype, copy=False)


@register_decoder("naive_waterz")
def naive_waterz(
    pred,
    chunk_depth=80,
    threshold=0.4,
    fragment_threshold=0.5,
    dust_remove_size=600,
    min_overlap=20,
    iou_threshold=0.05,
    one_sided_threshold=0.95,
    one_sided_min_size=200,
    affinity_threshold=0.15,
    **kw,
):
    """Fixed chunk-and-stitch waterz recipe (reference
    ``decoders/waterz.py:354``): decode depth-``chunk_depth`` z-chunks
    independently, then union-find-merge segments across each chunk seam.
    A face pair merges when its co-located overlap has ``min_overlap``
    voxels, its mean seam z-affinity reaches ``affinity_threshold``, and
    either face-IoU >= ``iou_threshold`` or one side is
    ``one_sided_threshold``-contained in the other (both faces at least
    ``one_sided_min_size`` voxels)."""
    p = _chan(np.asarray(pred, dtype=np.float32))[:3]
    nz = p.shape[1]
    chunks: List[np.ndarray] = []
    offsets: List[int] = []
    cursor = 0
    for z0 in range(0, nz, chunk_depth):
        seg = decode_waterz(
            p[:, z0 : min(z0 + chunk_depth, nz)],
            threshold=threshold,
            fragment_threshold=fragment_threshold,
            min_size=dust_remove_size,
        ).astype(np.uint64)
        chunks.append(seg)
        offsets.append(cursor)
        cursor += int(seg.max()) if seg.size else 0

    parent = np.arange(cursor + 1, dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(chunks) - 1):
        src = chunks[i][-1] + np.uint64(offsets[i]) * (chunks[i][-1] > 0)
        dst = chunks[i + 1][0] + np.uint64(offsets[i + 1]) * (chunks[i + 1][0] > 0)
        # z-affinity at the seam: channel 2 index z connects z-1 -> z
        # (deepem high-end convention, CLAUDE.md)
        aff = p[2, (i + 1) * chunk_depth] if p.shape[0] > 2 else np.ones_like(src, np.float32)
        both = (src > 0) & (dst > 0)
        if not bool(both.any()):
            continue
        pair_base = np.uint64(int(dst[both].max()) + 1)
        keys = src[both] * pair_base + dst[both]
        uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
        aff_mean = np.bincount(inv, weights=aff[both]) / counts
        src_ids, src_sizes = np.unique(src[src > 0], return_counts=True)
        dst_ids, dst_sizes = np.unique(dst[dst > 0], return_counts=True)
        size_of_src = dict(zip(src_ids.tolist(), src_sizes.tolist()))
        size_of_dst = dict(zip(dst_ids.tolist(), dst_sizes.tolist()))
        for k, ov, am in zip(uniq.tolist(), counts.tolist(), aff_mean.tolist()):
            sa, sb = int(k // int(pair_base)), int(k % int(pair_base))
            if ov < min_overlap or am < affinity_threshold:
                continue
            na, nb = size_of_src[sa], size_of_dst[sb]
            iou = ov / (na + nb - ov)
            one_sided = (
                min(na, nb) >= one_sided_min_size
                and ov / min(na, nb) >= one_sided_threshold
            )
            if iou >= iou_threshold or one_sided:
                ra, rb = find(sa), find(sb)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    roots = np.array([find(i) for i in range(cursor + 1)], dtype=np.uint64)
    _, lut = np.unique(roots[1:], return_inverse=True)
    mapping = np.zeros(cursor + 1, dtype=np.uint64)
    if cursor:
        mapping[1:] = lut.astype(np.uint64) + 1
    out = np.empty(p.shape[1:], dtype=np.uint32)
    for ci, seg in enumerate(chunks):
        glob = seg + np.uint64(offsets[ci]) * (seg > 0)
        z0 = ci * chunk_depth
        out[z0 : z0 + len(seg)] = mapping[glob].astype(np.uint32)
    return out


@register_decoder("mutex_watershed")
def decode_mutex_watershed(pred, offsets=None, min_size=0, **kw):
    """Seedless mutex watershed over short+long-range affinities
    (reference ``decoders/mutex_watershed.py``)."""
    p = _chan(np.asarray(pred, dtype=np.float32))
    if offsets is None:
        from ..data.targets.affinity import parse_offsets

        offsets = [(0, 0, 1), (0, 1, 0), (1, 0, 0)][: p.shape[0]]
    else:
        from ..data.targets.affinity import parse_offsets

        offsets = parse_offsets(offsets)
    labels, _ = _mutex_ws(p, offsets)
    # background: voxels with no strong short-range affinity
    short = p[: min(3, p.shape[0])].max(axis=0)
    labels = np.where(short > 0.05, labels, 0).astype(np.uint32)
    labels, _ = renumber(labels)
    if min_size:
        labels, _ = remove_small(labels, min_size)
    return labels


@register_decoder("polarity2instance")
def decode_polarity(pred, threshold=0.5, min_size=0, pair_distance=8, **kw):
    """Synaptic polarity -> synapse instances (reference
    ``decoders/synapse.py``): CC on the union channel; each synapse keeps its
    pre/post split in paired labels 2k-1/2k."""
    p = _chan(np.asarray(pred, dtype=np.float32))
    pre, post, union = p[0] > threshold, p[1] > threshold, p[2] > threshold
    union = union | pre | post
    syn, n = connected_components(union, 26)
    if min_size:
        syn, _ = remove_small(syn, min_size)
        syn, n = renumber(syn)
    out = np.zeros_like(syn)
    out[(syn > 0) & pre] = syn[(syn > 0) & pre] * 2 - 1
    out[(syn > 0) & post] = syn[(syn > 0) & post] * 2
    return out


def grow_labels_bounded(
    labels: np.ndarray,
    fg: Optional[np.ndarray] = None,
    max_steps: int = 5,
) -> np.ndarray:
    """Grow labels into unlabeled foreground by at most ``max_steps``
    6-connected rings (reference ``segmentation_grow.py:256``
    sparse_geodesic_grow_labels semantics: bounded geodesic growth).

    Ties resolve deterministically by axis priority (z-, z+, y-, y+,
    x-, x+)."""
    lab = np.asarray(labels, dtype=np.uint32).copy()
    grow_into = (lab == 0) if fg is None else ((lab == 0) & np.asarray(fg, bool))
    for _ in range(int(max_steps)):
        frontier = np.zeros_like(lab)
        for axis, shift in ((0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)):
            src = np.roll(lab, shift, axis=axis)
            # roll wraps; zero the wrapped face
            edge = [slice(None)] * 3
            edge[axis] = slice(0, 1) if shift == 1 else slice(-1, None)
            src[tuple(edge)] = 0
            take = grow_into & (frontier == 0) & (src > 0)
            frontier[take] = src[take]
        if not frontier.any():
            break
        grew = frontier > 0
        lab[grew] = frontier[grew]
        grow_into &= ~grew
    return lab


@register_decoder("grow_bounded")
def decode_grow_bounded(labels, prediction=None, threshold=0.5, max_steps=5, **kw):
    """Bounded growth step: grow the incoming labels into affinity-supported
    foreground (graph mode passes ``prediction`` as a second input; linear
    mode grows into all unlabeled voxels)."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    fg = None
    if prediction is not None:
        p = _chan(np.asarray(prediction, dtype=np.float32))
        fg = p[: min(3, p.shape[0])].mean(axis=0) > threshold
    return grow_labels_bounded(lab.astype(np.uint32), fg, max_steps)


@register_decoder("segmentation_grow")
def decode_grow(pred, markers=None, threshold=0.5, iterations=2, **kw):
    """Marker-based growth: dilate instance markers within the foreground
    probability mask (reference ``segmentation_grow.py``)."""
    p = _chan(np.asarray(pred, dtype=np.float32))
    fg = p[0] > threshold
    if markers is None:
        markers, _ = connected_components(binary_erosion(fg, iterations), 6)
    labels = watershed((1.0 - p[0]).astype(np.float32), np.asarray(markers, np.uint32), mask=fg)
    return labels


@register_decoder("shape_smooth")
def decode_shape_smooth(labels, iterations=1, keep_vanishing=True, **kw):
    """Multilabel morphological smoothing (open) preserving label identity
    (reference ``shape_smooth.py`` / fastmorph). Instances process on
    bbox crops (padded by ``iterations``) instead of full-volume masks;
    ``keep_vanishing`` restores instances the opening would erase."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32)
    ids = np.unique(lab)
    id_map = None
    if len(ids) and int(ids.max()) > 4 * len(ids) + 64:
        # sparse ids: renumber for a dense find_objects pass, map back after
        from ..ops import renumber as _renumber

        dense, _ = _renumber(np.ascontiguousarray(lab))
        id_map = np.zeros(int(dense.max()) + 1, np.uint32)
        id_map[dense.ravel()] = lab.ravel()
        lab = dense
    out = np.zeros_like(lab)
    objs = ndimage.find_objects(lab.astype(np.int64))
    it = int(iterations)
    for iid0, sl in enumerate(objs):
        if sl is None:
            continue
        iid = iid0 + 1
        padded = tuple(
            slice(max(0, s.start - it), min(dim, s.stop + it))
            for s, dim in zip(sl, lab.shape)
        )
        m = lab[padded] == iid
        sm = binary_dilation(binary_erosion(m, it), it)
        if keep_vanishing and not sm.any():
            sm = m  # opening erased the instance: keep the original
        out[padded][sm] = iid
    if id_map is not None:
        out = id_map[out]
    return out


@register_decoder("threshold_mask")
def decode_threshold(pred, threshold=0.5, channel=0, **kw):
    p = _chan(np.asarray(pred))
    return (p[channel] > threshold).astype(np.uint8)
