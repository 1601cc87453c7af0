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
