"""Branch suite: curvilinear/tube instance postprocessing.

Reference: ``connectomics/decoding/decoders/branch/`` —
``branch_split`` (seeded split of under-segmented tubes, ``split.py``),
``branch_merge`` (z-continuity merge of over-segmented tubes, ``merge.py``),
``branch_extend`` (two-sided tube extension into weak predictions,
``extend.py``), ``branch_link`` (2-D per-section components linked into 3-D
tracklets, ``linking.py``), and per-section analytics (``sections.py``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import (
    binary_dilation,
    connected_components,
    remove_small,
    renumber,
    watershed,
)
from .registry import register_decoder


# ---------------------------------------------------------------------------
# section analytics (reference branch/sections.py)
# ---------------------------------------------------------------------------


def section_components(labels: np.ndarray) -> List[Dict[int, int]]:
    """Per-z-section: {instance id: 2-D component count}."""
    from scipy import ndimage

    out = []
    for z in range(labels.shape[0]):
        sec = labels[z]
        counts: Dict[int, int] = {}
        for iid in np.unique(sec):
            if iid == 0:
                continue
            _, n = ndimage.label(sec == iid)
            counts[int(iid)] = int(n)
        out.append(counts)
    return out


def multi_component_sections(labels: np.ndarray) -> Dict[int, List[int]]:
    """Instance -> z-sections where it splits into >1 2-D component
    (a merge-error signature for tube-like instances)."""
    out: Dict[int, List[int]] = {}
    for z, counts in enumerate(section_components(labels)):
        for iid, n in counts.items():
            if n > 1:
                out.setdefault(iid, []).append(z)
    return out


# ---------------------------------------------------------------------------
# branch_split (reference branch/split.py)
# ---------------------------------------------------------------------------


@register_decoder("branch_split")
def branch_split(labels, energy: Optional[np.ndarray] = None, min_size: int = 50, **kw):
    """Split instances whose sections contain multiple 2-D components:
    re-seed from per-section components and re-grow by watershed within the
    instance mask."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0].astype(np.uint32)
    else:
        lab = lab.astype(np.uint32)
    suspects = multi_component_sections(lab)
    if not suspects:
        return lab
    out = lab.copy()
    next_id = int(lab.max()) + 1
    from scipy import ndimage

    for iid in suspects:
        m = lab == iid
        # seeds: 3-D CC of a 1-voxel-eroded mask; if still single, per-section
        from ..ops import binary_erosion

        core, n = connected_components(binary_erosion(m, 1), 6)
        if n < 2:
            continue
        seeds = np.where(core > 0, core, 0).astype(np.uint32)
        e = energy if energy is not None else (~m).astype(np.float32)
        grown = watershed(np.ascontiguousarray(e, np.float32), seeds, mask=m)
        for k in range(1, n + 1):
            piece = grown == k
            if piece.sum() < min_size:
                out[piece] = iid
            else:
                out[piece] = next_id
                next_id += 1
    out, _ = renumber(out)
    return out


# ---------------------------------------------------------------------------
# branch_merge (reference branch/merge.py)
# ---------------------------------------------------------------------------


@register_decoder("branch_merge")
def branch_merge(labels, min_overlap: int = 10, max_gap: int = 1, **kw):
    """Merge instance pairs that continue each other across z: if instance A
    ends at section z and instance B starts at z+1..z+1+max_gap with
    sufficient XY overlap, unite them."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32)
    Z = lab.shape[0]
    # per-instance z extent
    zmin: Dict[int, int] = {}
    zmax: Dict[int, int] = {}
    for z in range(Z):
        for iid in np.unique(lab[z]):
            if iid == 0:
                continue
            zmin.setdefault(int(iid), z)
            zmax[int(iid)] = z
    parent = {i: i for i in zmin}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, za in zmax.items():
        for gap in range(1, max_gap + 1):
            z_next = za + gap
            if z_next >= Z:
                break
            sec_a = lab[za] == a
            grown = binary_dilation(sec_a[None], 1)[0] if gap > 0 else sec_a
            for b in np.unique(lab[z_next][grown]):
                b = int(b)
                if b == 0 or b == a or zmin.get(b) != z_next:
                    continue
                overlap = int((sec_a & (lab[z_next] == b)).sum())
                if overlap >= min_overlap:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    mapping = {i: find(i) for i in parent if find(i) != i}
    if mapping:
        from ..ops import remap

        lab = remap(lab, mapping)
    lab, _ = renumber(lab)
    return lab


# ---------------------------------------------------------------------------
# branch_extend (reference branch/extend.py)
# ---------------------------------------------------------------------------


@register_decoder("branch_extend")
def branch_extend(labels, probability: Optional[np.ndarray] = None, threshold: float = 0.3,
                  iterations: int = 3, **kw):
    """Extend tube ends into weakly-predicted foreground: dilate each
    instance within ``probability > threshold`` voxels not claimed by other
    instances."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32)
    if probability is None:
        return lab
    prob = np.asarray(probability)
    if prob.ndim == 4:
        prob = prob[0]
    allowed = (prob > threshold) & (lab == 0)
    seeds = lab.copy()
    energy = (1.0 - prob).astype(np.float32)
    grown = watershed(energy, seeds, mask=(lab > 0) | allowed)
    # limit growth distance via iterations of dilation mask
    reach = binary_dilation(lab > 0, iterations)
    out = np.where((grown > 0) & ((lab > 0) | (allowed & reach)), grown, lab)
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# branch_link / seg_2d (reference branch/linking.py)
# ---------------------------------------------------------------------------


@register_decoder("seg_2d")
def seg_2d(pred, threshold: float = 0.5, min_size: int = 0, **kw):
    """Per-section 2-D connected components with globally unique ids."""
    from scipy import ndimage

    p = np.asarray(pred)
    if p.ndim == 4:
        p = p[0]
    out = np.zeros(p.shape, np.uint32)
    offset = 0
    for z in range(p.shape[0]):
        cc, n = ndimage.label(p[z] > threshold)
        sec = cc.astype(np.uint32)
        sec[sec > 0] += offset
        out[z] = sec
        offset += n
    if min_size:
        out, _ = remove_small(out, min_size)
        out, _ = renumber(out)
    return out


@register_decoder("branch_link")
def branch_link(labels, min_iou: float = 0.3, max_gap: int = 1, **kw):
    """Link 2-D per-section components into 3-D tracklets by IoU between
    consecutive sections (with gap tolerance)."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32)
    Z = lab.shape[0]
    parent: Dict[int, int] = {}

    def find(a):
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for z in range(Z - 1):
        for gap in range(1, max_gap + 1):
            if z + gap >= Z:
                break
            a_sec, b_sec = lab[z], lab[z + gap]
            ids_a = np.unique(a_sec)
            for a in ids_a:
                if a == 0:
                    continue
                m = a_sec == a
                cand = np.unique(b_sec[m])
                for b in cand:
                    if b == 0:
                        continue
                    inter = int((m & (b_sec == b)).sum())
                    union = int(m.sum() + (b_sec == b).sum()) - inter
                    if union and inter / union >= min_iou:
                        ra, rb = find(int(a)), find(int(b))
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
    mapping = {i: find(i) for i in list(parent) if find(i) != i}
    if mapping:
        from ..ops import remap

        lab = remap(lab, mapping)
    lab, _ = renumber(lab)
    return lab


# ---------------------------------------------------------------------------
# long-range guided split (reference decoders/longrange_guided_split.py)
# ---------------------------------------------------------------------------


@register_decoder("longrange_guided_split")
def longrange_guided_split(
    labels,
    affinity: Optional[np.ndarray] = None,
    long_range_channels: Sequence[int] = (3, 4, 5),
    threshold: float = 0.3,
    min_size: int = 100,
    **kw,
):
    """False-merge correction using long-range affinity channels: inside each
    instance, voxel pairs connected by the instance but with LOW long-range
    affinity indicate a merge error; re-split via CC on short-range
    affinities gated by long-range consistency."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32)
    if affinity is None:
        return lab
    aff = np.asarray(affinity)
    lr = aff[list(long_range_channels)].min(axis=0)
    # voxels whose long-range support is weak become cut points
    weak = lr < threshold
    out = lab.copy()
    next_id = int(lab.max()) + 1
    for iid in np.unique(lab):
        if iid == 0:
            continue
        m = lab == iid
        interior = m & ~weak
        cc, n = connected_components(interior, 6)
        if n < 2:
            continue
        # keep the largest as iid, regrow pieces over the cut voxels
        seeds = cc.astype(np.uint32)
        grown = watershed((1.0 - lr).astype(np.float32), seeds, mask=m)
        sizes = np.bincount(grown.ravel())
        order = np.argsort(sizes[1:])[::-1] + 1
        for rank, k in enumerate(order[:n]):
            piece = grown == k
            if rank == 0 or piece.sum() < min_size:
                continue
            out[piece] = next_id
            next_id += 1
    out, _ = renumber(out)
    return out
