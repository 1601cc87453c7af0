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


def component_split(lab: np.ndarray, energy: Optional[np.ndarray] = None,
                    min_size: int = 50) -> np.ndarray:
    """Cue-1 split: instances whose sections contain multiple 2-D components
    are re-seeded from the 3-D components of their eroded core and re-grown
    by watershed within the instance mask."""
    suspects = multi_component_sections(lab)
    if not suspects:
        return lab
    out = lab.copy()
    next_id = int(lab.max()) + 1
    from ..ops import binary_erosion

    for iid in suspects:
        m = lab == iid
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
    return out


@register_decoder("branch_split")
def branch_split(
    labels,
    energy: Optional[np.ndarray] = None,
    min_size: int = 50,
    component: bool = True,
    link_cut: bool = True,
    confident: bool = True,
    drop_thr: float = 0.25,
    w: int = 4,
    link_min_size: int = 10000,
    min_frag: int = 6,
    recover: float = 0.4,  # branch_cues.RECOVER (reference split.py:79)
    host_both: bool = False,
    gates: Optional[Dict] = None,
    **kw,
):
    """Branch-split cue ladder in the reference's fixed research order
    (``branch/split.py:509``): cue-1 component re-watershed (this repo's
    original detector), cue-3 adaptive IoU change-point cuts
    (:func:`branch_cues.link_cut_change`), then cue-4 one-sided-containment
    detection with two-sided anchored carving
    (:func:`branch_cues.confident_parallel_split`). ``gates`` overrides the
    detection/carve thresholds (see ``branch_cues`` constants)."""
    from . import branch_cues

    lab = np.asarray(labels)
    lab = (lab[0] if lab.ndim == 4 else lab).astype(np.uint32)
    out = lab.copy()
    if component:
        out = component_split(out, energy, min_size)
    if link_cut:
        out, _ = branch_cues.link_cut_change(
            out, drop_thr=drop_thr, w=w, min_size=link_min_size,
            min_frag=min_frag, recover=recover, inplace=True,
        )
    if confident:
        out, _, _ = branch_cues.confident_parallel_split(
            out, host_both=host_both, inplace=True, **(gates or {}),
        )
    out, _ = renumber(out)
    return out


# ---------------------------------------------------------------------------
# branch_merge (reference branch/merge.py — completion :143, mutual-IoU seam
# merge :221, weak-gap bridging :348, orchestration :629). Heuristics follow
# the reference's validated design: IoU is the ranker (seam affinity is only
# a background floor), merges must be mutual best AND beat the runner-up by
# a margin, and weak-gap bridging projects masks along the tube's centroid
# velocity with a caliber-ratio gate. Channel order here is x,y,z (deepem
# high-end; CLAUDE.md) so the z-affinity is channel 2, not 0.
# ---------------------------------------------------------------------------


def _instance_stats(lab: np.ndarray):
    """{id: (z0, z1, y0, y1, x0, x1)} bounding boxes + {id: voxel count}."""
    from scipy import ndimage

    objs = ndimage.find_objects(lab)
    counts = np.bincount(lab.ravel())
    bounds: Dict[int, Tuple[int, int, int, int, int, int]] = {}
    sizes: Dict[int, int] = {}
    for iid, sl in enumerate(objs, start=1):
        if sl is None:
            continue
        bounds[iid] = (
            sl[0].start, sl[0].stop - 1,
            sl[1].start, sl[1].stop - 1,
            sl[2].start, sl[2].stop - 1,
        )
        sizes[iid] = int(counts[iid])
    return bounds, sizes


def _apply_union(lab: np.ndarray, parent: np.ndarray) -> np.ndarray:
    """Path-compress a parent table and relabel in place."""
    for _ in range(3):
        parent = parent[parent]
    return parent[lab]


def complete_fragments(
    lab: np.ndarray, min_size: int = 80, zfrag_iou: float = 0.3
) -> np.ndarray:
    """Absorb small or z-thin fragments into their dominant lateral contact,
    or (failing that) the best-IoU instance on an adjacent slice
    (reference ``complete_sections``, merge.py:143)."""
    from collections import Counter

    bounds, sizes = _instance_stats(lab)
    lut = np.arange(int(lab.max()) + 1, dtype=np.uint32)
    for iid, (z0, z1, y0, y1, x0, x1) in bounds.items():
        if sizes[iid] >= min_size and (z1 - z0 + 1) > 2:
            continue
        # lateral absorption: most-contact large neighbor within the bbox
        contact: Counter = Counter()
        for z in range(z0, z1 + 1):
            win = lab[z, max(y0 - 1, 0) : y1 + 2, max(x0 - 1, 0) : x1 + 2]
            m = win == iid
            if not m.any():
                continue
            ring = binary_dilation(m[None], 1)[0] & ~m
            for nb in np.unique(win[ring]):
                if nb > 0 and nb != iid and sizes.get(int(nb), 0) >= min_size:
                    contact[int(nb)] += int((win[ring] == nb).sum())
        if contact:
            lut[iid] = contact.most_common(1)[0][0]
            continue
        # z-isolated absorption: IoU against the adjacent slice, denominator
        # over the candidate's WHOLE slice area
        zbest = None
        for edge_z, adj_z in ((z0, z0 - 1), (z1, z1 + 1)):
            if not (0 <= adj_z < lab.shape[0]):
                continue
            wy = slice(max(y0 - 1, 0), y1 + 2)
            wx = slice(max(x0 - 1, 0), x1 + 2)
            m = lab[edge_z, wy, wx] == iid
            if not m.any():
                continue
            grown = binary_dilation(m[None], 1)[0]
            adj = lab[adj_z, wy, wx]
            area = int(m.sum())
            for nb in np.unique(adj[grown]):
                nb = int(nb)
                if nb <= 0 or nb == iid or sizes.get(nb, 0) < min_size:
                    continue
                inter = int((m & (adj == nb)).sum())
                nb_area = int((lab[adj_z] == nb).sum())
                iou = inter / max(area + nb_area - inter, 1)
                if iou > zfrag_iou and (zbest is None or iou > zbest[0]):
                    zbest = (iou, nb)
        if zbest:
            lut[iid] = zbest[1]
    return _apply_union(lab, lut)


def merge_mutual_iou(
    lab: np.ndarray,
    aff_z: Optional[np.ndarray],
    merge_iou: float = 0.5,
    margin: float = 0.15,
    aff_lo: float = 0.05,
    min_ov: int = 4,
    min_size: int = 80,
    rounds: int = 3,
) -> np.ndarray:
    """Mutual-best cross-section IoU merge at z-seams. IoU ranks candidates;
    the seam z-affinity only vetoes background-level contacts; the winner
    must beat the runner-up by ``margin`` or the pair stays split
    (reference ``merge_sections``, merge.py:221)."""
    z_size = lab.shape[0]
    for _ in range(rounds):
        bounds, sizes = _instance_stats(lab)
        cands = [i for i in bounds if sizes[i] >= min_size]
        up: Dict[int, Tuple[int, float]] = {}
        down: Dict[int, Tuple[int, float]] = {}
        for a in cands:
            z0, z1, y0, y1, x0, x1 = bounds[a]
            wy, wx = slice(y0, y1 + 1), slice(x0, x1 + 1)
            for end_z, adj_z, store in ((z1, z1 + 1, up), (z0, z0 - 1, down)):
                if not (0 <= adj_z < z_size):
                    continue
                m = lab[end_z, wy, wx] == a
                if not m.any():
                    continue
                grown = binary_dilation(m[None], 1)[0]
                adj = lab[adj_z, wy, wx]
                seam = (
                    aff_z[max(end_z, adj_z), wy, wx] if aff_z is not None else None
                )
                best: List[Tuple[float, float, int]] = []  # (iou, zaff, id)
                for b in np.unique(adj[grown & (adj > 0)]):
                    b = int(b)
                    if b == a:
                        continue
                    bm = adj == b
                    ov = grown & bm
                    if int(ov.sum()) < min_ov:
                        continue
                    if seam is not None:
                        zaff = float(seam[ov].mean())
                        if zaff <= aff_lo:
                            continue
                    else:
                        zaff = 1.0
                    inter = int((m & bm).sum())
                    union = int((m | bm).sum())
                    iou = inter / max(union, 1)
                    if iou > merge_iou:
                        best.append((iou, zaff, b))
                if not best:
                    continue
                best.sort(reverse=True)
                if len(best) > 1 and best[0][0] - best[1][0] < margin:
                    continue  # ambiguous: a false merge costs more than a split
                store[a] = (best[0][2], best[0][0])
        parent = np.arange(int(lab.max()) + 1, dtype=np.uint32)
        merged = 0
        for a, (b, _) in up.items():
            back = down.get(b)
            if back is not None and back[0] == a:
                ra, rb = int(parent[a]), int(parent[b])
                while parent[ra] != ra:
                    ra = int(parent[ra])
                while parent[rb] != rb:
                    rb = int(parent[rb])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                    merged += 1
        if merged == 0:
            break
        lab = _apply_union(lab, parent)
    return lab


def _end_velocity(lab, iid, z_end, direction, bounds, n: int = 4) -> np.ndarray:
    """Centroid drift (dy, dx per z-step) near a tube end."""
    from scipy.ndimage import center_of_mass

    z0, z1, y0, y1, x0, x1 = bounds[iid]
    pts = []
    for k in range(n):
        z = z_end - direction * k
        if not (z0 <= z <= z1):
            continue
        m = lab[z, y0 : y1 + 1, x0 : x1 + 1] == iid
        if m.any():
            pts.append((z, *center_of_mass(m)))
    if len(pts) < 2:
        return np.zeros(2)
    arr = np.asarray(pts, float)
    dz = arr[0, 0] - arr[-1, 0]
    return (arr[0, 1:] - arr[-1, 1:]) / (dz if dz else 1.0)


def bridge_weak_gaps(
    lab: np.ndarray,
    fg_max: Optional[np.ndarray],
    max_gap: int = 4,
    min_iou: float = 0.3,
    weak_lo: float = 0.15,
    cal_ratio: float = 3.0,
    margin: float = 0.1,
    min_size: int = 200,
    dim_tol: int = 1,
    rounds: int = 2,
) -> np.ndarray:
    """Bridge up-to-``max_gap``-slice gaps: project the end section along
    the tube's centroid velocity, match by projected-mask IoU, gate on the
    caliber ratio (voxels per z-slice) of the two tubes, abort after
    ``dim_tol`` consecutive slices of dim foreground, require mutual choice
    + margin (reference ``bridge_weak_gaps``, merge.py:348)."""
    z_size = lab.shape[0]
    for _ in range(rounds):
        bounds, sizes = _instance_stats(lab)
        cands = [i for i in bounds if sizes[i] >= min_size]
        caliber = {
            i: sizes[i] / (bounds[i][1] - bounds[i][0] + 1) for i in cands
        }
        up: Dict[int, int] = {}
        down: Dict[int, int] = {}
        for a in cands:
            for z_end, direction, store in (
                (bounds[a][1], +1, up),
                (bounds[a][0], -1, down),
            ):
                m = lab[z_end] == a
                if not m.any():
                    continue
                vel = _end_velocity(lab, a, z_end, direction, bounds)
                best = None
                runner = 0.0
                dim = 0
                for gap in range(1, max_gap + 1):
                    z = z_end + direction * gap
                    if not (0 <= z < z_size):
                        break
                    # vel is drift per +1 absolute z; the target slice is
                    # z_end + direction*gap, so the projection moves by
                    # vel * direction * gap
                    proj = np.roll(
                        np.roll(m, int(round(vel[0] * direction * gap)), 0),
                        int(round(vel[1] * direction * gap)), 1,
                    )
                    if fg_max is not None:
                        vals = fg_max[z][proj]
                        if vals.size and float(np.percentile(vals, 75)) < weak_lo:
                            dim += 1
                            if dim > dim_tol:
                                break
                        else:
                            dim = 0
                    for b in np.unique(lab[z][proj]):
                        b = int(b)
                        if b <= 0 or b == a:
                            continue
                        cal_b = caliber.get(b)
                        if cal_b is None:
                            continue
                        ratio = caliber[a] / max(cal_b, 1e-6)
                        if not (1.0 / cal_ratio <= ratio <= cal_ratio):
                            continue
                        bm = lab[z] == b
                        iou = int((proj & bm).sum()) / max(int((proj | bm).sum()), 1)
                        if iou >= min_iou:
                            if best is None or iou > best[0]:
                                runner = best[0] if best else runner
                                best = (iou, b)
                            elif iou > runner:
                                runner = iou
                    if best is not None:
                        break
                if best is not None and best[0] - runner >= margin:
                    store[a] = best[1]
        parent = np.arange(int(lab.max()) + 1, dtype=np.uint32)
        merged = 0
        for a, b in up.items():
            if down.get(b) == a:
                ra, rb = int(parent[a]), int(parent[b])
                while parent[ra] != ra:
                    ra = int(parent[ra])
                while parent[rb] != rb:
                    rb = int(parent[rb])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                    merged += 1
        if merged == 0:
            break
        lab = _apply_union(lab, parent)
    return lab


@register_decoder("branch_merge")
def branch_merge(
    labels,
    affinity: Optional[np.ndarray] = None,
    merge_iou: float = 0.5,
    margin: float = 0.15,
    aff_lo: float = 0.05,
    min_ov: int = 4,
    min_size: int = 80,
    rounds: int = 3,
    weak_max_gap: int = 4,
    weak_min_iou: float = 0.3,
    weak_lo: float = 0.15,
    weak_cal_ratio: float = 3.0,
    weak_margin: float = 0.1,
    weak_min_size: int = 200,
    weak_rounds: int = 2,
    # legacy aliases (round-1 API)
    min_overlap: Optional[int] = None,
    max_gap: Optional[int] = None,
    **kw,
):
    """Tube over-segmentation repair: fragment completion, mutual-best-IoU
    seam merging (with runner-up margin and a seam-affinity background
    floor), then velocity-projected weak-gap bridging
    (reference ``branch_merge``, merge.py:629)."""
    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32).copy()
    if min_overlap is not None:
        min_ov = min_overlap
    if max_gap is not None:
        weak_max_gap = max_gap
    aff_z = fg_max = None
    if affinity is not None:
        aff = np.asarray(affinity, np.float32)
        if aff.ndim == 4 and aff.shape[0] >= 3:
            aff_z = aff[2]  # deepem x,y,z order: channel 2 = z-edges
            fg_max = aff[:3].max(axis=0)
        elif aff.ndim == 3:
            aff_z = fg_max = aff
    lab = complete_fragments(lab, min_size=min_size)
    lab = merge_mutual_iou(
        lab, aff_z, merge_iou=merge_iou, margin=margin, aff_lo=aff_lo,
        min_ov=min_ov, min_size=min_size, rounds=rounds,
    )
    lab = bridge_weak_gaps(
        lab, fg_max, max_gap=weak_max_gap, min_iou=weak_min_iou,
        weak_lo=weak_lo, cal_ratio=weak_cal_ratio, margin=weak_margin,
        min_size=weak_min_size, rounds=weak_rounds,
    )
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
    guide_seg: Optional[np.ndarray] = None,
    long_range_channels: Sequence[int] = (3, 4, 5),
    threshold: float = 0.3,
    min_size: int = 100,
    min_parent_voxels: int = 1000,
    min_seed_voxels: int = 200,
    min_seed_overlap_voxels: int = 100,
    min_seed_guide_fraction: float = 0.25,
    min_seeds_in_parent: int = 2,
    max_splits_per_parent: int = 8,
    min_child_voxels: int = 1,
    report_dir: Optional[str] = None,
    **kw,
):
    """False-merge correction from long-range information. Two modes:

    - ``guide_seg`` (reference ``longrange_guided_split.py:534`` bbox-first
      design): a second segmentation decoded from long-range-aware
      affinities supplies seeds. Each large guide label maps to its dominant
      primary parent; parents holding >= ``min_seeds_in_parent`` retained
      seeds are split by nearest-seed assignment inside the parent mask.
    - ``affinity`` fallback: voxels with weak long-range support become cut
      points; pieces re-grow by watershed within the instance.
    """
    if guide_seg is not None:
        return _guided_split_by_seg(
            labels, guide_seg,
            min_parent_voxels=min_parent_voxels,
            min_seed_voxels=min_seed_voxels,
            min_seed_overlap_voxels=min_seed_overlap_voxels,
            min_seed_guide_fraction=min_seed_guide_fraction,
            min_seeds_in_parent=min_seeds_in_parent,
            max_splits_per_parent=max_splits_per_parent,
            min_child_voxels=min_child_voxels,
            report_dir=report_dir,
        )
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


def _guided_split_by_seg(
    primary,
    guide_seg,
    min_parent_voxels: int,
    min_seed_voxels: int,
    min_seed_overlap_voxels: int,
    min_seed_guide_fraction: float,
    min_seeds_in_parent: int,
    max_splits_per_parent: int,
    min_child_voxels: int,
    report_dir: Optional[str] = None,
) -> np.ndarray:
    """bbox-first guide-segmentation split (reference
    ``longrange_guided_split.py:534``): large guide labels map to their
    dominant primary parent; parents with multiple retained seeds are split
    by nearest-seed assignment within the parent mask."""
    from scipy import ndimage

    lab = np.asarray(primary)
    if lab.ndim == 4:
        lab = lab[0]
    lab = lab.astype(np.uint32).copy()
    guide = np.asarray(guide_seg)
    if guide.ndim == 4:
        guide = guide[0]
    guide = guide.astype(np.uint32)

    parent_sizes = np.bincount(lab.ravel())
    guide_bounds, guide_sizes = _instance_stats(guide)
    # map each large guide label to its dominant primary parent
    seeds_by_parent: Dict[int, List[Tuple[int, int]]] = {}  # parent -> [(guide, overlap)]
    for gid, gsize in guide_sizes.items():
        if gsize < min_seed_voxels:
            continue
        z0, z1, y0, y1, x0, x1 = guide_bounds[gid]
        box = (slice(z0, z1 + 1), slice(y0, y1 + 1), slice(x0, x1 + 1))
        gmask = guide[box] == gid
        parents = lab[box][gmask]
        parents = parents[parents > 0]
        if parents.size == 0:
            continue
        counts = np.bincount(parents)
        pid = int(counts.argmax())
        overlap = int(counts[pid])
        if overlap < min_seed_overlap_voxels:
            continue
        if overlap / gsize < min_seed_guide_fraction:
            continue
        seeds_by_parent.setdefault(pid, []).append((gid, overlap))

    rows = []
    next_id = int(lab.max()) + 1
    for pid, seeds in sorted(seeds_by_parent.items()):
        if len(seeds) < min_seeds_in_parent:
            continue
        if int(parent_sizes[pid]) < min_parent_voxels:
            continue
        seeds = sorted(seeds, key=lambda s: -s[1])[:max_splits_per_parent]
        pmask = lab == pid
        box = ndimage.find_objects(pmask.astype(np.uint8))[0]
        pm = pmask[box]
        markers = np.zeros(pm.shape, np.int32)
        for k, (gid, _) in enumerate(seeds, start=1):
            markers[(guide[box] == gid) & pm] = k
        if (markers > 0).sum() == 0:
            continue
        # nearest-seed assignment of every parent voxel (euclidean)
        _, idx = ndimage.distance_transform_edt(markers == 0, return_indices=True)
        assigned = markers[tuple(idx)]
        assigned[~pm] = 0
        # child sizes: keep the largest as pid, relabel the rest
        child_sizes = np.bincount(assigned.ravel())
        order = np.argsort(child_sizes[1:])[::-1] + 1
        produced = 0
        for rank, k in enumerate(order):
            cmask = assigned == k
            n_vox = int(cmask.sum())
            if rank == 0 or n_vox < min_child_voxels:
                continue
            lab[box][cmask] = next_id
            rows.append((pid, seeds[k - 1][0], next_id, n_vox))
            next_id += 1
            produced += 1
    if report_dir and rows:
        import csv
        from pathlib import Path

        out = Path(report_dir)
        out.mkdir(parents=True, exist_ok=True)
        with (out / "longrange_guided_split.csv").open("w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["parent_id", "guide_id", "new_id", "voxels"])
            w.writerows(rows)
    lab, _ = renumber(lab)
    return lab
