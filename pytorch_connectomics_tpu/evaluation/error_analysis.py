"""Segmentation error analysis: split/merge attribution, size statistics,
dust-removal sweeps, oracle studies, and skeleton-ownership summaries.

Reference: ``scripts/error_analysis_seg_dense.py`` (size stats :57, overlap
:84, split/merge counting :184, oracle study :327, dust sweep :358) and
``scripts/error_analysis_seg_nerl.py`` (skeleton ownership :309,
z-discontinuity scan :205).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..metrics.seg import adapted_rand, voi


def segment_size_stats(seg: np.ndarray) -> Dict[str, float]:
    """Distribution statistics over non-background segment sizes."""
    ids, counts = np.unique(seg[seg > 0], return_counts=True)
    if len(counts) == 0:
        return {"num_segments": 0}
    counts = np.sort(counts)
    return {
        "num_segments": int(len(ids)),
        "total_voxels": int(counts.sum()),
        "min_size": int(counts[0]),
        "max_size": int(counts[-1]),
        "median_size": float(np.median(counts)),
        "mean_size": float(counts.mean()),
        "p10_size": float(np.percentile(counts, 10)),
        "p90_size": float(np.percentile(counts, 90)),
        "tiny_fraction": float((counts < 100).mean()),
    }


def _overlap_matrix(seg: np.ndarray, gt: np.ndarray):
    """Sparse contingency between prediction and GT labels (0 excluded)."""
    m = (seg > 0) & (gt > 0)
    pair = seg[m].astype(np.uint64) << np.uint64(32) | gt[m].astype(np.uint64)
    pairs, counts = np.unique(pair, return_counts=True)
    sid = (pairs >> np.uint64(32)).astype(np.int64)
    gid = (pairs & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return sid, gid, counts.astype(np.int64)


def split_merge_attribution(
    seg: np.ndarray, gt: np.ndarray, top: int = 20, min_overlap: int = 50
) -> Dict[str, Any]:
    """Per-instance split/merge attribution from the contingency table
    (reference ``count_split_merge_errors``, ``error_analysis_seg_dense.py:184``).

    A GT instance is *split* when >1 prediction segments own ≥``min_overlap``
    voxels of it; a prediction segment is a *merger* when it owns
    ≥``min_overlap`` voxels of >1 GT instances.
    """
    sid, gid, counts = _overlap_matrix(seg, gt)
    keep = counts >= min_overlap
    sid, gid, counts = sid[keep], gid[keep], counts[keep]

    splits: Dict[int, List[Tuple[int, int]]] = {}
    for g in np.unique(gid):
        rows = gid == g
        if rows.sum() > 1:
            owners = sorted(
                zip(sid[rows].tolist(), counts[rows].tolist()), key=lambda t: -t[1]
            )
            splits[int(g)] = owners
    merges: Dict[int, List[Tuple[int, int]]] = {}
    for s in np.unique(sid):
        rows = sid == s
        if rows.sum() > 1:
            victims = sorted(
                zip(gid[rows].tolist(), counts[rows].tolist()), key=lambda t: -t[1]
            )
            merges[int(s)] = victims

    def _rank(d):
        return sorted(d.items(), key=lambda kv: -len(kv[1]))[:top]

    return {
        "num_split_gt": len(splits),
        "num_merge_segments": len(merges),
        "worst_splits": [
            {"gt_id": g, "n_fragments": len(o), "fragments": o[:8]} for g, o in _rank(splits)
        ],
        "worst_merges": [
            {"segment_id": s, "n_gt": len(v), "gt_overlaps": v[:8]} for s, v in _rank(merges)
        ],
    }


def dust_removal_sweep(
    seg: np.ndarray, gt: np.ndarray, thresholds: Sequence[int] = (0, 50, 100, 200, 500, 1000)
) -> List[Dict[str, float]]:
    """Score the segmentation after removing segments below each size
    threshold (reference ``dust_removal_sweep``,
    ``error_analysis_seg_dense.py:358``)."""
    ids, counts = np.unique(seg, return_counts=True)
    out = []
    for thr in thresholds:
        drop = set(ids[(counts < thr) & (ids > 0)].tolist())
        if drop:
            cleaned = np.where(np.isin(seg, list(drop)), 0, seg)
        else:
            cleaned = seg
        vs, vm = voi(cleaned, gt)
        out.append(
            {
                "min_size": int(thr),
                "segments_removed": len(drop),
                "adapted_rand": float(adapted_rand(cleaned, gt)),
                "voi_split": float(vs),
                "voi_merge": float(vm),
            }
        )
    return out


def oracle_study(seg: np.ndarray, gt: np.ndarray, top_k: int = 20) -> Dict[str, Any]:
    """How much would fixing the top-k merge errors help?
    (reference ``oracle_study``, ``error_analysis_seg_dense.py:327``).

    Each prediction segment overlapping multiple GT instances is re-split
    along GT boundaries, worst offenders first; metrics are re-scored after
    each fix."""
    base_vs, base_vm = voi(seg, gt)
    report: Dict[str, Any] = {
        "baseline": {
            "adapted_rand": float(adapted_rand(seg, gt)),
            "voi_split": float(base_vs),
            "voi_merge": float(base_vm),
        }
    }
    sid, gid, counts = _overlap_matrix(seg, gt)
    # rank merge segments by wasted mass (second-largest+ GT overlap)
    merge_cost: Dict[int, int] = {}
    for s in np.unique(sid):
        rows = sid == s
        if rows.sum() > 1:
            c = np.sort(counts[rows])[::-1]
            merge_cost[int(s)] = int(c[1:].sum())
    worst = [s for s, _ in sorted(merge_cost.items(), key=lambda kv: -kv[1])[:top_k]]
    fixed = seg.astype(np.int64).copy()
    next_id = int(fixed.max()) + 1
    for s in worst:
        m = fixed == s
        for g in np.unique(gt[m]):
            if g == 0:
                continue
            fixed[m & (gt == g)] = next_id
            next_id += 1
    vs, vm = voi(fixed, gt)
    report[f"after_top{top_k}_merge_fixes"] = {
        "adapted_rand": float(adapted_rand(fixed, gt)),
        "voi_split": float(vs),
        "voi_merge": float(vm),
        "segments_resplit": len(worst),
    }
    return report


def scan_z_discontinuities(seg: np.ndarray, top: int = 10) -> List[Dict[str, Any]]:
    """Find z-boundaries where segment ownership changes abruptly —
    stitching/misalignment errors show up as low Jaccard between adjacent
    slices (reference ``scan_z_discontinuities``,
    ``error_analysis_seg_nerl.py:205``)."""
    rows = []
    for z in range(seg.shape[0] - 1):
        a, b = seg[z], seg[z + 1]
        fg = (a > 0) | (b > 0)
        if not fg.any():
            continue
        agree = float(((a == b) & fg).sum() / fg.sum())
        rows.append({"z": int(z), "slice_agreement": agree})
    rows.sort(key=lambda r: r["slice_agreement"])
    return rows[:top]


def skeleton_ownership(
    seg: np.ndarray,
    skeletons: Dict[int, Any],
    false_merge_threshold: int = 2,
) -> List[Dict[str, Any]]:
    """Per-skeleton segment-ownership summary: which prediction segments the
    skeleton nodes fall in, fragmentation count, and whether its dominant
    segment also dominates other skeletons (merge evidence)
    (reference ``summarize_skeleton_ownership``,
    ``error_analysis_seg_nerl.py:309``)."""
    dominant: Dict[int, List[int]] = {}
    per_skel = []
    for sk_id, sk in skeletons.items():
        coords = np.clip(
            np.round(np.asarray(sk.nodes)).astype(int),
            0,
            np.asarray(seg.shape) - 1,
        )
        owners = seg[coords[:, 0], coords[:, 1], coords[:, 2]]
        ids, counts = np.unique(owners[owners > 0], return_counts=True)
        if len(ids) == 0:
            per_skel.append({"skeleton": int(sk_id), "status": "unsegmented"})
            continue
        dom = int(ids[np.argmax(counts)])
        dominant.setdefault(dom, []).append(int(sk_id))
        per_skel.append(
            {
                "skeleton": int(sk_id),
                "n_nodes": int(len(owners)),
                "n_segments": int(len(ids)),
                "dominant_segment": dom,
                "dominant_fraction": float(counts.max() / counts.sum()),
                "fragments": sorted(
                    zip(ids.tolist(), counts.tolist()), key=lambda t: -t[1]
                )[:8],
            }
        )
    # merge evidence: one segment dominating several skeletons
    merged_by = {
        seg_id: skels
        for seg_id, skels in dominant.items()
        if len(skels) >= false_merge_threshold
    }
    for row in per_skel:
        dom = row.get("dominant_segment")
        if dom in merged_by:
            row["merged_with_skeletons"] = [
                s for s in merged_by[dom] if s != row["skeleton"]
            ]
    return per_skel


def analyze_segmentation(
    seg: np.ndarray,
    gt: np.ndarray,
    top: int = 20,
    oracle: bool = False,
    dust: bool = False,
    z_scan: bool = False,
) -> Dict[str, Any]:
    """Full dense error-analysis report."""
    from ..metrics.seg import instance_matching

    vs, vm = voi(seg, gt)
    report: Dict[str, Any] = {
        "adapted_rand": float(adapted_rand(seg, gt)),
        "voi_split": float(vs),
        "voi_merge": float(vm),
        "matching": instance_matching(seg, gt),
        "pred_stats": segment_size_stats(seg),
        "gt_stats": segment_size_stats(gt),
    }
    report.update(split_merge_attribution(seg, gt, top=top))
    if oracle:
        report["oracle"] = oracle_study(seg, gt, top_k=top)
    if dust:
        report["dust_sweep"] = dust_removal_sweep(seg, gt)
    if z_scan:
        report["z_discontinuities"] = scan_z_discontinuities(seg)
    return report
