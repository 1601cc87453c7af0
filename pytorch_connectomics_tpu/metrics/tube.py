"""GT-free QC of tube-like instances + skeleton-mask metrics + curvilinear
file-pair evaluation.

Reference: ``connectomics/metrics/tube.py:120`` / ``evaluation/tube.py``
(border patches, multi-component sections, bump detection; thresholds
``schema/evaluation.py:8-27``), ``metrics/metrics_skel.py:31-169`` (skeleton
precision/recall/IoU), ``evaluation/curvilinear.py:24``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def tube_instance_qc(
    labels: np.ndarray,
    min_length: int = 8,
    max_components_ratio: float = 0.1,
    border_patch_max: int = 64,
    bump_ratio: float = 3.0,
) -> Dict[int, Dict[str, float]]:
    """Per-instance tube quality flags (no ground truth needed):
    - short: z-extent below ``min_length`` (likely a fragment)
    - border_patch: tiny instance touching the volume border
    - multi_component: fraction of sections with >1 2-D component
    - bump: max section area / median section area above ``bump_ratio``
    """
    from ..decoding.branch import section_components

    lab = np.asarray(labels)
    if lab.ndim == 4:
        lab = lab[0]
    report: Dict[int, Dict[str, float]] = {}
    sections = section_components(lab)
    areas: Dict[int, List[int]] = {}
    zs: Dict[int, List[int]] = {}
    for z in range(lab.shape[0]):
        ids, counts = np.unique(lab[z], return_counts=True)
        for iid, c in zip(ids.tolist(), counts.tolist()):
            if iid == 0:
                continue
            areas.setdefault(int(iid), []).append(int(c))
            zs.setdefault(int(iid), []).append(z)
    # ids touching the in-plane volume border, in one pass
    border_ids = set(np.unique(lab[:, 0, :]).tolist())
    border_ids |= set(np.unique(lab[:, -1, :]).tolist())
    border_ids |= set(np.unique(lab[:, :, 0]).tolist())
    border_ids |= set(np.unique(lab[:, :, -1]).tolist())
    for iid, zlist in zs.items():
        a = np.array(areas[iid])
        length = max(zlist) - min(zlist) + 1
        multi = sum(1 for z in zlist if sections[z].get(iid, 1) > 1)
        touches_border = iid in border_ids
        report[iid] = {
            "length": float(length),
            "voxels": float(a.sum()),
            "short": float(length < min_length),
            "border_patch": float(touches_border and a.sum() <= border_patch_max),
            "multi_component_ratio": multi / max(1, len(zlist)),
            "multi_component": float(multi / max(1, len(zlist)) > max_components_ratio),
            "bump": float(a.max() / max(1.0, np.median(a)) > bump_ratio),
        }
    return report


def tube_qc_summary(labels: np.ndarray, **kw) -> Dict[str, float]:
    per = tube_instance_qc(labels, **kw)
    if not per:
        return {"n_instances": 0.0}
    flags = ("short", "border_patch", "multi_component", "bump")
    out = {"n_instances": float(len(per))}
    for f in flags:
        out[f"n_{f}"] = float(sum(v[f] for v in per.values()))
    return out


# -- skeleton-mask metrics (reference metrics_skel.py) -----------------------


def skeleton_mask_metrics(
    pred_skel: np.ndarray, gt_skel: np.ndarray, tolerance: int = 2
) -> Dict[str, float]:
    """Precision/recall/F1/IoU of skeleton voxel masks with distance
    tolerance (a predicted skeleton voxel within ``tolerance`` of GT counts
    as correct)."""
    from scipy import ndimage

    p = np.asarray(pred_skel) > 0
    g = np.asarray(gt_skel) > 0
    if not p.any() or not g.any():
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0, "iou": 0.0}
    d_g = ndimage.distance_transform_edt(~g)
    d_p = ndimage.distance_transform_edt(~p)
    tp_p = (p & (d_g <= tolerance)).sum()
    tp_g = (g & (d_p <= tolerance)).sum()
    precision = tp_p / p.sum()
    recall = tp_g / g.sum()
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    inter = (p & g).sum()
    union = (p | g).sum()
    return {
        "precision": float(precision),
        "recall": float(recall),
        "f1": float(f1),
        "iou": float(inter / union),
    }


# -- curvilinear file-pair evaluation (reference evaluation/curvilinear.py) --


def curvilinear_f1(pred_mask: np.ndarray, gt_mask: np.ndarray, tolerance: int = 2) -> Dict[str, float]:
    """Tolerance-F1 for fiber/curvilinear masks (same machinery as skeleton
    metrics — masks are thin structures)."""
    return skeleton_mask_metrics(pred_mask, gt_mask, tolerance)


def evaluate_curvilinear_pairs(
    pred_paths: Sequence[str], gt_paths: Sequence[str], tolerance: int = 2
) -> Dict[str, Dict[str, float]]:
    from ..data.io import read_volume

    out = {}
    for p, g in zip(pred_paths, gt_paths):
        from pathlib import Path

        out[Path(p).stem] = curvilinear_f1(read_volume(p) > 0, read_volume(g) > 0, tolerance)
    return out
