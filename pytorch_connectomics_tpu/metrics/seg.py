"""Instance-segmentation metrics: adapted Rand error, variation of
information, Hungarian-matched instance F1/accuracy.

Reference: ``connectomics/metrics/segmentation_numpy.py`` (adapted_rand:143,
voi:220, instance_matching:621) — same definitions (ISBI/SNEMI convention:
label 0 = background/boundary is ignored in the contingency table).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from scipy import sparse


def _contingency(seg: np.ndarray, gt: np.ndarray, ignore_zero=True):
    s = np.asarray(seg).ravel().astype(np.int64)
    g = np.asarray(gt).ravel().astype(np.int64)
    if ignore_zero:
        keep = g > 0
        s, g = s[keep], g[keep]
    n = s.size
    if n == 0:
        return None, 0
    cont = sparse.csr_matrix(
        (np.ones(n, np.float64), (g, s)),
        shape=(int(g.max()) + 1, int(s.max()) + 1),
    )
    return cont, n


def adapted_rand(seg: np.ndarray, gt: np.ndarray, all_stats: bool = False):
    """Adapted Rand error (1 - maximal F-score of the Rand index; lower is
    better), the SNEMI3D contest definition (``segmentation_numpy.py:143``).

    Score-compatible with the reference: gt label 0 rows are excluded, the
    seg==0 column is NOT a regular segment — its mass enters precision and
    the pair sum only via the ``sum(c)/n`` correction terms — and no ``-n``
    self-pair subtraction is applied.
    """
    seg = np.asarray(seg)
    gt = np.asarray(gt)
    if seg.shape != gt.shape:
        raise ValueError(f"shape mismatch: seg {seg.shape} vs gt {gt.shape}")
    g = gt.ravel().astype(np.int64)
    s = seg.ravel().astype(np.int64)
    n = g.size
    if n == 0:
        return (0.0, 1.0, 1.0) if all_stats else 0.0

    cont = sparse.csr_matrix(
        (np.ones(n, np.float64), (g, s)),
        shape=(int(g.max()) + 1, int(s.max()) + 1),
    )
    body = cont[1:, :]  # drop gt==0 row(s)
    inner = body[:, 1:]  # gt>0 x seg>0 block
    zero_col = np.asarray(body[:, 0].todense()).ravel()  # gt>0 voxels with seg==0

    a_i = np.asarray(body.sum(axis=1)).ravel()  # gt segment sizes (gt>0 voxels)
    b_j = np.asarray(inner.sum(axis=0)).ravel()  # seg segment sizes over gt>0

    zcorr = zero_col.sum() / n
    sum_a = float((a_i**2).sum())
    sum_b = float((b_j**2).sum()) + zcorr
    sum_ab = float((inner.data**2).sum()) + zcorr

    if sum_a == 0 or sum_b == 0:
        return (0.0, 1.0, 1.0) if all_stats else 0.0
    precision = sum_ab / sum_b
    recall = sum_ab / sum_a
    fscore = 2.0 * precision * recall / (precision + recall) if precision + recall else 0.0
    are = 1.0 - fscore
    if all_stats:
        return are, precision, recall
    return are


def voi(seg: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """Variation of information -> (voi_split, voi_merge); lower is better
    (``segmentation_numpy.py:220``)."""
    cont, n = _contingency(seg, gt)
    if cont is None:
        return 0.0, 0.0
    p = cont / n
    pi = np.asarray(p.sum(axis=1)).ravel()  # gt marginal
    pj = np.asarray(p.sum(axis=0)).ravel()  # seg marginal
    pij = p.data

    def plogp(x):
        x = x[x > 0]
        return (x * np.log2(x)).sum()

    h_gt = -plogp(pi)
    h_seg = -plogp(pj)
    h_joint = -plogp(pij)
    # VOI split = H(seg|gt) ; VOI merge = H(gt|seg)
    voi_split = h_joint - h_gt
    voi_merge = h_joint - h_seg
    return float(voi_split), float(voi_merge)


def instance_matching(
    seg: np.ndarray, gt: np.ndarray, iou_threshold: float = 0.5
) -> Dict[str, float]:
    """Stardist-style matched instance stats: Hungarian assignment on IoU
    (``segmentation_numpy.py:621``). Returns tp/fp/fn, precision/recall/f1,
    mean matched IoU, and panoptic quality."""
    from scipy.optimize import linear_sum_assignment

    s = np.asarray(seg).astype(np.int64)
    g = np.asarray(gt).astype(np.int64)
    s_ids = np.unique(s)
    s_ids = s_ids[s_ids > 0]
    g_ids = np.unique(g)
    g_ids = g_ids[g_ids > 0]
    if len(s_ids) == 0 or len(g_ids) == 0:
        tp = 0
        matched_iou = []
    else:
        cont, _ = _contingency(s, g, ignore_zero=False)
        cont = cont.tocoo()
        s_sizes = np.bincount(s.ravel())
        g_sizes = np.bincount(g.ravel())
        iou = np.zeros((len(g_ids), len(s_ids)))
        g_index = {int(v): i for i, v in enumerate(g_ids)}
        s_index = {int(v): i for i, v in enumerate(s_ids)}
        for gi, si, inter in zip(cont.row, cont.col, cont.data):
            if gi == 0 or si == 0:
                continue
            union = g_sizes[gi] + s_sizes[si] - inter
            iou[g_index[gi], s_index[si]] = inter / union
        rows, cols = linear_sum_assignment(-iou)
        matched_iou = [iou[r, c] for r, c in zip(rows, cols) if iou[r, c] >= iou_threshold]
        tp = len(matched_iou)
    fp = len(s_ids) - tp
    fn = len(g_ids) - tp
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    mean_iou = float(np.mean(matched_iou)) if matched_iou else 0.0
    pq = f1 * mean_iou
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": precision, "recall": recall, "f1": f1,
        "mean_matched_iou": mean_iou, "panoptic_quality": pq,
    }


def average_precision(
    seg: np.ndarray, gt: np.ndarray, thresholds=(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95)
) -> float:
    """COCO-style AP over IoU thresholds (MitoEM AP convention)."""
    aps = []
    for t in thresholds:
        m = instance_matching(seg, gt, t)
        denom = m["tp"] + m["fp"] + m["fn"]
        aps.append(m["tp"] / denom if denom else 1.0)
    return float(np.mean(aps))
