"""Evaluation stage: metric dispatch over decoded predictions vs GT.

Reference: ``connectomics/evaluation/stage.py:28`` +
``metric_execution.py:78,166`` (instance metrics via adapted_rand/VOI/
instance-F1, binary via jaccard/dice/accuracy) + ``report.py:295``.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..config.schema import EvaluationConfig
from ..metrics import (
    adapted_rand,
    average_precision,
    binary_accuracy,
    compute_nerl,
    dice_coefficient,
    instance_matching,
    jaccard_index,
    voi,
)

logger = logging.getLogger(__name__)

_BINARY_METRICS = {"jaccard", "dice", "accuracy"}
_INSTANCE_METRICS = {"adapted_rand", "voi", "instance_f1", "ap", "nerl", "panoptic_quality"}


def compute_test_metrics(
    prediction: Optional[np.ndarray],
    decoded: Optional[np.ndarray],
    gt: np.ndarray,
    metrics: Sequence[str],
    nerl_cfg: Optional[Dict[str, Any]] = None,
) -> Dict[str, float]:
    """``prediction``: probability map (Z,Y,X,C) or (C,Z,Y,X) for binary
    metrics; ``decoded``: instance labels (Z,Y,X) for instance metrics."""
    out: Dict[str, float] = {}
    gt = np.asarray(gt)
    if gt.ndim == 4:
        gt = gt[0] if gt.shape[0] < gt.shape[-1] else gt[..., 0]
    for metric in metrics:
        m = metric.lower()
        if m in _BINARY_METRICS:
            if prediction is None:
                continue
            p = np.asarray(prediction)
            if p.ndim == 4:
                p = p[..., 0] if p.shape[-1] < p.shape[0] else p[0]
            pb = (p > 0.5).astype(np.float32)
            gb = (gt > 0).astype(np.float32)
            if m == "jaccard":
                out["jaccard"] = float(jaccard_index(pb, gb, from_logits=False))
            elif m == "dice":
                out["dice"] = float(dice_coefficient(pb, gb, from_logits=False))
            else:
                out["accuracy"] = float(binary_accuracy(pb, gb, from_logits=False))
        elif m in _INSTANCE_METRICS:
            if decoded is None:
                continue
            seg = np.asarray(decoded)
            if m == "adapted_rand":
                out["adapted_rand"] = float(adapted_rand(seg, gt))
            elif m == "voi":
                vs, vm = voi(seg, gt)
                out["voi_split"], out["voi_merge"], out["voi"] = vs, vm, vs + vm
            elif m == "instance_f1":
                stats = instance_matching(seg, gt)
                out["instance_f1"] = stats["f1"]
                out["instance_precision"] = stats["precision"]
                out["instance_recall"] = stats["recall"]
            elif m == "panoptic_quality":
                out["panoptic_quality"] = instance_matching(seg, gt)["panoptic_quality"]
            elif m == "ap":
                out["ap"] = float(average_precision(seg, gt))
            elif m == "nerl":
                kw = dict(nerl_cfg or {})
                res = compute_nerl(seg, gt, anisotropy=kw.get("anisotropy", (1, 1, 1)))
                out["nerl"], out["erl"] = res["nerl"], res["erl"]
        else:
            logger.warning("unknown metric '%s' skipped", metric)
    return out


def run_evaluation_stage(
    prediction: Optional[np.ndarray],
    decoded: Optional[np.ndarray],
    gt: np.ndarray,
    cfg: EvaluationConfig,
    output_dir: Optional[str] = None,
    volume_name: str = "volume",
) -> Dict[str, float]:
    if not cfg.enabled or not cfg.metrics:
        return {}
    results = compute_test_metrics(prediction, decoded, gt, cfg.metrics, cfg.nerl)
    if "tube" in [m.lower() for m in cfg.metrics] and decoded is not None:
        from ..metrics.tube import tube_instance_qc, tube_qc_summary

        kw = dict(cfg.tube or {})
        results.update(
            {f"tube_{k}": v for k, v in tube_qc_summary(decoded, **kw).items()}
        )
        if output_dir:
            from .report import save_tube_instances

            save_tube_instances(
                output_dir, volume_name, tube_instance_qc(decoded, **kw),
                volume_shape=np.asarray(decoded).shape, config=kw,
            )
    logger.info("evaluation[%s]: %s", volume_name, {k: round(v, 4) for k, v in results.items()})
    if output_dir:
        from .report import write_metrics_report

        write_metrics_report(output_dir, volume_name, results)
    return results
