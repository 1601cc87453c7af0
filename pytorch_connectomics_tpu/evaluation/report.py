"""Metrics report writers: per-volume metrics.txt/metrics.json, per-instance
tube dumps (npz), and the cross-volume aggregation written after the last
volume (reference ``connectomics/evaluation/report.py``: per-volume :122-289,
tube instances :50-120, epoch-end aggregation :374-430 — here "epoch end" is
simply after every test volume has been evaluated, no Lightning involved)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def write_metrics_report(output_dir: str | Path, volume_name: str, metrics: Dict[str, float]):
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    lines = [f"# metrics for {volume_name}"]
    for k, v in sorted(metrics.items()):
        lines.append(f"{k}: {v:.6f}")
    (out / f"{volume_name}_metrics.txt").write_text("\n".join(lines) + "\n")
    json_path = out / "metrics.json"
    existing = json.loads(json_path.read_text()) if json_path.exists() else {}
    existing[volume_name] = metrics
    json_path.write_text(json.dumps(existing, indent=2))
    return out / f"{volume_name}_metrics.txt"


def save_tube_instances(
    output_dir: str | Path,
    tag: str,
    per_instance: Dict[int, Dict[str, float]],
    volume_shape: Optional[tuple] = None,
    config: Optional[Dict[str, Any]] = None,
) -> Path:
    """Columnar npz dump of per-tube QC records
    (``metrics.tube.tube_instance_qc`` output; reference
    ``_save_tube_instances``, report.py:50)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"eval_{tag}_tube_instances.npz"
    labels = sorted(per_instance)
    payload: Dict[str, np.ndarray] = {
        "label": np.asarray(labels, np.uint64),
    }
    fields = sorted({k for rec in per_instance.values() for k in rec})
    for f in fields:
        payload[f] = np.asarray(
            [per_instance[l].get(f, np.nan) for l in labels], np.float64
        )
    if volume_shape is not None:
        payload["volume_shape"] = np.asarray(volume_shape, np.uint64)
    if config:
        payload.update({f"config_{k}": np.asarray(v) for k, v in config.items()})
    np.savez_compressed(path, **payload)
    return path


def aggregate_metrics_summary(output_dir: str | Path) -> Optional[Path]:
    """Cross-volume aggregation (mean/median/min/max per metric) from the
    accumulated metrics.json — the test-epoch-end report
    (reference ``log_test_epoch_metrics``, report.py:374)."""
    out = Path(output_dir)
    json_path = out / "metrics.json"
    if not json_path.exists():
        return None
    per_volume: Dict[str, Dict[str, float]] = json.loads(json_path.read_text())
    if not per_volume:
        return None
    metric_names = sorted({k for m in per_volume.values() for k in m})
    summary: Dict[str, Dict[str, float]] = {}
    for name in metric_names:
        vals = np.asarray(
            [m[name] for m in per_volume.values() if name in m], np.float64
        )
        summary[name] = {
            "mean": float(vals.mean()),
            "median": float(np.median(vals)),
            "min": float(vals.min()),
            "max": float(vals.max()),
            "n_volumes": int(len(vals)),
        }
    (out / "metrics_summary.json").write_text(json.dumps(summary, indent=2))
    lines = [f"# aggregated test metrics ({len(per_volume)} volumes)"]
    for name, s in summary.items():
        lines.append(
            f"{name}: mean={s['mean']:.6f} median={s['median']:.6f} "
            f"min={s['min']:.6f} max={s['max']:.6f} (n={s['n_volumes']})"
        )
    (out / "metrics_summary.txt").write_text("\n".join(lines) + "\n")
    return out / "metrics_summary.json"
