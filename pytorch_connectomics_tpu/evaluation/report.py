"""Metrics report writer -> metrics.txt + metrics.json per volume
(reference ``connectomics/evaluation/report.py:122-289``)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict


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
