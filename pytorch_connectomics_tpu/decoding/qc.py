"""Affinity prediction QC: scan for bad Z-slabs and dark XY borders, build a
keep/drop mask + markdown report.

Reference: ``connectomics/decoding/qc/affinity.py:60-429`` (per-slice mean
drift scan, border low-intensity check, streaming accumulator variant).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class QCReport:
    bad_slices: List[int] = field(default_factory=list)
    border_flagged: bool = False
    slice_means: Optional[np.ndarray] = None

    def to_markdown(self) -> str:
        lines = ["# Affinity QC report", ""]
        lines.append(f"- bad z-slices: {self.bad_slices or 'none'}")
        lines.append(f"- dark border flagged: {self.border_flagged}")
        if self.slice_means is not None:
            lines.append(f"- slice mean range: [{self.slice_means.min():.4f}, {self.slice_means.max():.4f}]")
        return "\n".join(lines)


def scan_affinity_quality(
    pred: np.ndarray,
    z_mean_drift: float = 0.5,
    border_low_intensity: float = 0.05,
    border_width: int = 8,
) -> Tuple[np.ndarray, QCReport]:
    """pred: (C,Z,Y,X). Returns (keep mask (Z,Y,X) float32, report).

    A z-slice is bad when its mean deviates from the median slice mean by
    more than ``z_mean_drift`` (relative)."""
    p = pred if pred.ndim == 4 else pred[None]
    means = p.mean(axis=(0, 2, 3))  # per-z
    med = float(np.median(means))
    bad = [
        int(z)
        for z in range(means.shape[0])
        if med > 1e-6 and abs(means[z] - med) / med > z_mean_drift
    ]
    mask = np.ones(p.shape[1:], dtype=np.float32)
    for z in bad:
        mask[z] = 0.0
    # XY border darkness
    border_flag = False
    if border_width > 0 and p.shape[2] > 2 * border_width and p.shape[3] > 2 * border_width:
        border = np.concatenate([
            p[:, :, :border_width, :].ravel(),
            p[:, :, -border_width:, :].ravel(),
            p[:, :, :, :border_width].ravel(),
            p[:, :, :, -border_width:].ravel(),
        ])
        if border.mean() < border_low_intensity:
            border_flag = True
    report = QCReport(bad_slices=bad, border_flagged=border_flag, slice_means=means)
    return mask, report


class StreamingQCAccumulator:
    """Streaming variant fed chunk-by-chunk during chunked stitching
    (reference ``qc/affinity.py:429``)."""

    def __init__(self, z_total: int):
        self.sum = np.zeros(z_total, np.float64)
        self.count = np.zeros(z_total, np.int64)

    def update(self, chunk: np.ndarray, z_offset: int):
        c = chunk if chunk.ndim == 4 else chunk[None]
        s = c.sum(axis=(0, 2, 3))
        n = c.shape[0] * c.shape[2] * c.shape[3]
        self.sum[z_offset : z_offset + c.shape[1]] += s
        self.count[z_offset : z_offset + c.shape[1]] += n

    def finalize(self, z_mean_drift: float = 0.5) -> QCReport:
        means = self.sum / np.maximum(self.count, 1)
        med = float(np.median(means[self.count > 0]))
        bad = [
            int(z)
            for z in range(means.shape[0])
            if self.count[z] > 0 and med > 1e-6 and abs(means[z] - med) / med > z_mean_drift
        ]
        return QCReport(bad_slices=bad, slice_means=means)
