"""Affinity prediction QC: strided per-Z health scan, refined Z-cut
detection, XY-border/background cross-check against the raw image, a
markdown report with machine-readable frontmatter, and a streaming
accumulator for chunked pipelines.

Reference: ``connectomics/decoding/qc/affinity.py:24-429`` (params :24,
report :35, accumulator :60, per-z scan :182, z-cut refinement :229, border
rows :267, scan :307, markdown :361). Axis convention here is (C, Z, Y, X)
(volumes are (Z, Y, X) throughout this framework, CLAUDE.md), vs the
reference's Z-last.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

CH_NAMES = ["x", "y", "z"]


@dataclass
class AffinityQCParams:
    """Reference ``AffinityQCParams`` (``qc/affinity.py:24``)."""

    z_stride: int = 10
    k_edge: int = 20
    refine_window: int = 30
    drift_thresh: float = 0.05
    border_width: int = 32
    bg_thresh: float = 30.0
    n_z_border: int = 8


@dataclass
class QCReport:
    """Structured QC output (reference ``AffinityQCReport``, :35)."""

    low_z: int = 0
    high_z: int = 0
    interior_mean: Optional[np.ndarray] = None  # (C,)
    nan_count: int = 0
    inf_count: int = 0
    sampled_voxels: int = 0
    total_voxels: int = 0
    g_mean: Optional[np.ndarray] = None  # (C,)
    g_std: Optional[np.ndarray] = None
    g_min: Optional[np.ndarray] = None
    g_max: Optional[np.ndarray] = None
    z_idx: Optional[np.ndarray] = None  # (S,)
    means: Optional[np.ndarray] = None  # (S, C)
    stds: Optional[np.ndarray] = None  # (S, C)
    border_rows: List[str] = field(default_factory=list)
    # back-compat fields consumed by run_decoding_stage / older tests
    bad_slices: List[int] = field(default_factory=list)
    border_flagged: bool = False
    slice_means: Optional[np.ndarray] = None

    def to_markdown(self, params: Optional[AffinityQCParams] = None, **meta) -> str:
        return render_markdown_report(self, params or AffinityQCParams(), **meta)


def _per_z_scan(pred: np.ndarray, z_stride: int) -> Dict:
    """Strided per-Z channel stats + global accumulators + NaN/Inf counts
    (reference ``_per_z_scan``, :182). pred: (C, Z, Y, X) array-like."""
    c_dim, z_dim = pred.shape[0], pred.shape[1]
    chunks = getattr(pred, "chunks", None)
    block_z = max(chunks[1] if chunks is not None else 32, z_stride)
    z_idx = np.arange(0, z_dim, z_stride, dtype=np.int64)
    means = np.zeros((len(z_idx), c_dim), np.float32)
    stds = np.zeros((len(z_idx), c_dim), np.float32)
    g_sum = np.zeros(c_dim, np.float64)
    g_sq = np.zeros(c_dim, np.float64)
    g_min = np.full(c_dim, np.inf, np.float32)
    g_max = np.full(c_dim, -np.inf, np.float32)
    g_n = 0
    nan_count = inf_count = 0
    for z0 in range(0, z_dim, block_z):
        z1 = min(z0 + block_z, z_dim)
        sel = [(i, z) for i, z in enumerate(z_idx) if z0 <= z < z1]
        if not sel:
            continue
        block = np.asarray(pred[:, z0:z1])
        nan_count += int(np.isnan(block).sum())
        inf_count += int(np.isinf(block).sum())
        for i, z in sel:
            sl = block[:, z - z0].astype(np.float32, copy=False).reshape(c_dim, -1)
            means[i] = sl.mean(axis=1)
            stds[i] = sl.std(axis=1)
            g_sum += sl.sum(axis=1, dtype=np.float64)
            g_sq += np.square(sl, dtype=np.float64).sum(axis=1)
            g_min = np.minimum(g_min, sl.min(axis=1))
            g_max = np.maximum(g_max, sl.max(axis=1))
            g_n += sl.shape[1]
        del block
    return {
        "z_idx": z_idx, "means": means, "stds": stds, "g_sum": g_sum,
        "g_sq": g_sq, "g_min": g_min, "g_max": g_max, "g_n": g_n,
        "nan": nan_count, "inf": inf_count,
    }


def _refine_z_cuts(
    pred, interior_mean: np.ndarray, refine_window: int, drift_thresh: float
) -> Tuple[int, int]:
    """Scan head/tail plane-by-plane for the first/last healthy Z
    (reference ``_refine_z_cuts``, :229)."""
    c_dim, z_dim = pred.shape[0], pred.shape[1]
    cutoff = interior_mean - drift_thresh
    head_end = min(refine_window, z_dim)
    low_z = head_end
    for z in range(head_end):
        m = np.asarray(pred[:, z]).astype(np.float32, copy=False).reshape(c_dim, -1).mean(axis=1)
        if (m >= cutoff).all():
            low_z = z
            break
    tail_start = max(0, z_dim - refine_window)
    last_ok = -1
    for z in range(tail_start, z_dim):
        m = np.asarray(pred[:, z]).astype(np.float32, copy=False).reshape(c_dim, -1).mean(axis=1)
        if (m >= cutoff).all():
            last_ok = z
    high_z = last_ok + 1 if last_ok >= 0 else tail_start
    return low_z, high_z


def _xy_border_rows(
    pred, img, n_z: int, border: int, bg_thresh: float
) -> List[str]:
    """Per-sampled-z border-vs-interior affinity stats on background voxels
    (reference ``_xy_border_rows``, :267). img: (Z, Y, X)."""
    if img is None:
        return ["(skipped - no image provided)"]
    c_dim, z_dim, y_dim, x_dim = pred.shape
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[..., 0]
    if img.shape != (z_dim, y_dim, x_dim):
        return [f"WARN: img shape {img.shape} != pred spatial {(z_dim, y_dim, x_dim)}; skipped."]
    margin = max(int(0.02 * z_dim), 1)
    zs = np.unique(np.linspace(margin, max(z_dim - margin - 1, margin), min(n_z, z_dim), dtype=np.int64))
    border_mask = np.zeros((y_dim, x_dim), bool)
    border_mask[:border, :] = border_mask[-border:, :] = True
    border_mask[:, :border] = border_mask[:, -border:] = True
    interior_mask = ~border_mask
    rows = []
    for z in zs:
        img_yx = img[z]
        bg_border = (img_yx <= bg_thresh) & border_mask
        bg_inter = (img_yx <= bg_thresh) & interior_mask
        n_bg = int(bg_border.sum())
        if n_bg < 100:
            rows.append(f"  z={z:5d}: bg-border voxels={n_bg} (too few)")
            continue
        pred_cyx = np.asarray(pred[:, z]).astype(np.float32)
        parts = [f"z={z:5d} bg_border_n={n_bg:>9,d} bg_int_n={int(bg_inter.sum()):>9,d}"]
        for c in range(c_dim):
            name = CH_NAMES[c] if c < len(CH_NAMES) else f"c{c}"
            v_b = pred_cyx[c][bg_border]
            v_i = pred_cyx[c][bg_inter] if bg_inter.any() else np.zeros(1, np.float32)
            parts.append(
                f"ch{c}({name}): border mu={v_b.mean():.3f}/q95={np.quantile(v_b, 0.95):.3f}"
                f"/p>0.5={float((v_b > 0.5).mean()):.1%} vs int mu={v_i.mean():.3f}"
            )
        rows.append("  " + " | ".join(parts))
    return rows


def scan_prediction(
    pred, img=None, params: Optional[AffinityQCParams] = None
) -> QCReport:
    """Full QC scan (reference ``scan_prediction``, :307).
    pred: (C, Z, Y, X) array-like (h5/zarr dataset friendly); img: (Z, Y, X)."""
    params = params or AffinityQCParams()
    c_dim, z_dim = pred.shape[0], pred.shape[1]
    total = int(np.prod(pred.shape[1:]))
    scan = _per_z_scan(pred, params.z_stride)
    g_n = max(scan["g_n"], 1)
    g_mean = scan["g_sum"] / g_n
    g_std = np.sqrt(np.maximum(scan["g_sq"] / g_n - g_mean**2, 0))
    means = scan["means"]
    interior = means[params.k_edge:-params.k_edge] if len(means) > 2 * params.k_edge + 1 else means
    # nan-robust baseline (a NaN plane must not void the cut logic — the
    # NaN itself is reported separately via nan_count)
    with np.errstate(invalid="ignore"):
        interior_mean = np.nanmean(interior, axis=0)
    low_z, high_z = _refine_z_cuts(pred, interior_mean, params.refine_window, params.drift_thresh)
    border_rows = _xy_border_rows(pred, img, params.n_z_border, params.border_width, params.bg_thresh)
    bad = [int(z) for z in range(z_dim) if z < low_z or z >= high_z]
    return QCReport(
        low_z=low_z, high_z=high_z, interior_mean=interior_mean.astype(np.float32),
        nan_count=scan["nan"], inf_count=scan["inf"],
        sampled_voxels=scan["g_n"], total_voxels=total,
        g_mean=g_mean.astype(np.float32), g_std=g_std.astype(np.float32),
        g_min=scan["g_min"], g_max=scan["g_max"],
        z_idx=scan["z_idx"], means=scan["means"], stds=scan["stds"],
        border_rows=border_rows, bad_slices=bad,
        slice_means=scan["means"].mean(axis=1),
    )


def render_markdown_report(
    report: QCReport,
    params: AffinityQCParams,
    pred_desc: str = "",
    img_desc: str = "",
    mask_path: str = "",
    image_path: str = "",
) -> str:
    """Markdown QC report with machine-readable frontmatter
    (reference ``render_markdown_report``, :361)."""
    c_dim = len(report.g_mean) if report.g_mean is not None else 0
    lines = ["---", f"img: {image_path}", f"out: {mask_path}",
             f"low_z: {report.low_z}", f"high_z: {report.high_z}",
             f"bg_thresh: {params.bg_thresh}", f"border_width: {params.border_width}",
             "---", "", "# Affinity check report"]
    if pred_desc:
        lines.append(f"- pred: {pred_desc}")
    if img_desc:
        lines.append(f"- img:  {img_desc}")
    lines += ["", "## Volume health"]
    lines.append(
        f"- Sampled {report.sampled_voxels:,} / {report.total_voxels:,} voxels per channel "
        f"(~{report.sampled_voxels / max(report.total_voxels, 1):.1%})."
    )
    lines.append(f"- NaN={report.nan_count}, Inf={report.inf_count}")
    lines.append("```")
    for c in range(c_dim):
        name = CH_NAMES[c] if c < len(CH_NAMES) else f"c{c}"
        lines.append(
            f"  ch{c}({name}-aff): mean={report.g_mean[c]:.4f} std={report.g_std[c]:.4f} "
            f"min={report.g_min[c]:.4f} max={report.g_max[c]:.4f}"
        )
    lines.append("```")
    if c_dim:
        spread = float(report.g_mean.max() - report.g_mean.min())
        lines.append(
            f"- Channel-mean spread (max-min): {spread:.4f} "
            f"({'OK' if spread < 0.05 else 'imbalanced'})."
        )
    lines += ["", f"## Derived Z cuts (drift_thresh={params.drift_thresh})"]
    lines.append(
        f"- low_z={report.low_z}, high_z={report.high_z} "
        f"(keep z in [{report.low_z}, {report.high_z}))."
    )
    lines += ["", f"## XY-border + intensity (border={params.border_width}px, "
              f"bg<={params.bg_thresh}, n_z={params.n_z_border})", "```"]
    lines += report.border_rows or ["(not computed)"]
    lines.append("```")
    return "\n".join(lines) + "\n"


def scan_affinity_quality(
    pred: np.ndarray,
    z_mean_drift: float = 0.5,
    border_low_intensity: float = 0.05,
    border_width: int = 8,
    img=None,
    params: Optional[AffinityQCParams] = None,
) -> Tuple[np.ndarray, QCReport]:
    """Keep/drop-mask entry used by ``run_decoding_stage``: full scan (stride
    1 for in-memory volumes), Z-cut mask + legacy median-drift slice flags.

    pred: (C,Z,Y,X). Returns (keep mask (Z,Y,X) float32, report)."""
    p = pred if pred.ndim == 4 else pred[None]
    params = params or AffinityQCParams(
        z_stride=1, drift_thresh=z_mean_drift, border_width=border_width
    )
    report = scan_prediction(p, img=img, params=params)
    # legacy relative-drift slice flags (kept for the decode mask semantics)
    means = report.slice_means
    med = float(np.nanmedian(means))
    bad = [
        int(z) for z in range(means.shape[0])
        if med > 1e-6 and abs(means[z] - med) / med > z_mean_drift
    ]
    report.bad_slices = sorted(set(bad))
    mask = np.ones(p.shape[1:], np.float32)
    for z in report.bad_slices:
        mask[z] = 0.0
    # XY border darkness flag (legacy behavior)
    if border_width > 0 and p.shape[2] > 2 * border_width and p.shape[3] > 2 * border_width:
        border = np.concatenate([
            p[:, :, :border_width, :].ravel(), p[:, :, -border_width:, :].ravel(),
            p[:, :, :, :border_width].ravel(), p[:, :, :, -border_width:].ravel(),
        ])
        report.border_flagged = bool(border.mean() < border_low_intensity)
    return mask, report


def write_qc_report(report: QCReport, path: str | Path, params: Optional[AffinityQCParams] = None, **meta) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(report.to_markdown(params, **meta))
    return path


class StreamingQCAccumulator:
    """Chunk-by-chunk QC during chunked inference/stitching (reference
    ``AffinityQCAccumulator``, ``qc/affinity.py:60``): per-(z, channel)
    sums/sumsq/min/max + NaN/Inf counts; finalize derives the same report as
    the post-save scan at raw stride 1."""

    def __init__(self, z_total: int, channels: int = 1):
        self.c = channels
        self.sum = np.zeros((z_total, channels), np.float64)
        self.sq = np.zeros((z_total, channels), np.float64)
        self.mins = np.full((z_total, channels), np.inf, np.float32)
        self.maxs = np.full((z_total, channels), -np.inf, np.float32)
        self.count = np.zeros(z_total, np.int64)
        self.nan_count = 0
        self.inf_count = 0

    def update(self, chunk: np.ndarray, z_offset: int):
        """chunk: (C, z, Y, X) or (z, Y, X)."""
        ch = chunk if chunk.ndim == 4 else chunk[None]
        if ch.shape[0] != self.c and not self.count.any():
            self.__init__(len(self.count), ch.shape[0])  # infer channels lazily
        self.nan_count += int(np.isnan(ch).sum())
        self.inf_count += int(np.isinf(ch).sum())
        zc = ch.shape[1]
        flat = ch.reshape(ch.shape[0], zc, -1)
        sl = slice(z_offset, z_offset + zc)
        self.sum[sl] += flat.sum(axis=2, dtype=np.float64).T
        self.sq[sl] += np.square(flat, dtype=np.float64).sum(axis=2).T
        self.mins[sl] = np.minimum(self.mins[sl], flat.min(axis=2).T)
        self.maxs[sl] = np.maximum(self.maxs[sl], flat.max(axis=2).T)
        self.count[sl] += flat.shape[2]

    def finalize(
        self, z_mean_drift: float = 0.5, params: Optional[AffinityQCParams] = None
    ) -> QCReport:
        params = params or AffinityQCParams(drift_thresh=z_mean_drift)
        n = np.maximum(self.count, 1)[:, None]
        means = (self.sum / n).astype(np.float32)
        stds = np.sqrt(np.maximum(self.sq / n - means.astype(np.float64) ** 2, 0)).astype(np.float32)
        seen = self.count > 0
        g_n = int(self.count.sum())
        g_mean = self.sum.sum(axis=0) / max(g_n, 1)
        g_std = np.sqrt(np.maximum(self.sq.sum(axis=0) / max(g_n, 1) - g_mean**2, 0))
        ch_means = means.mean(axis=1)
        med = float(np.median(ch_means[seen])) if seen.any() else 0.0
        bad = [
            int(z) for z in range(len(ch_means))
            if seen[z] and med > 1e-6 and abs(ch_means[z] - med) / med > z_mean_drift
        ]
        interior = means[seen][params.k_edge:-params.k_edge] if seen.sum() > 2 * params.k_edge + 1 else means[seen]
        interior_mean = interior.mean(axis=0) if len(interior) else np.zeros(self.c, np.float32)
        cutoff = interior_mean - params.drift_thresh
        ok = seen & (means >= cutoff[None]).all(axis=1)
        low_z = int(np.argmax(ok)) if ok.any() else 0
        high_z = int(len(ok) - np.argmax(ok[::-1])) if ok.any() else len(ok)
        return QCReport(
            low_z=low_z, high_z=high_z, interior_mean=interior_mean,
            nan_count=self.nan_count, inf_count=self.inf_count,
            sampled_voxels=g_n, total_voxels=g_n,
            g_mean=g_mean.astype(np.float32), g_std=g_std.astype(np.float32),
            g_min=self.mins.min(axis=0), g_max=self.maxs.max(axis=0),
            z_idx=np.arange(len(ch_means)), means=means, stds=stds,
            bad_slices=bad, slice_means=ch_means,
        )
