"""Training visualization: slice-grid images of input / label / prediction.

Parity with the reference's TensorBoard visualization stack
(``VisualizationCallback`` + ``Visualizer``,
``training/lightning/callbacks.py:167-520``, ``visualizer.py``):

- per-head grids for multi-head models (``head: all`` enumerates every task
  head; labels are sliced per head when per-head target slices exist)
- affinity-aware rendering: per-group validity masking of label AND
  prediction channels, plus the common deepem valid-region crop for
  pure-affinity stacks (``callbacks.py:65-160``)
- channel selection (``channel_mode: all | selected`` +
  ``selected_channels``) and a max-channel cap
- slice sampling ``uniform`` (evenly spaced) or ``consecutive`` (a centered
  block), ``num_slices`` wide
- a ``data_check`` dump of the first batch (image + every label channel,
  no prediction) so data loading/augmentation is visually verifiable
  before the first epoch completes (``callbacks.py:393``)

Grids are plain uint8 numpy images: saved as PNGs under
``<run_dir>/visualizations/`` and logged through ``MetricsLogger.log_image``
(TB/W&B when enabled).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _norm01(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x.astype(np.float32), -30, 30)))


def select_slices(z_count: int, num_slices: int, sampling: str = "uniform") -> np.ndarray:
    """Slice indices: ``uniform`` = evenly spaced over the stack,
    ``consecutive`` = a centered contiguous block (reference
    ``slice_sampling`` modes)."""
    n = max(1, min(num_slices, z_count))
    if sampling == "consecutive":
        start = max(0, (z_count - n) // 2)
        return np.arange(start, start + n)
    return np.linspace(0, z_count - 1, n).astype(int)


def select_channels(
    total: int,
    channel_mode: str = "all",
    selected_channels: Optional[Sequence[int]] = None,
    max_channels: int = 8,
) -> List[int]:
    """Channel indices to render (reference ``channel_mode`` /
    ``selected_channels`` config, ``callbacks.py:196-206``)."""
    if channel_mode == "selected" and selected_channels:
        return [int(c) for c in selected_channels if -total <= int(c) < total]
    return list(range(min(total, max_channels)))


def apply_affinity_visualization_mask(
    label: Optional[np.ndarray],
    pred: Optional[np.ndarray],
    offsets: Sequence[Any],
    affinity_mode: str = "deepem",
    crop: bool = True,
    image: Optional[np.ndarray] = None,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """Mirror training-time affinity handling in the rendered grids
    (reference ``_apply_affinity_visualization_crop_if_needed``,
    ``callbacks.py:65-160``).

    Inputs are NDHWC. ``offsets`` is either a plain offset list — affinity
    channels assumed to start at channel 0 — or the loss orchestrator's
    channel-group list (``data.targets.build.affinity_target_groups``:
    ``[{start, end, offsets, mode}]``), which masks ONLY the affinity spans
    of the label layout, leaving binary/LSD/... channels untouched. Label
    and prediction channels in each span are zeroed outside the span's valid
    region (mode-aware: deepem stores at the high end, banis at the source);
    when ``crop``, all tensors (incl. the image) are additionally cropped to
    the common deepem-valid region so borders with undefined affinities
    disappear. Returns (image, label, pred) — untouched inputs pass through.
    """
    from ..data.targets.affinity import (
        affinity_valid_mask,
        max_offset_pad,
        parse_offsets,
    )

    offsets = list(offsets or [])
    if not offsets or (label is None and pred is None):
        return image, label, pred
    ref = label if label is not None else pred
    spatial = ref.shape[1:4]
    n_ch = ref.shape[-1]
    if not isinstance(offsets[0], dict):
        offs = parse_offsets(offsets)[:n_ch]
        groups = [
            {"start": 0, "end": len(offs), "offsets": offs, "mode": affinity_mode}
        ]
    else:
        groups = offsets
    if label is not None:
        label = label.copy()
    if pred is not None:
        pred = pred.copy()
    crop_pads = []
    for g in groups:
        offs = parse_offsets(g["offsets"])
        mode = g.get("mode", affinity_mode)
        s = int(g.get("start", 0))
        e = int(g.get("end", s + len(offs)))
        # (C, Z, Y, X) valid mask -> NDHWC broadcastable (1, Z, Y, X, C)
        valid = affinity_valid_mask(spatial, offs, np.float32, mode)
        valid = np.moveaxis(valid, 0, -1)[None]
        if label is not None and e <= label.shape[-1]:
            label[..., s:e] = label[..., s:e] * valid
        # predictions share the label channel layout only single-head; skip
        # spans that don't fit (multi-head per-head tensors)
        if pred is not None and e <= pred.shape[-1]:
            pred[..., s:e] = pred[..., s:e] * valid
        if mode == "deepem":
            crop_pads.append(max_offset_pad(offs))
    if crop and crop_pads:
        pz, py, px = (max(p[d] for p in crop_pads) for d in range(3))
        sl = (
            slice(None),
            slice(pz, spatial[0]),
            slice(py, spatial[1]),
            slice(px, spatial[2]),
        )
        label = label[sl] if label is not None else None
        pred = pred[sl] if pred is not None else None
        image = image[sl] if image is not None else None
    return image, label, pred


def slice_grid(
    batch: Dict[str, np.ndarray],
    outputs: Optional[np.ndarray] = None,
    num_slices: int = 2,
    max_images: int = 4,
    slice_sampling: str = "uniform",
    channel_mode: str = "all",
    selected_channels: Optional[Sequence[int]] = None,
    max_channels: int = 8,
    affinity_offsets: Optional[Sequence[Any]] = None,
    affinity_mode: str = "deepem",
    activation: str = "sigmoid",
) -> np.ndarray:
    """Compose an image grid: rows = samples x slices, cols = [image, label
    channels..., prediction channels...]. NDHWC inputs. Returns (H, W) u8."""
    img = np.asarray(batch["image"])
    lbl = np.asarray(batch["label"]) if batch.get("label") is not None else None
    pred = np.asarray(outputs) if outputs is not None else None
    if pred is not None and activation == "sigmoid":
        pred = _sigmoid(pred)
    if affinity_offsets:
        img, lbl, pred = apply_affinity_visualization_mask(
            lbl, pred, affinity_offsets, affinity_mode, crop=True, image=img
        )
    n = min(max_images, img.shape[0])
    z_picks = select_slices(img.shape[1], num_slices, slice_sampling)
    lbl_ch = (
        select_channels(lbl.shape[-1], channel_mode, selected_channels, max_channels)
        if lbl is not None
        else []
    )
    pred_ch = (
        select_channels(pred.shape[-1], channel_mode, selected_channels, max_channels)
        if pred is not None
        else []
    )
    rows = []
    for b in range(n):
        for z in z_picks:
            cols = [_norm01(img[b, z, :, :, 0])]
            for c in lbl_ch:
                cols.append(_norm01(lbl[b, z, :, :, c]))
            for c in pred_ch:
                cols.append(_norm01(pred[b, z, :, :, c]))
            rows.append(np.concatenate(cols, axis=1))
    grid = np.concatenate(rows, axis=0)
    return (grid * 255).astype(np.uint8)


def _split_heads(outputs: Any) -> Dict[Optional[str], np.ndarray]:
    """dict output -> {head_name: tensor} (ds_* excluded); tensor -> {None: t}."""
    if isinstance(outputs, dict):
        return {
            k: np.asarray(v) for k, v in outputs.items() if not k.startswith("ds_")
        }
    return {None: np.asarray(outputs)}


def head_grids(
    batch: Dict[str, np.ndarray],
    outputs: Any,
    head: Optional[str] = "all",
    label_slices: Optional[Dict[str, Any]] = None,
    **grid_kwargs,
) -> Dict[str, np.ndarray]:
    """One grid per visualized head (reference ``_get_visualization_heads`` +
    per-head loop, ``callbacks.py:306-345``).

    ``head``: "all" = every non-ds head; a name = just that head; None =
    the main output. ``label_slices``: optional {head: channel-slice-spec}
    mapping labels to each head (reference per-head target slices). Batch
    labels may also be a dict keyed by head name.
    """
    from ..utils.slicing import slice_channels

    per_head = _split_heads(outputs)
    if head not in (None, "all") and head in per_head:
        per_head = {head: per_head[head]}
    elif head is None and len(per_head) > 1:
        main = per_head["out"] if "out" in per_head else next(iter(per_head.values()))
        per_head = {None: main}

    labels = batch.get("label")
    grids: Dict[str, np.ndarray] = {}
    for name, pred in per_head.items():
        lbl = labels
        if isinstance(labels, dict):
            lbl = labels.get(name, labels.get("label"))
        elif labels is not None and label_slices and name in (label_slices or {}):
            lbl = slice_channels(np.asarray(labels), label_slices[name])
        tag = name or "main"
        sub = dict(batch)
        sub["label"] = lbl
        grids[tag] = slice_grid(sub, pred, **grid_kwargs)
    return grids


def data_check_grids(
    batch: Dict[str, np.ndarray],
    num_slices: int = 2,
    max_images: int = 4,
    max_channels: int = 8,
) -> Dict[str, np.ndarray]:
    """First-batch image + per-label-channel grids, no prediction (reference
    ``_log_data_check``, ``callbacks.py:393``) — verifies data loading,
    augmentation, and label transforms visually before epoch 1 ends."""
    img = np.asarray(batch["image"])
    out = {
        "data_check/input": slice_grid(
            {"image": img, "label": None}, None, num_slices, max_images
        )
    }
    lbl = batch.get("label")
    if lbl is not None and not isinstance(lbl, dict):
        lbl = np.asarray(lbl)
        for c in range(min(lbl.shape[-1], max_channels)):
            out[f"data_check/label_channel_{c}"] = slice_grid(
                {"image": lbl[..., c : c + 1], "label": None},
                None,
                num_slices,
                max_images,
            )
    return out


def save_visualization(
    out_dir: str | Path,
    step: int,
    batch: Dict[str, np.ndarray],
    outputs: Optional[Any] = None,
    num_slices: int = 2,
    max_images: int = 4,
    metrics_logger=None,
    prefix: str = "train",
    **kwargs,
) -> List[Path]:
    """Render per-head grids, save PNGs, and log to TB/W&B when a
    ``MetricsLogger`` is provided. Returns the written paths."""
    from PIL import Image

    out_dir = Path(out_dir) / "visualizations"
    out_dir.mkdir(parents=True, exist_ok=True)
    grids = head_grids(
        batch, outputs, num_slices=num_slices, max_images=max_images, **kwargs
    )
    paths = []
    for tag, grid in grids.items():
        path = out_dir / f"step_{step:08d}_{prefix}_{tag}.png"
        Image.fromarray(grid).save(path)
        paths.append(path)
        if metrics_logger is not None:
            metrics_logger.log_image(step, f"{prefix}/{tag}", grid)
    return paths
