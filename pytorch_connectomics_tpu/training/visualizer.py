"""Training visualization: slice-grid PNGs of input / label / prediction
(the reference's TensorBoard image grids — ``VisualizationCallback``,
``training/lightning/callbacks.py:167-520`` + ``visualizer.py``)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _norm01(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def slice_grid(
    batch: Dict[str, np.ndarray],
    outputs: Optional[np.ndarray] = None,
    num_slices: int = 2,
    max_images: int = 4,
) -> np.ndarray:
    """Compose an image grid: rows = samples x slices, cols = [image, label
    channels..., prediction channels...]. NDHWC inputs. Returns (H, W) u8."""
    img = np.asarray(batch["image"])
    lbl = np.asarray(batch.get("label")) if "label" in batch else None
    pred = np.asarray(outputs) if outputs is not None else None
    n = min(max_images, img.shape[0])
    z_count = img.shape[1]
    z_picks = np.linspace(0, z_count - 1, num_slices).astype(int)
    rows = []
    for b in range(n):
        for z in z_picks:
            cols = [_norm01(img[b, z, :, :, 0])]
            if lbl is not None:
                for c in range(min(3, lbl.shape[-1])):
                    cols.append(_norm01(lbl[b, z, :, :, c]))
            if pred is not None:
                for c in range(min(3, pred.shape[-1])):
                    cols.append(_norm01(1.0 / (1.0 + np.exp(-pred[b, z, :, :, c]))))
            rows.append(np.concatenate(cols, axis=1))
    grid = np.concatenate(rows, axis=0)
    return (grid * 255).astype(np.uint8)


def save_visualization(
    out_dir: str | Path,
    step: int,
    batch: Dict[str, np.ndarray],
    outputs: Optional[np.ndarray] = None,
    num_slices: int = 2,
    max_images: int = 4,
) -> Path:
    from PIL import Image

    out_dir = Path(out_dir) / "visualizations"
    out_dir.mkdir(parents=True, exist_ok=True)
    grid = slice_grid(batch, outputs, num_slices, max_images)
    path = out_dir / f"step_{step:08d}.png"
    Image.fromarray(grid).save(path)
    return path
