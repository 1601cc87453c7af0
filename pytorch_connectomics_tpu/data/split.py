"""DeepEM-style volumetric train/val split along one axis
(reference ``connectomics/data/datasets/split.py:20-243``)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def _resolve_range(rng: Sequence[float], size: int) -> Tuple[int, int]:
    lo, hi = rng
    if isinstance(lo, float) and 0.0 <= lo <= 1.0 and isinstance(hi, float) and hi <= 1.0:
        return int(round(lo * size)), int(round(hi * size))
    return int(lo), int(hi)


def split_volume(
    volume: np.ndarray,
    axis: int = 0,
    train_range: Optional[Sequence[float]] = None,
    val_range: Optional[Sequence[float]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Split a volume into (train, val) slabs along ``axis``.

    Ranges may be fractional ([0.0,0.8]) or absolute voxel indices. If only
    ``train_range`` is given, val is its complement (leading or trailing slab).
    """
    size = volume.shape[axis]
    if train_range is None and val_range is None:
        train_range = [0.0, 0.8]
    if train_range is not None:
        t_lo, t_hi = _resolve_range(train_range, size)
    if val_range is not None:
        v_lo, v_hi = _resolve_range(val_range, size)
        if train_range is None:
            # complement of val
            t_lo, t_hi = (v_hi, size) if v_lo == 0 else (0, v_lo)
    else:
        v_lo, v_hi = (t_hi, size) if t_lo == 0 else (0, t_lo)

    def slab(lo, hi):
        sl = [slice(None)] * volume.ndim
        sl[axis] = slice(lo, hi)
        return volume[tuple(sl)]

    return slab(t_lo, t_hi), slab(v_lo, v_hi)
