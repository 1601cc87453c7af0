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


def split_slices(
    volume_shape: Sequence[int],
    train_ratio: float = 0.8,
    axis: int = 0,
    min_val_size: Optional[int] = None,
) -> Tuple[Tuple[slice, ...], Tuple[slice, ...]]:
    """(train, val) slice tuples for a ratio split along ``axis``
    (reference ``split_volume_train_val``, datasets/split.py:20)."""
    if not 0 < train_ratio < 1:
        raise ValueError(f"train_ratio must be in (0, 1), got {train_ratio}")
    ndim = len(volume_shape)
    if not 0 <= axis < ndim:
        raise ValueError(f"axis must be in [0, {ndim}), got {axis}")
    size = volume_shape[axis]
    train_size = int(size * train_ratio)
    if min_val_size is not None and size - train_size < min_val_size:
        train_size = max(1, size - min_val_size)
    train = [slice(None)] * ndim
    val = [slice(None)] * ndim
    train[axis] = slice(0, train_size)
    val[axis] = slice(train_size, size)
    return tuple(train), tuple(val)


def create_split_masks(
    volume_shape: Sequence[int],
    train_ratio: float = 0.8,
    axis: int = 0,
    min_val_size: Optional[int] = None,
    dtype=np.uint8,
) -> Tuple[np.ndarray, np.ndarray]:
    """DeepEM msk_train/msk_val-style binary masks for a ratio split
    (reference ``create_split_masks``, datasets/split.py:84)."""
    tr, va = split_slices(volume_shape, train_ratio, axis, min_val_size)
    train_mask = np.zeros(tuple(volume_shape), dtype)
    val_mask = np.zeros(tuple(volume_shape), dtype)
    train_mask[tr] = 1
    val_mask[va] = 1
    return train_mask, val_mask


def pad_volume_to_size(
    volume: np.ndarray,
    target_size: Sequence[int],
    mode: str = "reflect",
    constant_value: float = 0.0,
) -> np.ndarray:
    """Center-pad (never crop) a (C,)Z,Y,X volume up to ``target_size``
    (reference ``pad_volume_to_size``, datasets/split.py:126)."""
    has_channel = volume.ndim == len(target_size) + 1
    spatial = volume.shape[1:] if has_channel else volume.shape
    pads = []
    for s, t in zip(spatial, target_size):
        need = max(0, t - s)
        pads.append((need // 2, need - need // 2))
    if not any(p != (0, 0) for p in pads):
        return volume
    if has_channel:
        pads = [(0, 0)] + pads
    np_mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant",
               "circular": "wrap"}[mode]
    kw = {"constant_values": constant_value} if np_mode == "constant" else {}
    return np.pad(volume, pads, mode=np_mode, **kw)


def split_and_pad_volume(
    volume: np.ndarray,
    train_ratio: float = 0.8,
    target_size: Optional[Sequence[int]] = None,
    axis: int = 0,
    pad_mode: str = "reflect",
    min_val_size: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Ratio split + pad the (smaller) val slab up to the model input size
    (reference ``split_and_pad_volume``, datasets/split.py:243)."""
    has_channel = volume.ndim == 4
    spatial = volume.shape[1:] if has_channel else volume.shape
    tr, va = split_slices(spatial, train_ratio, axis, min_val_size)
    if has_channel:
        tr, va = (slice(None),) + tr, (slice(None),) + va
    train_vol, val_vol = volume[tr], volume[va]
    if target_size is not None:
        val_vol = pad_volume_to_size(val_vol, target_size, mode=pad_mode)
    return train_vol, val_vol


def save_split_masks_h5(
    output_dir,
    volume_shape: Sequence[int],
    train_ratio: float = 0.8,
    axis: int = 0,
    train_filename: str = "msk_train.h5",
    val_filename: str = "msk_val.h5",
):
    """Write DeepEM-compatible msk_train.h5 / msk_val.h5
    (reference ``save_split_masks_h5``, datasets/split.py:313)."""
    from pathlib import Path

    import h5py

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    tm, vm = create_split_masks(volume_shape, train_ratio, axis)
    for name, m in ((train_filename, tm), (val_filename, vm)):
        with h5py.File(out / name, "w") as f:
            f.create_dataset("main", data=m, compression="gzip")
    return out / train_filename, out / val_filename
