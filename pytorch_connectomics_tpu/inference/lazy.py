"""Lazy volume accessor: windowed reads from HDF5/zarr/tile-grid/synthetic
sources with virtual transpose / pad / read-downscale / normalization —
volumes never fully materialize.

Reference: ``LazyVolumeAccessor`` (``connectomics/inference/lazy.py:456-920``;
tile sources :43-158, scale factors :422-454).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

import h5py

from ..data.io import open_zarr, probe_volume, split_internal_path, synthetic_volume, _parse_random_url
from ..data.preprocess import normalize_volume


def is_tile_source(path: str) -> bool:
    """Tile-grid sources: a tile-spec JSON or a directory of numeric section
    subdirectories with ``<row>_<col>.png`` tiles (reference
    ``lazy.py:153``)."""
    p = Path(path)
    if ".zarr" in str(p) or ".n5" in str(p):
        return False
    return p.suffix.lower() == ".json" or p.is_dir()


def _open_tile_source(path: str):
    """-> TileVolume (lazy (Z,Y,X) view; data/tiles.py)."""
    from ..data.tiles import TileVolume

    p = Path(path)
    if p.suffix.lower() == ".json":
        return TileVolume(p)
    # directory of numeric section dirs with row_col tiles (reference
    # ``_infer_tile_metadata_from_directory``, lazy.py:86)
    sections = sorted(
        (d for d in p.iterdir() if d.is_dir() and d.name.isdigit()),
        key=lambda d: int(d.name),
    )
    if not sections:
        raise ValueError(f"tile source {path}: no numeric section directories")
    first = sorted(sections[0].glob("*_*.png"))
    if not first:
        raise ValueError(f"tile source {path}: no '<row>_<col>.png' tiles")
    rows, cols = set(), set()
    for f in sections[0].glob("*_*.png"):
        r, _, c = f.stem.partition("_")
        if r.isdigit() and c.isdigit():
            rows.add(int(r))
            cols.add(int(c))
    from PIL import Image

    with Image.open(first[0]) as im:
        th, tw = im.height, im.width
    grid = (max(rows) - min(rows) + 1, max(cols) - min(cols) + 1)
    spec = {
        "tile_size": [th, tw],
        "grid": list(grid),
        "sections": [
            [
                str(Path(s.name) / f"{r + min(rows)}_{c + min(cols)}.png")
                for r in range(grid[0])
                for c in range(grid[1])
            ]
            for s in sections
        ],
    }
    return TileVolume(spec, root=p)


def _resize_linear(vol: np.ndarray, target: Tuple[int, ...]) -> np.ndarray:
    """Separable linear resample of a 3-D array to ``target`` shape."""
    for axis, t in enumerate(target):
        n = vol.shape[axis]
        if n == t:
            continue
        idx = np.linspace(0, n - 1, t) if t > 1 else np.array([(n - 1) / 2.0])
        lo = np.floor(idx).astype(int)
        hi = np.minimum(lo + 1, n - 1)
        w = (idx - lo).astype(np.float32)
        wshape = [1] * vol.ndim
        wshape[axis] = t
        w = w.reshape(wshape)
        vol = np.take(vol, lo, axis=axis) * (1 - w) + np.take(vol, hi, axis=axis) * w
    return vol


class LazyVolumeAccessor:
    """Read windows from a volume source by global (z,y,x) slices.

    Supports: virtual transpose (axis permutation applied at read time),
    virtual padding (reads outside bounds return reflect/constant pad),
    read-downscale (``scale`` <= 1 per axis: logical coords map to a larger
    native crop that is linearly resampled, reference ``lazy.py:422-454`` /
    ``data_factory.py:84``), tile-grid sources, and normalization applied
    per window.
    """

    def __init__(
        self,
        path: str,
        internal_path: Optional[str] = None,
        transpose: Optional[Sequence[int]] = None,
        pad: Optional[Sequence[int]] = None,
        normalize: str = "smart",
        pad_mode: str = "reflect",
        scale: Optional[Sequence[float]] = None,
    ):
        self.path = path
        self.internal_path = internal_path
        self.transpose = tuple(transpose) if transpose else None
        self.pad = tuple(pad) if pad else (0, 0, 0)
        self.normalize = normalize
        self.pad_mode = pad_mode
        self.scale = tuple(float(s) for s in scale) if scale else None
        if self.scale and any(s <= 0 or s > 1 for s in self.scale):
            raise ValueError(f"read scale must be in (0, 1], got {self.scale}")
        self._handle = None
        if is_tile_source(path):
            tv = _open_tile_source(path)
            base_shape, self.dtype = tv.shape, tv.dtype
            self._handle = tv
        else:
            base_shape, self.dtype = probe_volume(path, internal_path)
        if self.transpose:
            base_shape = tuple(base_shape[a] for a in self.transpose)
        self.native_shape = base_shape
        if self.scale:
            base_shape = tuple(
                max(1, int(round(n * s))) for n, s in zip(base_shape, self.scale)
            )
        self.base_shape = base_shape
        self.shape = tuple(s + 2 * p for s, p in zip(base_shape, self.pad))

    # -- raw reading -------------------------------------------------------

    def _ensure_handle(self):
        if self._handle is not None:
            return
        if self.path.startswith("random://"):
            name, shape = _parse_random_url(self.path)
            self._handle = synthetic_volume(name, shape)
            return
        if self.path.startswith("synthetic://"):
            from ..data.io import synthetic_task_volume

            self._handle = synthetic_task_volume(self.path)
            return
        fpath, inner = split_internal_path(self.path)
        internal = self.internal_path or inner
        if fpath.endswith((".h5", ".hdf5")):
            f = h5py.File(fpath, "r")
            from ..data.io import _h5_dataset_key

            self._handle = f[_h5_dataset_key(f, internal)]
        elif fpath.endswith((".zarr", ".n5")):
            self._handle = open_zarr(fpath, internal)
        else:
            from ..data.io import read_volume

            self._handle = read_volume(self.path, internal)

    def read(self, slices: Sequence[slice]) -> np.ndarray:
        """Read a window in the padded coordinate frame, normalized float32."""
        slices = tuple(slices)
        # map padded coords -> base coords, tracking out-of-range margins
        base_sl = []
        pads = []
        for sl, p, n in zip(slices, self.pad, self.base_shape):
            lo = (sl.start or 0) - p
            hi = (sl.stop if sl.stop is not None else (n + 2 * p)) - p
            pad_lo = max(0, -lo)
            pad_hi = max(0, hi - n)
            base_sl.append(slice(max(0, lo), min(n, hi)))
            pads.append((pad_lo, pad_hi))
        if self.scale:
            raw = self._read_scaled(base_sl)
        elif self.transpose:
            # read with axes permuted back to storage order
            inv = np.argsort(self.transpose)
            storage_sl = tuple(base_sl[inv[d]] for d in range(3))
            raw = np.asarray(self._storage_read(storage_sl))
            raw = np.transpose(raw, self.transpose)
        else:
            raw = np.asarray(self._storage_read(tuple(base_sl)))
        if any(p != (0, 0) for p in pads):
            mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant"}[self.pad_mode]
            raw = np.pad(raw, pads, mode=mode)
        return normalize_volume(raw, self.normalize)

    def _storage_read(self, slices):
        self._ensure_handle()
        return self._handle[slices]

    def _read_scaled(self, base_sl) -> np.ndarray:
        """Read logical (downscaled) coords: fetch the covering native crop
        and linearly resample to the logical extent."""
        native_sl = []
        targets = []
        for sl, s, n in zip(base_sl, self.scale, self.native_shape):
            lo = int(np.floor(sl.start / s))
            hi = min(n, max(lo + 1, int(np.ceil(sl.stop / s))))
            native_sl.append(slice(lo, hi))
            targets.append(max(0, sl.stop - sl.start))
        if self.transpose:
            inv = np.argsort(self.transpose)
            storage_sl = tuple(native_sl[inv[d]] for d in range(3))
            raw = np.asarray(self._storage_read(storage_sl))
            raw = np.transpose(raw, self.transpose)
        else:
            raw = np.asarray(self._storage_read(tuple(native_sl)))
        return _resize_linear(raw.astype(np.float32), tuple(targets))

    def read_all(self) -> np.ndarray:
        return self.read(tuple(slice(0, s) for s in self.shape))

    def close(self):
        h = self._handle
        if h is not None and hasattr(h, "file"):
            try:
                h.file.close()
            except Exception:
                pass
        self._handle = None
