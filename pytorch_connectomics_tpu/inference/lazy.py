"""Lazy volume accessor: windowed reads from HDF5/zarr/synthetic sources with
virtual transpose / pad / normalization — volumes never fully materialize.

Reference: ``LazyVolumeAccessor`` (``connectomics/inference/lazy.py:456-920``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import h5py

from ..data.io import open_zarr, probe_volume, split_internal_path, synthetic_volume, _parse_random_url
from ..data.preprocess import normalize_volume


class LazyVolumeAccessor:
    """Read windows from a volume source by global (z,y,x) slices.

    Supports: virtual transpose (axis permutation applied at read time),
    virtual padding (reads outside bounds return reflect/constant pad),
    and normalization applied per window.
    """

    def __init__(
        self,
        path: str,
        internal_path: Optional[str] = None,
        transpose: Optional[Sequence[int]] = None,
        pad: Optional[Sequence[int]] = None,
        normalize: str = "smart",
        pad_mode: str = "reflect",
    ):
        self.path = path
        self.internal_path = internal_path
        self.transpose = tuple(transpose) if transpose else None
        self.pad = tuple(pad) if pad else (0, 0, 0)
        self.normalize = normalize
        self.pad_mode = pad_mode
        self._handle = None
        base_shape, self.dtype = probe_volume(path, internal_path)
        if self.transpose:
            base_shape = tuple(base_shape[a] for a in self.transpose)
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
        if self.transpose:
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
