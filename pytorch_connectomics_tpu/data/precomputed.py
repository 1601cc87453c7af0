"""Neuroglancer precomputed volume IO via tensorstore (C++).

This replaces the reference's CloudVolume dependency for direct chunk writes
during chunked inference and for the ABISS bridge
(``inference/chunked.py:67-190``, ``runtime/abiss_chunk.py:38``). Writes are
chunk-aligned and lock-free — concurrent shards may write disjoint chunks
(reference ``schema/inference.py:125-134`` semantics).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np


def kvstore_spec(path: str) -> dict:
    """Map a cloudpath onto a tensorstore kvstore spec: ``gs://`` (GCS),
    ``s3://``, ``http(s)://``, else local file
    (reference ``h5_to_precomputed_cloud.py`` CloudVolume cloudpaths)."""
    p = str(path)
    if p.startswith("gs://"):
        bucket, _, inner = p[5:].partition("/")
        return {"driver": "gcs", "bucket": bucket, "path": inner}
    if p.startswith("s3://"):
        bucket, _, inner = p[5:].partition("/")
        return {"driver": "s3", "bucket": bucket, "path": inner}
    if p.startswith(("http://", "https://")):
        return {"driver": "http", "base_url": p}
    return {"driver": "file", "path": p}


def _spec(path: str, create: bool = False, **meta):
    spec = {
        "driver": "neuroglancer_precomputed",
        "kvstore": kvstore_spec(path),
    }
    spec.update(meta)
    return spec


def create_precomputed(
    path: str | Path,
    shape: Sequence[int],
    dtype,
    chunk_size: Sequence[int] = (64, 64, 64),
    resolution: Sequence[float] = (1.0, 1.0, 1.0),
    num_channels: int = 1,
    layer_type: str = "image",
):
    """Create a precomputed layer. ``shape`` is (z, y, x); stored xyzc."""
    import tensorstore as ts

    z, y, x = shape
    spec = {
        "driver": "neuroglancer_precomputed",
        "kvstore": kvstore_spec(str(path)),
        "multiscale_metadata": {
            "type": layer_type,
            "data_type": np.dtype(dtype).name,
            "num_channels": num_channels,
        },
        "scale_metadata": {
            "size": [x, y, z],
            "resolution": [float(r) for r in reversed(list(resolution))],
            "chunk_size": list(reversed(list(chunk_size))),
            "encoding": "raw",
        },
        "create": True,
        "delete_existing": True,
    }
    store = ts.open(spec).result()
    return PrecomputedVolume(store)


def append_scale(
    path: str | Path,
    shape: Sequence[int],
    dtype,
    chunk_size: Sequence[int],
    resolution: Sequence[float],
    num_channels: int = 1,
):
    """Add a downsampled scale (mip) to an existing layer; the scale is
    keyed by its resolution (reference cloud multiscale uploads)."""
    import tensorstore as ts

    z, y, x = shape
    spec = {
        "driver": "neuroglancer_precomputed",
        "kvstore": kvstore_spec(str(path)),
        "scale_metadata": {
            "size": [x, y, z],
            "resolution": [float(r) for r in reversed(list(resolution))],
            "chunk_size": list(reversed(list(chunk_size))),
            "encoding": "raw",
        },
        "open": True,
        "create": True,
    }
    store = ts.open(spec).result()
    return PrecomputedVolume(store)


def open_precomputed(path: str | Path, resolution: Optional[Sequence[float]] = None):
    """Open a layer; pass ``resolution`` (z, y, x) to select a specific mip."""
    import tensorstore as ts

    meta = {}
    if resolution is not None:
        meta["scale_metadata"] = {
            "resolution": [float(r) for r in reversed(list(resolution))]
        }
    store = ts.open(_spec(str(path), open=True, **meta), open=True).result()
    return PrecomputedVolume(store)


class PrecomputedVolume:
    """(z, y, x[, c]) numpy view over an xyzc tensorstore precomputed layer."""

    def __init__(self, store):
        self._store = store

    @property
    def shape(self) -> Tuple[int, ...]:
        x, y, z, c = self._store.shape
        return (z, y, x) if c == 1 else (c, z, y, x)

    def _to_xyzc(self, vol: np.ndarray) -> np.ndarray:
        if vol.ndim == 3:
            vol = vol[None]  # (c,z,y,x)
        return np.ascontiguousarray(np.transpose(vol, (3, 2, 1, 0)))  # xyzc

    def write(self, zyx_slices: Sequence[slice], vol: np.ndarray) -> None:
        sz, sy, sx = zyx_slices
        data = self._to_xyzc(np.asarray(vol))
        self._store[sx, sy, sz, :].write(data).result()

    def read(self, zyx_slices: Sequence[slice]) -> np.ndarray:
        sz, sy, sx = zyx_slices
        data = np.asarray(self._store[sx, sy, sz, :].read().result())
        out = np.transpose(data, (3, 2, 1, 0))  # (c,z,y,x)
        return out[0] if out.shape[0] == 1 else out

    def __setitem__(self, zyx_slices, vol):
        # channel-first slices from the chunked engine: strip channel slice
        if len(zyx_slices) == 4:
            zyx_slices = zyx_slices[1:]
        self.write(zyx_slices, vol)

    def __getitem__(self, zyx_slices):
        return self.read(zyx_slices)


def abiss_affinity_convention(aff: np.ndarray) -> np.ndarray:
    """Convert our deepem high-end (x,y,z) affinities to the ABISS channel
    convention: channel order reversed (z,y,x) with edges shifted to the low
    end (reference conversion, ``inference/chunked.py:67-190``)."""
    a = np.asarray(aff)
    out = np.zeros_like(a)
    # reverse channel order x,y,z -> z,y,x
    rev = a[::-1].copy()
    # shift each channel's edge from the high end to the low end of its axis
    for c, axis in enumerate((0, 1, 2)):  # rev[0]=z-offset, rev[1]=y, rev[2]=x
        shifted = np.roll(rev[c], -1, axis=axis)
        idx = [slice(None)] * 3
        idx[axis] = slice(-1, None)
        shifted[tuple(idx)] = 0
        out[c] = shifted
    return out
