"""Volume I/O: format-sniffing readers/writers for HDF5, zarr (via
tensorstore), TIFF stacks, PNG/JPG series, NIfTI (gzip raw fallback), npy,
and deterministic synthetic ``random://`` volumes.

Reference surface: ``connectomics/data/io/io.py`` (read_volume:315,
save_volume:379, probe shape:454).  The zarr path is backed by Google's
tensorstore (C++), which is the TPU-era choice for chunked cloud volumes.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

_DEFAULT_H5_KEYS = ("main", "data", "image", "label", "raw", "volume", "seg")


# ---------------------------------------------------------------------------
# path parsing
# ---------------------------------------------------------------------------


def split_internal_path(path: str) -> Tuple[str, Optional[str]]:
    """``file.h5:dataset`` or ``vol.zarr/arr`` -> (file, internal)."""
    if "://" in path:
        return path, None
    m = re.match(r"^(.*\.(?:h5|hdf5|zarr|n5))[:](.+)$", path)
    if m:
        return m.group(1), m.group(2)
    return path, None


def _h5_dataset_key(f, internal: Optional[str]) -> str:
    if internal:
        return internal
    keys = list(f.keys())
    for k in _DEFAULT_H5_KEYS:
        if k in f:
            return k
    if len(keys) == 1:
        return keys[0]
    raise KeyError(f"ambiguous HDF5 datasets {keys}; use 'file.h5:key'")


# ---------------------------------------------------------------------------
# synthetic volumes (random://)
# ---------------------------------------------------------------------------


def synthetic_volume(name: str, shape: Tuple[int, ...] = (64, 128, 128)) -> np.ndarray:
    """Deterministic synthetic EM-like volume keyed by name.

    Names containing ``label``/``lb``/``seg`` produce instance labels from
    thresholded blobs; others produce a smooth uint8 intensity field.
    Used by the minimal tutorial (reference ``tutorials/minimal.yaml``).

    Image/label/mask names that differ only in their role suffix (e.g.
    ``demo/train_image`` vs ``demo/train_label``) share the SAME underlying
    field, so the label is learnable from the image. Seeding uses crc32
    (process-stable, unlike ``hash``).
    """
    import zlib

    base = name.lower()
    for tag in ("image", "label", "mask", "seg", "_im", "_lb", "im", "lb"):
        base = base.replace(tag, "")
    seed = zlib.crc32(base.encode()) % (2**31)
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(8, 8, 8)).astype(np.float32)
    # upsample smooth noise to full shape (separable linear interp)
    vol = base
    for axis, target in enumerate(shape):
        idx = np.linspace(0, vol.shape[axis] - 1, target)
        lo = np.floor(idx).astype(int)
        hi = np.minimum(lo + 1, vol.shape[axis] - 1)
        w = (idx - lo).astype(np.float32)
        sl_lo = np.take(vol, lo, axis=axis)
        sl_hi = np.take(vol, hi, axis=axis)
        wshape = [1] * vol.ndim
        wshape[axis] = target
        w = w.reshape(wshape)
        vol = sl_lo * (1 - w) + sl_hi * w
    vol = (vol - vol.min()) / max(1e-6, float(np.ptp(vol)))
    if any(tag in name.lower() for tag in ("label", "_lb", "seg", "mask")):
        binary = (vol > 0.6).astype(np.uint8)
        from scipy import ndimage

        lab, _ = ndimage.label(binary)
        return lab.astype(np.uint32)
    return (vol * 255).astype(np.uint8)


_SYNTH_TASKS = ("em", "em2", "instance", "blobs")


def _parse_synthetic_url(path: str):
    """``synthetic://<task>/<name>?shape=Z,Y,X&seed=N&cells=K&elong=E`` —
    task in ``_SYNTH_TASKS``; role (image vs label) inferred from name."""
    body = path[len("synthetic://"):]
    shape, seed, cells, elong = (64, 128, 128), None, None, 1.0
    if "?" in body:
        body, qs = body.split("?", 1)
        m = re.search(r"shape=([\dx,]+)", qs)
        if m:
            shape = tuple(int(s) for s in re.split("[x,]", m.group(1)))
        m = re.search(r"seed=(\d+)", qs)
        if m:
            seed = int(m.group(1))
        m = re.search(r"cells=(\d+)", qs)
        if m:
            cells = int(m.group(1))
        m = re.search(r"elong=([\d.]+)", qs)
        if m:
            elong = float(m.group(1))
    task, _, name = body.partition("/")
    if task not in _SYNTH_TASKS:
        raise ValueError(f"unknown synthetic task '{task}' (one of {_SYNTH_TASKS})")
    if seed is None:
        import zlib

        base = (name or "x").lower()
        for tag in ("image", "label", "mask", "seg", "_im", "_lb"):
            base = base.replace(tag, "")
        seed = zlib.crc32((task + base).encode()) % (2**31)
    return task, name, tuple(shape), seed, cells, elong


_SYNTH_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}
_SYNTH_LOCK = __import__("threading").Lock()


def synthetic_task_volume(path: str) -> np.ndarray:
    """Materialize one role of an on-device synthetic task as numpy.

    Runs the jitted generators from ``data/synthetic_jax.py`` on the current
    default JAX platform; image/label names sharing a seed come from the SAME
    generator call, so labels are learnable from images through the standard
    config-driven pipeline (targets/augmentation/decoding all apply). Intended
    for tutorials and CI at modest shapes — the TPU quality benchmarks keep
    volumes on device instead (scripts/quality_benchmark.py).
    """
    task, name, shape, seed, cells, elong = _parse_synthetic_url(path)
    cache_key = (task, shape, seed, cells, elong)
    with _SYNTH_LOCK:  # read_volume runs on chunked-engine reader threads
        if cache_key not in _SYNTH_CACHE:
            import contextlib

            import jax

            from .synthetic_jax import (
                synthetic_em_volume,
                synthetic_em_volume_v2,
                synthetic_instance_volume,
            )

            # host-destined volumes must NOT be generated on an accelerator:
            # on the dev TPU host the fetch rides a ~1 MB/s relay (CLAUDE.md
            # "generate data on device; fetch scalars") — pin to the CPU
            # backend, which stays available alongside TPU plugins
            try:
                ctx = jax.default_device(jax.devices("cpu")[0])
            except RuntimeError:  # pragma: no cover - cpu backend disabled
                ctx = contextlib.nullcontext()
            with ctx:
                key = jax.random.PRNGKey(seed)
                if task == "instance":
                    n = cells or max(8, int(180 * np.prod(shape) / 1e6))
                    img, lbl = synthetic_instance_volume(key, shape, n_cells=n, elongation=elong)
                elif task == "blobs":
                    from .synthetic_jax import synthetic_blob_instance_volume

                    n = cells or max(6, int(40 * np.prod(shape) / 1e6))
                    img, lbl, _ = synthetic_blob_instance_volume(key, shape, n_blobs=n)
                elif task == "em2":
                    img, lbl = synthetic_em_volume_v2(key, shape)
                else:
                    img, lbl = synthetic_em_volume(key, shape)
                img, lbl = jax.device_get(img), jax.device_get(lbl)
            if len(_SYNTH_CACHE) >= 8:
                _SYNTH_CACHE.pop(next(iter(_SYNTH_CACHE)))
            _SYNTH_CACHE[cache_key] = (
                np.asarray(np.clip(np.asarray(img) * 255.0, 0, 255), np.uint8),
                np.asarray(lbl, np.uint32),
            )
        img, lbl = _SYNTH_CACHE[cache_key]
    is_label = any(t in name.lower() for t in ("label", "_lb", "seg", "mask"))
    return lbl if is_label else img


def _parse_random_url(path: str) -> Tuple[str, Tuple[int, ...]]:
    body = path[len("random://"):]
    if "?" in body:
        body, qs = body.split("?", 1)
        m = re.search(r"shape=([\dx,]+)", qs)
        if m:
            shape = tuple(int(s) for s in re.split("[x,]", m.group(1)))
            return body, shape
    return body, (64, 128, 128)


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


def read_volume(
    path: str,
    internal_path: Optional[str] = None,
    roi: Optional[Sequence[slice]] = None,
) -> np.ndarray:
    """Read a full volume (or ``roi`` slab) from any supported format."""
    if path.startswith("random://"):
        name, shape = _parse_random_url(path)
        vol = synthetic_volume(name, shape)
        return vol[tuple(roi)] if roi else vol
    if path.startswith("synthetic://"):
        vol = synthetic_task_volume(path)
        return vol[tuple(roi)] if roi else vol
    fpath, inner = split_internal_path(path)
    internal_path = internal_path or inner
    suffix = Path(fpath).suffix.lower()
    if suffix in (".h5", ".hdf5"):
        with h5py.File(fpath, "r") as f:
            ds = f[_h5_dataset_key(f, internal_path)]
            return ds[tuple(roi)] if roi else ds[:]
    if suffix in (".zarr", ".n5") or Path(fpath, ".zarray").exists():
        arr = open_zarr(fpath, internal_path)
        return np.asarray(arr[tuple(roi)] if roi else arr[...])
    if suffix in (".tif", ".tiff"):
        vol = _read_tiff_stack(fpath)
        return vol[tuple(roi)] if roi else vol
    if suffix in (".png", ".jpg", ".jpeg") or "*" in fpath:
        vol = _read_image_series(fpath)
        return vol[tuple(roi)] if roi else vol
    if suffix == ".npy":
        vol = np.load(fpath)
        return vol[tuple(roi)] if roi else vol
    if suffix in (".nii", ".gz"):
        return _read_nifti(fpath, roi)
    raise ValueError(f"unsupported volume format: {path}")


def _read_tiff_stack(path: str) -> np.ndarray:
    from PIL import Image, ImageSequence

    with Image.open(path) as im:
        frames = [np.asarray(fr) for fr in ImageSequence.Iterator(im)]
    return np.stack(frames, axis=0)


def _read_image_series(pattern: str) -> np.ndarray:
    import glob

    from PIL import Image

    files = sorted(glob.glob(pattern)) if "*" in pattern else [pattern]
    if not files:
        raise FileNotFoundError(pattern)
    frames = [np.asarray(Image.open(f).convert("L")) for f in files]
    return np.stack(frames, axis=0)


def _read_nifti(path: str, roi=None) -> np.ndarray:
    try:
        import nibabel as nib  # pragma: no cover - not in image

        vol = np.asanyarray(nib.load(path).dataobj)
    except ImportError as e:
        raise ImportError("NIfTI support requires nibabel") from e
    return vol[tuple(roi)] if roi else vol


# ---------------------------------------------------------------------------
# zarr via tensorstore
# ---------------------------------------------------------------------------


class _TensorstoreArray:
    """ndarray-ish window over a tensorstore array (lazy slicing)."""

    def __init__(self, store):
        self._store = store

    @property
    def shape(self):
        return tuple(self._store.shape)

    @property
    def dtype(self):
        return np.dtype(self._store.dtype.numpy_dtype)

    def __getitem__(self, item):
        return np.asarray(self._store[item].read().result())


def open_zarr(path: str, internal_path: Optional[str] = None) -> _TensorstoreArray:
    import tensorstore as ts

    full = Path(path)
    if internal_path:
        full = full / internal_path
    # find the actual array dir (may be nested single-array group)
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(full)},
    }
    try:
        store = ts.open(spec, open=True).result()
    except Exception:
        # zarr3
        spec["driver"] = "zarr3"
        store = ts.open(spec, open=True).result()
    return _TensorstoreArray(store)


def create_zarr(
    path: str,
    shape: Sequence[int],
    dtype,
    chunks: Optional[Sequence[int]] = None,
    internal_path: Optional[str] = None,
) -> "_TensorstoreWriter":
    import tensorstore as ts

    full = Path(path)
    if internal_path:
        full = full / internal_path
    chunks = list(chunks) if chunks else [min(64, s) for s in shape]
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(full)},
        "metadata": {
            "shape": list(shape),
            "chunks": chunks,
            "dtype": np.dtype(dtype).str,
        },
        "create": True,
        "delete_existing": True,
    }
    store = ts.open(spec).result()
    return _TensorstoreWriter(store)


class _TensorstoreWriter:
    def __init__(self, store):
        self._store = store

    @property
    def shape(self):
        return tuple(self._store.shape)

    def __setitem__(self, item, value):
        self._store[item].write(np.asarray(value)).result()

    def __getitem__(self, item):
        return np.asarray(self._store[item].read().result())


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


def save_volume(
    path: str,
    volume: np.ndarray,
    internal_path: Optional[str] = None,
    chunks: Optional[Sequence[int]] = None,
    compression: str = "gzip",
    attrs: Optional[Dict[str, Any]] = None,
) -> None:
    fpath, inner = split_internal_path(path)
    internal_path = internal_path or inner or "main"
    suffix = Path(fpath).suffix.lower()
    Path(fpath).parent.mkdir(parents=True, exist_ok=True)
    if suffix in (".h5", ".hdf5"):
        with h5py.File(fpath, "w") as f:
            kw: Dict[str, Any] = {}
            if compression and volume.nbytes > 1 << 20:
                kw["compression"] = compression
            if chunks:
                kw["chunks"] = tuple(chunks)
            ds = f.create_dataset(internal_path, data=volume, **kw)
            for k, v in (attrs or {}).items():
                ds.attrs[k] = v
        return
    if suffix in (".zarr", ".n5"):
        w = create_zarr(fpath, volume.shape, volume.dtype, chunks)
        w[...] = volume
        return
    if suffix in (".tif", ".tiff"):
        _save_tiff_stack(fpath, volume)
        return
    if suffix == ".npy":
        np.save(fpath, volume)
        return
    raise ValueError(f"unsupported output format: {path}")


def _save_tiff_stack(path: str, volume: np.ndarray) -> None:
    from PIL import Image

    vol = volume
    if vol.ndim == 2:
        vol = vol[None]
    frames = [Image.fromarray(np.asarray(s)) for s in vol]
    frames[0].save(path, save_all=True, append_images=frames[1:])


# ---------------------------------------------------------------------------
# shape probe (no full read)  — reference io.py:454
# ---------------------------------------------------------------------------


def probe_volume(path: str, internal_path: Optional[str] = None) -> Tuple[Tuple[int, ...], np.dtype]:
    if path.startswith("random://"):
        name, shape = _parse_random_url(path)
        dt = np.uint32 if any(t in name.lower() for t in ("label", "_lb", "seg", "mask")) else np.uint8
        return shape, np.dtype(dt)
    if path.startswith("synthetic://"):
        task, name, shape, _, _, _ = _parse_synthetic_url(path)
        dt = np.uint32 if any(t in name.lower() for t in ("label", "_lb", "seg", "mask")) else np.uint8
        return shape, np.dtype(dt)
    fpath, inner = split_internal_path(path)
    internal_path = internal_path or inner
    suffix = Path(fpath).suffix.lower()
    if suffix in (".h5", ".hdf5"):
        with h5py.File(fpath, "r") as f:
            ds = f[_h5_dataset_key(f, internal_path)]
            return tuple(ds.shape), ds.dtype
    if suffix in (".zarr", ".n5"):
        arr = open_zarr(fpath, internal_path)
        return arr.shape, arr.dtype
    vol = read_volume(path, internal_path)
    return vol.shape, vol.dtype


def read_h5_attrs(path: str, internal_path: Optional[str] = None) -> Dict[str, Any]:
    fpath, inner = split_internal_path(path)
    with h5py.File(fpath, "r") as f:
        ds = f[_h5_dataset_key(f, internal_path or inner)]
        return dict(ds.attrs)
