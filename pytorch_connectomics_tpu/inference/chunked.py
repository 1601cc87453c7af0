"""Chunk-grid inference for volumes larger than memory.

Reference: ``run_chunked_prediction_inference``
(``connectomics/inference/chunked.py:701``): chunk grid over the output
shape, per-chunk lazy reads with halo, sliding-window inference per chunk,
streamed stitch into one HDF5/zarr, crash-safe manifest resume, and three
distribution modes — single process, mesh-sharded windows, and independent
external shards with no communication (``chunked.py:751-790``).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import h5py

from ..chunked.grid import ChunkRef, build_chunk_grid, resolve_halo
from ..chunked.manifest import ResumeManifest
from ..config.schema import ChunkedConfig
from .lazy import LazyVolumeAccessor
from .tta import TTAPredictor

logger = logging.getLogger(__name__)


def select_chunks_for_shard(
    chunks: List[ChunkRef], shard_id: Optional[int], num_shards: Optional[int]
) -> List[ChunkRef]:
    """Independent-shard assignment ``chunks[shard::num_shards]``
    (reference ``chunked.py:751-790`` external shard mode)."""
    if shard_id is None or not num_shards:
        return chunks
    return chunks[shard_id::num_shards]


def run_chunked_inference(
    predictor: TTAPredictor,
    params,
    accessor: LazyVolumeAccessor,
    output_path: str | Path,
    chunk_cfg: ChunkedConfig,
    out_channels: Optional[int] = None,
    shard_id: Optional[int] = None,
    num_shards: Optional[int] = None,
    signature: Optional[Dict[str, Any]] = None,
    output_dtype=np.float32,
    internal_path: str = "main",
) -> Path:
    """Predict ``accessor``'s volume chunk by chunk into one HDF5/zarr file.

    Returns the output path. With ``shard_id``/``num_shards`` only that
    shard's chunks are computed (all shards may write concurrently to
    different files, or sequentially to one — here: one file per run,
    concurrent shards should pass distinct output paths then stitch, or rely
    on chunk-disjoint writes in zarr mode).
    """
    output_path = Path(output_path)
    vol_shape = accessor.shape
    window = predictor.engine.window
    chunk_size = tuple(chunk_cfg.chunk_size or [max(w * 2, 64) for w in window])
    halo = resolve_halo(chunk_cfg.halo, window, predictor.engine.overlap)
    chunks = build_chunk_grid(vol_shape, chunk_size, halo)
    if chunk_cfg.roi_filter and any(getattr(accessor, "pad", (0, 0, 0))):
        # skip chunks whose core lies entirely in the virtual pad margin —
        # they contain no real data (reference ROI filtering of pure-padding
        # chunks, inference/chunked.py:217-258)
        lo = accessor.pad
        hi = [p + b for p, b in zip(accessor.pad, accessor.base_shape)]
        kept = [
            c for c in chunks
            if all(c.start[i] < hi[i] and c.stop[i] > lo[i] for i in range(3))
        ]
        if len(kept) != len(chunks):
            logger.info(
                "roi_filter: %d/%d chunks are pure padding, skipped",
                len(chunks) - len(kept), len(chunks),
            )
        chunks = kept
    chunks = select_chunks_for_shard(chunks, shard_id, num_shards)
    if chunk_cfg.num_chunks_per_rank:
        # cap work per shard/rank (reference num_chunks_per_rank): remaining
        # chunks are left for a later resumed run (manifest-tracked)
        chunks = chunks[: int(chunk_cfg.num_chunks_per_rank)]

    if out_channels is None:
        out_channels = predictor.engine.probe_out_channels(params, 1)
    n_out = len(predictor.select_channel) if predictor.select_channel else out_channels

    manifest = None
    if chunk_cfg.resume:
        manifest = ResumeManifest(
            output_path.with_suffix(output_path.suffix + ".manifest.json"),
            signature or {},
        )

    output_path.parent.mkdir(parents=True, exist_ok=True)
    if chunk_cfg.output_mode == "precomputed":
        # direct chunk-aligned writes into a neuroglancer precomputed layer
        # (reference ``inference/chunked.py:67-190``; lock-free when chunks
        # align with storage chunks, ``schema/inference.py:125-134``)
        from ..data.precomputed import create_precomputed, open_precomputed

        if manifest and manifest.completed and (output_path / "info").exists():
            vol = open_precomputed(output_path)
        else:
            vol = create_precomputed(
                output_path,
                vol_shape,
                output_dtype,
                chunk_size=[min(c, s) for c, s in zip(chunk_size, vol_shape)],
                num_channels=n_out,
            )
        _run_chunks(predictor, params, accessor, vol, chunks, manifest, n_out)
        return output_path
    if str(output_path).endswith(".zarr"):
        from ..data.io import create_zarr, open_zarr

        if manifest and manifest.completed and Path(output_path).exists():
            ds = _ZarrDS(open_zarr(str(output_path))._store)
        else:
            w = create_zarr(
                str(output_path),
                (n_out,) + tuple(vol_shape),
                output_dtype,
                chunks=[n_out] + [min(c, s) for c, s in zip(chunk_size, vol_shape)],
            )
            ds = _ZarrDS(w._store)
        _run_chunks(predictor, params, accessor, ds, chunks, manifest, n_out)
        return output_path

    mode = "a" if (manifest and manifest.completed and output_path.exists()) else "w"
    with h5py.File(output_path, mode) as f:
        if "main" in f:
            ds = f[internal_path]
        else:
            h5_chunks = chunk_cfg.h5_chunks or [1] + [min(128, s) for s in vol_shape]
            ds = f.create_dataset(
                internal_path,
                shape=(n_out,) + tuple(vol_shape),
                dtype=output_dtype,
                chunks=(1, *[min(int(c), s) for c, s in zip(h5_chunks[1:], vol_shape)]),
                compression="gzip" if chunk_cfg.output_mode == "stitch_h5" else None,
            )
        # Provenance attrs make the chunked artifact participate in
        # validate_prediction_cache's config-hash/checkpoint check like
        # whole-volume predictions (it would otherwise validate as a legacy
        # cache for ANY weights). Whole-volume artifacts only gain attrs
        # AFTER inference finishes; mirror that ordering here — a sentinel
        # checkpoint is stamped up front so a half-written file from a
        # crashed run can never positively validate as a complete cache
        # (the real attrs land only once _run_chunks returns; the crashed
        # run resumes through the manifest on the next invocation).
        ds.attrs["checkpoint"] = "__incomplete__"
        _run_chunks(predictor, params, accessor, ds, chunks, manifest, n_out)
        for k, v in (signature or {}).items():
            if isinstance(v, (str, int, float, bool, np.integer, np.floating)):
                ds.attrs[k] = v
        if signature and "checkpoint" in signature:
            ds.attrs["checkpoint"] = str(signature["checkpoint"]) or "random-init"
        else:
            del ds.attrs["checkpoint"]
        if "framework" not in ds.attrs:
            ds.attrs["framework"] = "pytorch_connectomics_tpu"
    return output_path


class _ZarrDS:
    def __init__(self, store):
        self._store = store

    def __setitem__(self, sl, val):
        self._store[sl].write(np.ascontiguousarray(val)).result()


def _run_chunks(predictor, params, accessor, ds, chunks, manifest, n_out):
    """Double-buffered: a reader thread prefetches the next chunk from disk
    while the device computes the current one, and writes happen on a
    writer thread — host IO overlaps device compute (reference design goal,
    SURVEY §7 'double-buffered host chunk prefetch')."""
    import queue
    import threading

    todo = [c for c in chunks if not (manifest and manifest.is_done(c.key))]
    read_q: "queue.Queue" = queue.Queue(maxsize=2)
    write_q: "queue.Queue" = queue.Queue(maxsize=2)

    errors = []

    def reader():
        try:
            for chunk in todo:
                read_q.put((chunk, accessor.read(chunk.read_slices)))
        except Exception as e:
            errors.append(e)
        finally:
            read_q.put(None)  # always unblock the main loop

    def writer():
        while True:
            item = write_q.get()
            if item is None:
                return
            chunk, core = item
            try:
                ds[(slice(0, n_out),) + chunk.core_slices] = np.moveaxis(core, -1, 0)
                if manifest:
                    manifest.mark_done(chunk.key)
            except Exception as e:  # pragma: no cover
                errors.append(e)
                # keep draining so the producer's bounded put() never blocks
                while write_q.get() is not None:
                    pass
                return

    rt = threading.Thread(target=reader, daemon=True)
    wt = threading.Thread(target=writer, daemon=True)
    rt.start()
    wt.start()
    done = 0
    while True:
        item = read_q.get()
        if item is None:
            break
        if errors:
            break
        chunk, data = item
        pred = predictor.predict(params, data)  # (z,y,x,C)
        write_q.put((chunk, pred[chunk.local_core_slices]))
        done += 1
        logger.info("chunk %s done (%d/%d)", chunk.key, done, len(todo))
    write_q.put(None)
    wt.join()
    if errors:
        raise errors[0]
    return done


def stitch_shard_outputs(
    shard_paths: Sequence[str | Path], output_path: str | Path, internal_path="main"
) -> Path:
    """Merge per-shard H5 outputs (non-overlapping chunks, zeros elsewhere)
    into one file (reference ``scripts/stitch_chunked_prediction.py``)."""
    output_path = Path(output_path)
    with h5py.File(shard_paths[0], "r") as f0:
        shape, dtype = f0[internal_path].shape, f0[internal_path].dtype
    with h5py.File(output_path, "w") as out:
        ds = out.create_dataset(internal_path, shape=shape, dtype=dtype)
        for p in shard_paths:
            with h5py.File(p, "r") as f:
                src = f[internal_path][:]
                nz = src != 0
                dst = ds[:]
                dst[nz] = src[nz]
                ds[...] = dst
    return output_path
