"""Generic chunked map-over-volume with resume — the host-side utility the
reference uses for precompute scripts (``connectomics/chunked/processor.py:74``).

Uses a thread pool (chunk work is numpy/IO bound and releases the GIL in
h5py/scipy) instead of multiprocessing pools; per-chunk results stream into
the output writer under a lock.
"""

from __future__ import annotations

import logging
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

from .grid import ChunkRef, build_chunk_grid, resolve_halo
from .manifest import ResumeManifest

logger = logging.getLogger(__name__)


class ChunkedProcessor:
    """Map ``process_chunk`` over a chunk grid with crash-safe resume.

    Subclass or pass ``process_fn(chunk_data, chunk) -> np.ndarray``; results
    are written to ``writer[core_slices]`` (any object supporting ndarray
    slice assignment, e.g. h5py Dataset or tensorstore writer).
    """

    def __init__(
        self,
        vol_shape: Sequence[int],
        chunk_size: Sequence[int],
        halo: Sequence[int] = (0, 0, 0),
        manifest_path: Optional[str] = None,
        signature: Optional[Dict[str, Any]] = None,
        num_workers: int = 4,
        shard_id: Optional[int] = None,
        num_shards: Optional[int] = None,
    ):
        self.chunks = build_chunk_grid(vol_shape, chunk_size, halo)
        if shard_id is not None and num_shards and num_shards > 1:
            # disjoint chunk shards for array-job precompute (reference
            # sdt_precompute_chunked.py SLURM task decode)
            if not (0 <= shard_id < num_shards):
                raise ValueError(f"shard_id={shard_id} out of range for {num_shards}")
            self.chunks = self.chunks[shard_id::num_shards]
        self.manifest = ResumeManifest(manifest_path, signature) if manifest_path else None
        self.num_workers = max(1, num_workers)
        self._lock = threading.Lock()

    def process_chunk(self, data: np.ndarray, chunk: ChunkRef) -> np.ndarray:
        raise NotImplementedError

    def run(
        self,
        reader: Callable[[tuple], np.ndarray],
        writer,
        process_fn: Optional[Callable] = None,
    ) -> int:
        """reader(slices) -> array; writer[core_slices] = result. Returns the
        number of chunks processed (excluding resumed)."""
        fn = process_fn or self.process_chunk
        todo = [c for c in self.chunks if not (self.manifest and self.manifest.is_done(c.key))]
        logger.info("chunked run: %d/%d chunks to do", len(todo), len(self.chunks))

        def work(chunk: ChunkRef):
            data = reader(chunk.read_slices)
            result = fn(data, chunk)
            core = result[tuple(chunk.local_core_slices)]
            with self._lock:
                writer[chunk.core_slices] = core
                if self.manifest:
                    self.manifest.mark_done(chunk.key)

        if self.num_workers == 1:
            for c in todo:
                work(c)
        else:
            with ThreadPoolExecutor(self.num_workers) as pool:
                list(pool.map(work, todo))
        return len(todo)
