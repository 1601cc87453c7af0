"""Streamed chunked decoding: per-chunk affinity-CC decode + seam-face
union-find merging -> globally consistent labels in one output volume.

Reference: ``connectomics/decoding/streamed_chunked.py:29-153``
(``run_chunked_affinity_cc_inference``): each chunk is decoded independently
with locally dense labels, then voxel pairs across chunk seam faces that are
connected by affinity above threshold are united in a global union-find and
the output is relabeled once at the end.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..chunked.grid import ChunkRef, build_chunk_grid
from ..ops import affinity_connected_components, remove_small, renumber

logger = logging.getLogger(__name__)


class UnionFind:
    def __init__(self):
        self.parent: Dict[int, int] = {}

    def find(self, a: int) -> int:
        p = self.parent.setdefault(a, a)
        while p != self.parent.setdefault(p, p):
            self.parent[a] = self.parent[p]
            a, p = p, self.parent[p]
        return p

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def streamed_affinity_cc_decode(
    aff_reader: Callable[[tuple], np.ndarray],
    vol_shape: Sequence[int],
    chunk_size: Sequence[int],
    threshold: float = 0.75,
    min_size: int = 0,
    writer=None,
    num_workers: int = 0,
) -> np.ndarray:
    """``aff_reader(slices) -> (3, z, y, x)`` affinities for a region.

    Returns the stitched global label volume (also written to ``writer`` if
    given). Chunks are decoded with disjoint label ranges; seam faces are
    merged via union-find using the affinity channel crossing the seam.
    Chunk decodes run thread-parallel (the C kernel releases the GIL);
    ``num_workers=0`` auto-sizes to the CPU count (capped at 8).
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    chunks = build_chunk_grid(vol_shape, chunk_size, halo=(0, 0, 0))
    out = np.zeros(tuple(vol_shape), np.uint32)
    uf = UnionFind()

    def decode_one(chunk):
        aff = aff_reader(chunk.core_slices)
        labels, n = affinity_connected_components(aff, threshold)
        return chunk, labels.astype(np.uint32), n

    workers = num_workers or min(8, os.cpu_count() or 1, len(chunks))
    if workers > 1:
        with ThreadPoolExecutor(workers) as pool:
            results = list(pool.map(decode_one, chunks))
    else:
        results = [decode_one(c) for c in chunks]
    # disjoint label ranges assigned in deterministic chunk order
    next_offset = 0
    for chunk, labels, n in results:
        labels[labels > 0] += next_offset
        out[chunk.core_slices] = labels
        next_offset += n

    # seam merging: for each face between adjacent chunks, read the affinity
    # channel that crosses the face (at the "high" side) and unite labels.
    for chunk in chunks:
        for axis in range(3):
            if chunk.start[axis] == 0:
                continue
            hi = chunk.start[axis]
            face_hi = [slice(a, b) for a, b in zip(chunk.start, chunk.stop)]
            face_hi[axis] = slice(hi, hi + 1)
            face_lo = list(face_hi)
            face_lo[axis] = slice(hi - 1, hi)
            # affinity at the high side crossing the seam (deepem convention)
            aff_face = aff_reader(tuple(face_hi))[axis]
            lab_hi = out[tuple(face_hi)]
            lab_lo = out[tuple(face_lo)]
            connect = (aff_face > threshold) & (lab_hi > 0) & (lab_lo > 0)
            pairs = np.unique(
                np.stack([lab_lo[connect], lab_hi[connect]], axis=-1).reshape(-1, 2),
                axis=0,
            )
            for a, b in pairs:
                uf.union(int(a), int(b))

    if uf.parent:
        mapping = {a: uf.find(a) for a in uf.parent}
        from ..ops import remap

        out = remap(out, mapping)
    out, _ = renumber(out)
    if min_size:
        out, _ = remove_small(out, min_size)
        out, _ = renumber(out)
    if writer is not None:
        writer[tuple(slice(0, s) for s in vol_shape)] = out
    return out
