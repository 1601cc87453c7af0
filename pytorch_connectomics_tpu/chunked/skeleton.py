"""Chunked skeleton precompute: map skeletonization over a large instance
volume (reference ``SkeletonVolumeProcessor``, ``connectomics/chunked/skeleton.py:41``
— used by ``scripts/precompute_skeleton_volumes.py``).

Per chunk: build per-instance skeletons (TEASAR-lite MST,
``metrics/skeleton.py``) and rasterize them into a uint8 skeleton mask
volume; halo reads keep near-boundary skeleton geometry stable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..metrics.skeleton import skeletonize_volume
from .grid import ChunkRef
from .processor import ChunkedProcessor


def rasterize_skeletons(skeletons: Dict[int, "object"], shape) -> np.ndarray:
    """Draw skeleton edges into a uint8 mask volume (id-labeled)."""
    out = np.zeros(tuple(shape), np.uint32)
    for iid, sk in skeletons.items():
        for a, b in sk.edges:
            pa, pb = sk.nodes[a], sk.nodes[b]
            n = int(np.ceil(np.linalg.norm(pb - pa))) + 1
            pts = np.linspace(pa, pb, n)
            idx = np.clip(np.round(pts).astype(int), 0, np.asarray(shape) - 1)
            out[idx[:, 0], idx[:, 1], idx[:, 2]] = iid
    return out


class SkeletonVolumeProcessor(ChunkedProcessor):
    def __init__(self, *args, stride=(2, 4, 4), anisotropy=(1.0, 1.0, 1.0),
                 min_voxels: int = 50, **kw):
        super().__init__(*args, **kw)
        self.stride = stride
        self.anisotropy = anisotropy
        self.min_voxels = min_voxels

    def process_chunk(self, data: np.ndarray, chunk: ChunkRef) -> np.ndarray:
        skels = skeletonize_volume(
            data.astype(np.uint32),
            stride=self.stride,
            anisotropy=self.anisotropy,
            min_voxels=self.min_voxels,
        )
        return rasterize_skeletons(skels, data.shape)
