"""Test-time shard planning.

Reference: ``connectomics/runtime/sharding.py`` — the four modes (§2.11):
(a) per-volume assignment over ranks (``:212-254``), (b) independent
external shards ``paths[shard::num_shards]`` with zero communication
(``:212-300``), (c) device-count reduction vs volume count (``:91-175``),
(d) chunk-grid sharding. Rank/world detection from env
(``:178-193``: RANK/WORLD_SIZE or SLURM_PROCID/SLURM_NTASKS).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple


def detect_rank_world() -> Tuple[int, int]:
    for rank_var, world_var in (("RANK", "WORLD_SIZE"), ("SLURM_PROCID", "SLURM_NTASKS")):
        if rank_var in os.environ and world_var in os.environ:
            return int(os.environ[rank_var]), int(os.environ[world_var])
    return 0, 1


def shard_paths(paths: Sequence[str], shard_id: Optional[int], num_shards: Optional[int]) -> List[str]:
    """Independent-shard mode: ``paths[shard::num_shards]``."""
    paths = list(paths)
    if shard_id is None or not num_shards or num_shards <= 1:
        return paths
    return paths[shard_id::num_shards]


def assign_volumes_to_ranks(paths: Sequence[str], rank: int, world_size: int) -> List[str]:
    """Disjoint per-rank volume assignment without padding
    (reference ``DistributedEvaluationSampler``, ``lightning/data.py:234``)."""
    return list(paths)[rank::world_size]


def effective_devices_for_volumes(num_devices: int, num_volumes: int) -> int:
    """Reduce device count when there are fewer volumes than devices
    (reference ``sharding.py:91-175``)."""
    return max(1, min(num_devices, num_volumes)) if num_volumes else num_devices
