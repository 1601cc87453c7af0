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
from dataclasses import dataclass
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


# ---------------------------------------------------------------------------
# shard-plan decision engine (reference ``runtime/sharding.py:35-300``)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ShardPlan:
    """Resolved test-stage sharding decision.

    ``mode``: ``"none"`` (single process, all volumes), ``"independent"``
    (this process handles ``paths[shard_id::num_shards]``, zero
    communication), or ``"chunk_grid"`` (single-volume chunked raw
    inference; the chunk grid itself is split ``shard_id/num_shards``,
    reference ``maybe_enable_naive_chunk_sharding``, ``sharding.py:35``).
    """

    mode: str = "none"
    shard_id: Optional[int] = None
    num_shards: Optional[int] = None
    # cap on mesh devices for volume-level parallel work (reference
    # ``maybe_limit_test_devices``, ``sharding.py:91-175``)
    device_cap: Optional[int] = None
    # whether TTA variant-sharding over the mesh stays enabled
    tta_sharding: bool = True
    empty: bool = False
    notes: Tuple[str, ...] = ()


def is_chunked_raw_inference(cfg) -> bool:
    """Chunked inference that writes raw predictions (reference
    ``sharding.py:18-25``; our chunked engine always emits raw
    predictions, so this reduces to the chunked-enabled flag)."""
    return bool(cfg.inference.chunked.enabled)


def _count_tta_passes(cfg) -> int:
    tta = cfg.inference.test_time_augmentation
    if not tta.enabled:
        return 1
    from ..inference.tta import enumerate_tta_variants

    return max(
        1,
        len(
            enumerate_tta_variants(
                tta.flip_axes or "all",
                tta.rotation90,
                rotation_planes=getattr(tta, "rotation_planes", None),
                rotation_k=getattr(tta, "rotation_k", None),
            )
        ),
    )


def plan_test_sharding(
    cfg,
    num_volumes: int,
    num_devices: int = 1,
    env: Optional[dict] = None,
) -> ShardPlan:
    """Resolve the test-stage sharding mode from config + environment.

    Mirrors the reference decision chain (``runtime/sharding.py:35-300``):
    explicit ``--shard-id/--num-shards`` args win; chunked raw inference
    maps them onto the chunk grid; otherwise multi-volume runs pick up
    rank/world from the launcher env as independent shards; device counts
    are capped by volumes (or TTA passes for single-volume TTA sharding);
    TTA variant-sharding is disabled for multi-volume shards (rank-mixing
    hazard, reference ``sharding.py:117-124``).
    """
    notes = []
    shard_id = cfg.system.shard_id
    num_shards = cfg.system.num_shards

    # -- validation (reference sharding.py:43-51) --
    if (shard_id is None) != (num_shards is None or num_shards <= 1):
        if shard_id is None and num_shards and num_shards > 1:
            raise ValueError("system.num_shards>1 requires system.shard_id")
    if num_shards is not None and num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    if shard_id is not None:
        if num_shards is None:
            num_shards = 1
        if not (0 <= shard_id < num_shards):
            raise ValueError(
                f"shard_id={shard_id} out of range for num_shards={num_shards}"
            )

    explicit = shard_id is not None and (num_shards or 1) > 1
    chunked_raw = is_chunked_raw_inference(cfg)

    # -- chunk-grid sharding: one volume, split the chunk grid --
    if explicit and chunked_raw:
        notes.append(
            f"chunk-grid sharding: shard {shard_id}/{num_shards} of the chunk "
            "grid, single device per process"
        )
        return ShardPlan(
            mode="chunk_grid",
            shard_id=shard_id,
            num_shards=num_shards,
            device_cap=None,
            tta_sharding=False,
            notes=tuple(notes),
        )

    # -- independent volume shards: explicit args or launcher env --
    if not explicit and num_volumes > 1:
        e_rank, e_world = detect_rank_world() if env is None else _rank_world_from(env)
        if e_world > 1:
            shard_id, num_shards = e_rank, e_world
            explicit = True
            notes.append(
                f"independent sharding from launcher env (rank {e_rank}/{e_world})"
            )

    if explicit:
        n_mine = len(range(shard_id, num_volumes, num_shards)) if num_volumes else 0
        empty = num_volumes > 0 and n_mine == 0
        if empty:
            notes.append(f"shard {shard_id}/{num_shards} is empty, nothing to do")
        if cfg.inference.test_time_augmentation.shard_across_devices:
            notes.append(
                "disabling TTA variant-sharding for independent per-process shards"
            )
        return ShardPlan(
            mode="independent",
            shard_id=shard_id,
            num_shards=num_shards,
            device_cap=1 if num_shards and num_shards > 1 else None,
            tta_sharding=False,
            empty=empty,
            notes=tuple(notes),
        )

    # -- no sharding: mediate device count vs volumes / TTA passes --
    tta_sharding = bool(cfg.inference.test_time_augmentation.shard_across_devices)
    if tta_sharding and num_volumes > 1:
        # mesh ranks would reduce predictions from different volumes
        # (reference sharding.py:117-124)
        notes.append("disabling TTA variant-sharding for multi-volume test sets")
        tta_sharding = False
    device_cap = None
    if num_devices > 1 and num_volumes:
        if tta_sharding and num_volumes == 1:
            passes = _count_tta_passes(cfg)
            device_cap = max(1, min(num_devices, passes))
            if device_cap < num_devices:
                notes.append(
                    f"reducing devices to TTA passes: {num_devices} -> {device_cap}"
                )
        elif not chunked_raw and num_volumes < num_devices:
            device_cap = max(1, num_volumes)
            notes.append(
                f"fewer volumes than devices: capping {num_devices} -> {device_cap}"
            )
    return ShardPlan(
        mode="none",
        device_cap=device_cap,
        tta_sharding=tta_sharding,
        notes=tuple(notes),
    )


def _rank_world_from(env: dict) -> Tuple[int, int]:
    for rank_var, world_var in (("RANK", "WORLD_SIZE"), ("SLURM_PROCID", "SLURM_NTASKS")):
        if rank_var in env and world_var in env:
            try:
                return int(env[rank_var]), int(env[world_var])
            except ValueError:
                continue
    return 0, 1
