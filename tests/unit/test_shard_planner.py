"""Shard-plan decision engine (reference ``runtime/sharding.py:35-300``)."""

import pytest

from pytorch_connectomics_tpu.config.schema import Config, build_dataclass
from pytorch_connectomics_tpu.runtime.sharding import (
    plan_test_sharding,
    shard_paths,
)


def _cfg(**over):
    d = {"model": {"arch": {"type": "mednext"}}}
    d.update(over)
    return build_dataclass(Config, d)


def test_no_sharding_by_default():
    plan = plan_test_sharding(_cfg(), num_volumes=3, num_devices=1)
    assert plan.mode == "none" and not plan.empty


def test_explicit_independent_shards():
    cfg = _cfg(system={"shard_id": 1, "num_shards": 2})
    plan = plan_test_sharding(cfg, num_volumes=5)
    assert plan.mode == "independent"
    assert plan.shard_id == 1 and plan.num_shards == 2
    assert plan.tta_sharding is False  # disabled for per-process shards


def test_shard_id_out_of_range_raises():
    cfg = _cfg(system={"shard_id": 3, "num_shards": 2})
    with pytest.raises(ValueError, match="out of range"):
        plan_test_sharding(cfg, num_volumes=4)


def test_num_shards_without_shard_id_raises():
    cfg = _cfg(system={"num_shards": 4})
    with pytest.raises(ValueError, match="requires"):
        plan_test_sharding(cfg, num_volumes=4)


def test_empty_shard_detected():
    cfg = _cfg(system={"shard_id": 3, "num_shards": 4})
    plan = plan_test_sharding(cfg, num_volumes=2)
    assert plan.mode == "independent" and plan.empty


def test_chunk_grid_mode_for_chunked_raw():
    cfg = _cfg(
        system={"shard_id": 0, "num_shards": 4},
        inference={"chunked": {"enabled": True, "chunk_size": [32, 64, 64]}},
    )
    plan = plan_test_sharding(cfg, num_volumes=1)
    assert plan.mode == "chunk_grid"
    assert plan.shard_id == 0 and plan.num_shards == 4


def test_env_rank_world_independent(monkeypatch):
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "3")
    plan = plan_test_sharding(_cfg(), num_volumes=6)
    assert plan.mode == "independent"
    assert (plan.shard_id, plan.num_shards) == (1, 3)


def test_env_ignored_for_single_volume(monkeypatch):
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "3")
    plan = plan_test_sharding(_cfg(), num_volumes=1)
    assert plan.mode == "none"


def test_tta_sharding_disabled_for_multivolume():
    cfg = _cfg(inference={"test_time_augmentation": {"enabled": True, "rotation90": True}})
    plan = plan_test_sharding(cfg, num_volumes=3, num_devices=4)
    assert plan.tta_sharding is False
    assert plan.device_cap == 3  # capped to volumes


def test_tta_device_cap_single_volume():
    # flip_axes "all" in 3-D -> 8 passes; rotation90 off
    cfg = _cfg(inference={"test_time_augmentation": {"enabled": True, "flip_axes": "all"}})
    plan = plan_test_sharding(cfg, num_volumes=1, num_devices=32)
    assert plan.tta_sharding is True
    assert plan.device_cap is not None and plan.device_cap <= 32


def test_joint_image_label_sharding_alignment():
    """Images and labels must be sharded together (ground-truth alignment)."""
    images = [f"im{i}.h5" for i in range(5)]
    labels = [f"lb{i}.h5" for i in range(5)]
    paired = shard_paths(list(zip(images, labels)), 1, 2)
    for im, lb in paired:
        assert im[2:] == lb[2:]
