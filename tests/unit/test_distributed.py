"""Multi-host wiring (reference multi-node DDP analog,
``trainer.py:231-256``): env detection, process-sliced batch assembly, and
global-array construction."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.parallel.distributed import (
    detect_multiprocess_env,
    local_batch_slice,
    maybe_initialize_distributed,
)


def test_detect_none_by_default(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "SLURM_NTASKS",
                "SLURM_PROCID", "TPU_WORKER_HOSTNAMES", "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert detect_multiprocess_env() == (None, 1, 0)


def test_detect_explicit_jax_vars(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert detect_multiprocess_env() == ("10.0.0.1:1234", 4, 2)


def test_detect_slurm(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_PROCID", "3")
    addr, n, pid = detect_multiprocess_env()
    assert (n, pid) == (8, 3)


def test_maybe_initialize_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "SLURM_NTASKS",
                "TPU_WORKER_HOSTNAMES", "PYTC_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed("auto") == (0, 1)
    assert maybe_initialize_distributed("never") == (0, 1)


def test_local_batch_slice():
    assert list(local_batch_slice(8, 0, 2)) == [0, 1, 2, 3]
    assert list(local_batch_slice(8, 1, 2)) == [4, 5, 6, 7]
    with pytest.raises(ValueError):
        local_batch_slice(6, 0, 4)


def _pipeline(process_index, process_count, batch=4):
    from pytorch_connectomics_tpu.data.datasets import VolumeDataset
    from pytorch_connectomics_tpu.data.pipeline import PatchPipeline

    ds = VolumeDataset(
        ["random://dist/img"], ["random://dist/lbl"], None,
        patch_size=(8, 16, 16), normalize="none",
    )
    return PatchPipeline(
        ds, batch, seed=7, train=True,
        process_index=process_index, process_count=process_count,
    )


def test_process_sliced_batches_union_equals_global():
    """p0+p1 slices concatenated are bit-identical to the single-process
    global batch (global-slot RNG keying)."""
    full = _pipeline(0, 1).make_batch(3)
    p0 = _pipeline(0, 2).make_batch(3)
    p1 = _pipeline(1, 2).make_batch(3)
    assert p0["image"].shape[0] == 2 and p1["image"].shape[0] == 2
    for k in full:
        np.testing.assert_array_equal(
            np.concatenate([p0[k], p1[k]], axis=0), full[k]
        )


def test_batch_size_not_divisible_raises():
    with pytest.raises(ValueError):
        _pipeline(0, 3, batch=4)


def test_shard_batch_single_host_mesh():
    import jax

    from pytorch_connectomics_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh({"data": len(jax.devices())})
    batch = {"image": np.ones((len(jax.devices()) * 2, 4, 4, 4, 1), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["image"].shape == batch["image"].shape
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
