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


def test_spatial_partitioned_train_step_matches_dp():
    """DP x space mesh (z sharded; GSPMD conv halo exchange) computes the
    same loss as pure DP on the same batch."""
    import jax
    import numpy as np

    from pytorch_connectomics_tpu.config.schema import (
        ModelConfig,
        OptimizationConfig,
        build_dataclass,
    )
    from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        shard_batch,
    )
    from pytorch_connectomics_tpu.training.optim import build_optimizer
    from pytorch_connectomics_tpu.training.state import (
        create_train_state,
        make_train_step,
    )

    cfg = build_dataclass(
        ModelConfig,
        {"arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 1,
         "input_size": [16, 16, 16],
         "mednext": {"size": "custom", "base_channels": 8, "exp_ratio": 2,
                      "block_counts": [1] * 9},
         "loss": {"losses": [{"function": "DiceLoss", "kwargs": {"sigmoid": True}}]},
         "compute_dtype": "float32"},
    )
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    opt = build_dataclass(OptimizationConfig, {"optimizer": {"name": "AdamW", "lr": 1e-3}})
    tx, _ = build_optimizer(opt, 10)
    orch = LossOrchestrator(cfg.loss)
    step = jax.jit(make_train_step(model.apply, orch, tx))
    rng = np.random.default_rng(0)
    img = rng.random((2, 16, 16, 16, 1)).astype(np.float32)
    lbl = (rng.random((2, 16, 16, 16, 1)) > 0.5).astype(np.float32)

    losses = {}
    for axes in ({"data": 2}, {"data": 2, "space": 4}):
        mesh = make_mesh(axes)
        state = jax.device_put(
            create_train_state(jax.tree.map(np.asarray, variables["params"]), tx),
            replicated(mesh),
        )
        batch = shard_batch({"image": img, "label": lbl}, mesh)
        _, logs = step(state, batch)
        losses[tuple(axes)] = float(logs["loss_total"])
    vals = list(losses.values())
    assert abs(vals[0] - vals[1]) < 1e-5, losses


def test_make_mesh_spreads_devices_across_processes():
    """With a sub-full mesh, each process must own an equal slice of the
    data axis (a prefix pick would leave rank 1 addressing nothing —
    ``make_array_from_process_local_data`` then fails; seen live on the
    2-process CLI run)."""
    from unittest import mock

    import jax

    from pytorch_connectomics_tpu.parallel.mesh import (
        fit_data_axis_to_batch,
        make_mesh,
    )

    class FakeDev:
        def __init__(self, pid, lid):
            self.process_index = pid
            self.id = pid * 4 + lid

        def __repr__(self):  # np.array of objects needs this for errors only
            return f"dev(p{self.process_index},{self.id})"

    devs = [FakeDev(p, l) for p in range(2) for l in range(4)]
    with mock.patch.object(jax, "process_count", return_value=2):
        mesh = make_mesh({"data": 2}, devices=devs)
        picked = list(mesh.devices.flat)
        assert [d.process_index for d in picked] == [0, 1]
        # equal per-process split required
        with pytest.raises(ValueError, match="divisible by"):
            make_mesh({"data": 3}, devices=devs)
        # fit_data_axis_to_batch respects process divisibility: batch 6 over
        # 2 processes can't use data=3 (or 1) — only 2 or 6
        assert fit_data_axis_to_batch({"data": 8}, 6, 8)["data"] == 6
        assert fit_data_axis_to_batch({"data": 2}, 6, 8)["data"] == 2
        with pytest.raises(ValueError, match="process_count"):
            fit_data_axis_to_batch({"data": 1}, 5, 8)
    # single-process unchanged
    assert fit_data_axis_to_batch({"data": 8}, 6, 8)["data"] == 6


@pytest.mark.slow
def test_true_multiprocess_cli_train(tmp_path):
    """TWO real ``jax.distributed`` processes (CPU backend, Gloo collectives)
    through the production CLI: dispatch -> coordinated run dir ->
    process-sliced pipeline -> DP mesh spanning processes -> orbax save.
    Both ranks must finish and report identical final metrics — the
    reference's multi-node DDP contract
    (``connectomics/training/lightning/trainer.py:231-256``), exercised
    end-to-end rather than mocked."""
    import ast
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_PROCESS_ID")
    }
    env.update(
        PYTC_PLATFORM="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        JAX_COMPILATION_CACHE_DIR=str(root / ".cache" / "jax_cpu"),
    )
    def launch():
        procs = []
        for pid in range(2):
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(root / "scripts" / "main.py"),
                     "--config", str(root / "tutorials" / "minimal.yaml"),
                     "--mode", "train", f"save_path={tmp_path / 'run'}"],
                    env={**env, "JAX_PROCESS_ID": str(pid)},
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                    cwd=str(root),
                )
            )
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
        return procs, outs

    procs, outs = launch()
    for _attempt in range(3):
        if not (
            any(p.returncode != 0 for p in procs)
            and any("DEADLINE_EXCEEDED" in o for o in outs)
        ):
            break
        # gloo's KV-store timeout is a hard-coded 30 s: on this 1-core host
        # a COLD compile cache (or heavy background load — e.g. a TPU bench
        # queue sharing the core) lets one rank reach the first collective
        # minutes before the other. Failed attempts warm the persistent
        # cache (entries are written per-executable as they compile), so
        # retries run progressively more symmetric-fast.
        procs, outs = launch()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
    metrics = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("[done] train:")][-1]
        metrics.append(ast.literal_eval(line.split("[done] train:", 1)[1].strip()))
    assert metrics[0] == metrics[1], metrics
    assert metrics[0]["epoch"] == 0 and "val_jaccard" in metrics[0]


def test_make_mesh_data_axis_process_major_regardless_of_position():
    """When 'data' is not the FIRST mesh axis, the device array must still
    give each process a contiguous slice of the DATA axis (otherwise every
    data slot spans processes and make_array_from_process_local_data over
    the batch dim mis-assembles)."""
    from unittest import mock

    import jax

    from pytorch_connectomics_tpu.parallel.mesh import make_mesh

    class FakeDev:
        def __init__(self, pid, lid):
            self.process_index = pid
            self.id = pid * 4 + lid

        def __repr__(self):
            return f"dev(p{self.process_index},{self.id})"

    devs = [FakeDev(p, l) for p in range(2) for l in range(4)]
    with mock.patch.object(jax, "process_count", return_value=2):
        mesh = make_mesh({"space": 2, "data": 4}, devices=devs)
        arr = mesh.devices  # shape (space=2, data=4)
        assert arr.shape == (2, 4)
        for d in range(4):
            procs = {arr[s, d].process_index for s in range(2)}
            assert procs == {0 if d < 2 else 1}, (d, procs)
        # data axis not divisible by process count -> loud error
        import pytest as _pytest

        with _pytest.raises(ValueError, match="data axis"):
            make_mesh({"space": 8, "data": 1}, devices=devs)
