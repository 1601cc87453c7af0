#!/usr/bin/env python
"""Probe: MedNeXt-S forward throughput (Mvox/s processed) vs batch size on
the real TPU. Round-1 found a strong batch dependence (1: 41, 2/4: 16,
8: 61 Mvox/s); this sweeps past 8 to see whether sw_batch>8 is worth the
window-buffer work (CLAUDE.md round-1 priority #4)."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(Path(__file__).resolve().parents[1] / ".cache" / "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
from pytorch_connectomics_tpu.models import build_model, init_model

print("devices:", jax.devices(), flush=True)

W = 112
cfg = build_dataclass(
    ModelConfig,
    {
        "arch": {"type": "mednext"},
        "in_channels": 1,
        "out_channels": 1,
        "input_size": [W, W, W],
        "mednext": {"size": "S", "kernel_size": 3},
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "bfloat16",
    },
)
model = build_model(cfg)
params = init_model(model, cfg, jax.random.PRNGKey(0))

REPS = int(os.environ.get("REPS", "4"))


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


lats = []
for _ in range(3):
    t0 = time.time()
    _ = float(jnp.zeros(()) + 1.0)
    lats.append(time.time() - t0)
LAT = sorted(lats)[1]
print(f"fetch latency {LAT*1e3:.0f} ms", flush=True)

for bs in [int(b) for b in os.environ.get("BATCHES", "8,10,12,16,24").split(",")]:
    x = jax.random.uniform(jax.random.PRNGKey(1), (bs, W, W, W, 1), jnp.bfloat16)

    @jax.jit
    def chain(v):
        # feed output back into input (in_ch == out_ch == 1) so XLA cannot
        # hoist the loop body (CLAUDE.md benchmark-timing finding)
        return jax.lax.fori_loop(
            0, REPS, lambda i, a: model.apply(params, a).astype(v.dtype), v
        )

    try:
        s = sync(chain(x))
        t0 = time.time()
        s = sync(chain(x))
        dt = max(1e-6, (time.time() - t0) - LAT) / REPS
        rate = bs * W**3 / dt / 1e6
        print(f"batch {bs}: {dt*1e3:.1f} ms/iter -> {rate:.1f} Mvox/s processed", flush=True)
    except Exception as e:
        print(f"batch {bs} FAILED: {type(e).__name__}: {e}"[:300], flush=True)

print("DONE", flush=True)
