#!/usr/bin/env python
"""Probe: stock MedNeXt-S window-size x batch sweep on the real TPU.

Round-2 swept batch at fixed 112^3 only (batch 8 = 61 Mvox/s processed,
>8 fails to compile — VMEM). Smaller windows shrink per-window VMEM, so
larger batches may compile and amortize the C=32 layout overhead better.
The 0.5-overlap inflation factor is window-size-independent (~8x deep
interior), so fwd Mvox/s processed is directly comparable across windows;
the engine's output rate is fwd/inflation for the bench geometry.

Env: WINDOWS=64,80,96,112  BATCHES=8,16,32  REPS=4
"""

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

REPS = int(os.environ.get("REPS", "4"))
VOL = (165, 1024, 768)  # bench geometry, for the output-rate estimate


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


lats = []
for _ in range(3):
    t0 = time.time()
    _ = float(jnp.zeros(()) + 1.0)
    lats.append(time.time() - t0)
LAT = sorted(lats)[1]
print(f"fetch latency {LAT*1e3:.0f} ms", flush=True)


def n_windows(vol, w, s):
    import math
    n = 1
    for size, ww, st in zip(vol, (w,) * 3, (s,) * 3):
        cover = max(size, ww)
        cover = st * math.ceil((cover - ww) / st) + ww
        n *= (cover - ww) // st + 1
    return n


for w in [int(x) for x in os.environ.get("WINDOWS", "64,80,96,112").split(",")]:
    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 1,
            "input_size": [w, w, w],
            "mednext": {"size": "S", "kernel_size": 3},
            "loss": {"losses": [{"function": "DiceLoss"}]},
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    stride = w // 2
    nw = n_windows(VOL, w, stride)
    inflation = nw * w**3 / float(np.prod(VOL))
    for bs in [int(b) for b in os.environ.get("BATCHES", "8,16,32").split(",")]:
        x = jax.random.uniform(jax.random.PRNGKey(1), (bs, w, w, w, 1), jnp.bfloat16)

        @jax.jit
        def chain(v):
            return jax.lax.fori_loop(
                0, REPS, lambda i, a: model.apply(params, a).astype(v.dtype), v
            )

        try:
            _ = sync(chain(x))
            t0 = time.time()
            _ = sync(chain(x))
            dt = max(1e-6, (time.time() - t0) - LAT) / REPS
            rate = bs * w**3 / dt / 1e6
            print(
                f"w={w} batch={bs}: {dt*1e3:.1f} ms/iter -> {rate:.1f} Mvox/s"
                f" processed | inflation {inflation:.2f}x -> ~{rate/inflation:.1f}"
                f" Mvox/s output",
                flush=True,
            )
        except Exception as e:
            print(f"w={w} batch={bs} FAILED: {type(e).__name__}: {e}"[:300], flush=True)

print("DONE", flush=True)
