#!/usr/bin/env python
"""Full-model MedNeXt-S forward timings on TPU: batch sweep + head-einsum
variant (in-context, per CLAUDE.md 'measure in context')."""

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
REPS = int(os.environ.get("REPS", "8"))


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, x, label):
    @jax.jit
    def chain(v):
        # feed a 0*out term back into the input so the model call is NOT
        # loop-invariant (XLA hoists fn(v) out of the loop otherwise and the
        # measurement collapses to one call / REPS)
        def body(i, carry):
            vv, s = carry
            out = fn(vv)
            m = jnp.mean(out).astype(vv.dtype)
            return (vv + 0 * m, s + m.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, (v, jnp.zeros((), jnp.float32)))[1]

    try:
        s = sync(chain(x))
        t0 = time.time()
        s = sync(chain(x))
        dt = (time.time() - t0) / REPS
        mvox = np.prod(x.shape[:4]) / dt / 1e6
        print(f"{label}: {dt*1e3:.1f} ms ({mvox:.1f} Mvox/s)", flush=True)
        return dt
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {e}"[:250], flush=True)


cfg = build_dataclass(
    ModelConfig,
    {
        "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 1,
        "input_size": [112, 112, 112],
        "mednext": {"size": "S", "kernel_size": 3},
        "loss": {"losses": [{"function": "DiceLoss"}]},
        "compute_dtype": "bfloat16",
    },
)
model = build_model(cfg)
params = init_model(model, cfg, jax.random.PRNGKey(0))

for b in (8, 16):
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 112, 112, 112, 1)).astype(jnp.bfloat16)
    bench(lambda v: model.apply(params, v), x, f"model.apply b{b}")
print("DONE", flush=True)
