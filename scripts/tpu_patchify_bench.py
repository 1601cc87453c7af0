#!/usr/bin/env python
"""Patchify-stem MedNeXt-S vs baseline: full-model forward at bench geometry
(112^3 windows). The patchify stem is an exact space-to-depth + dense 8->C
matmul; all stages run one resolution level down, a learned 2x transposed
conv restores full res. Measures throughput; quality must be validated by
training (QB_ARCH=patchify quality run) before it can be offered as the
inference recipe."""

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
        def body(i, carry):
            vv, s = carry
            out = fn(vv)
            m = jnp.mean(out).astype(vv.dtype)
            return (vv + 0 * m, s + m.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, (v, jnp.zeros((), jnp.float32)))[1]

    try:
        sync(chain(x))
        ts = []
        for _ in range(3):
            t0 = time.time()
            sync(chain(x))
            ts.append((time.time() - t0) / REPS)
        dt = sorted(ts)[1]
        mvox = np.prod(x.shape[:4]) / dt / 1e6
        print(f"{label}: {dt*1e3:.1f} ms ({mvox:.1f} Mvox/s processed)", flush=True)
        return dt
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {e}"[:250], flush=True)
        return None


def make(patchify: bool, win: int, full_res_width=None, head="linear"):
    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"}, "in_channels": 1, "out_channels": 1,
            "input_size": [win] * 3,
            "mednext": {"size": "S", "kernel_size": 3, "patchify_stem": patchify,
                        "patchify_full_res_width": full_res_width,
                        "patchify_head": head},
            "loss": {"losses": [{"function": "DiceLoss"}]},
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    return model, params


# patchify needs window % 32 == 0 (one extra halving level), so it runs at
# 96/128 windows; the baseline reference point is the bench recipe's 112.
# ONLY=hybrid measures just the hybrid thin-full-res-stage variants.
only = os.environ.get("ONLY", "")
cases = (
    (False, 112, (8,), None, "linear"),
    (True, 96, (8, 16), None, "linear"),
    (True, 128, (4, 8), None, "linear"),
    (True, 96, (8,), None, "refine"),
    (True, 96, (8,), 8, "linear"),
    (True, 96, (8,), 16, "linear"),
    (True, 128, (8,), 16, "linear"),
)
if only == "hybrid":
    cases = tuple(c for c in cases if c[3] is not None or c[4] != "linear")
for patchify, win, batches, w0, head in cases:
    model, params = make(patchify, win, w0, head)
    tag = "patchify" if patchify else "baseline"
    if w0:
        tag += f"+fr{w0}"
    if head != "linear":
        tag += f"+{head}"
    for b in batches:
        x = jax.random.normal(
            jax.random.PRNGKey(1), (b, win, win, win, 1)).astype(jnp.bfloat16)
        bench(lambda v: model.apply(params, v), x, f"{tag} {win}^3 b{b}")
print("DONE", flush=True)
