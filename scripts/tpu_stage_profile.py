#!/usr/bin/env python
"""Per-stage wall-clock profile of the MedNeXt-S forward at the bench
workload shape (batch 8, 112^3), on the real TPU. Each stage module is
timed with a chained fori_loop (one dispatch + one scalar fetch)."""

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

from pytorch_connectomics_tpu.models.mednext import MedNeXtBlock, _Stage

print("devices:", jax.devices(), flush=True)
REPS = int(os.environ.get("REPS", "10"))
DT = jnp.bfloat16


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench_mod(mod, in_shape, label, chained=True):
    x = jax.random.normal(jax.random.PRNGKey(0), in_shape).astype(DT)
    v = jax.jit(mod.init)(jax.random.PRNGKey(1), x)
    out_shape = jax.eval_shape(lambda: mod.apply(v, x)).shape

    if chained and out_shape == in_shape:

        @jax.jit
        def run(x0):
            return jax.lax.fori_loop(0, REPS, lambda i, h: mod.apply(v, h), x0)

        reps = REPS
    else:

        @jax.jit
        def run(x0):
            # chain via summed re-injection to keep data dependency
            def body(i, h):
                o = mod.apply(v, h)
                return h + jnp.mean(o).astype(h.dtype)

            return jax.lax.fori_loop(0, REPS, body, x0)

        reps = REPS
    s = sync(run(x))
    t0 = time.time()
    s = sync(run(x))
    dt = (time.time() - t0) / reps
    print(f"{label:<34s} in={str(in_shape):<22s} {dt*1e3:8.2f} ms", flush=True)
    return dt


B = 8
C = 32
total = 0.0
import flax.linen as nn

# stem
total += bench_mod(nn.Conv(C, (1, 1, 1), dtype=DT), (B, 112, 112, 112, 1), "stem 1x1 conv")
# encoder stages + down transitions
sizes = [112, 56, 28, 14]
for i in range(4):
    feat = C * 2**i
    s = sizes[i]
    total += 2 * bench_mod(
        MedNeXtBlock(feat, 2, 3, "group", DT), (B, s, s, s, feat), f"enc stage{i} block x2 (C{feat}@{s})"
    )
    total += bench_mod(
        MedNeXtBlock(feat, 2, 3, "group", DT, out_features=feat * 2, stride=2),
        (B, s, s, s, feat),
        f"down{i} (C{feat}->C{feat*2})",
    )
# bottleneck
total += 2 * bench_mod(
    MedNeXtBlock(C * 16, 2, 3, "group", DT), (B, 7, 7, 7, C * 16), "bottleneck block x2 (C512@7)"
)
# decoder
for j in range(4):
    i = 3 - j
    feat = C * 2**i
    s = sizes[i]
    total += bench_mod(
        MedNeXtBlock(feat * 2, 2, 3, "group", DT, out_features=feat, stride=2, transpose=True),
        (B, s // 2, s // 2, s // 2, feat * 2),
        f"up{j} (C{feat*2}->C{feat}@{s})",
    )
    total += 2 * bench_mod(
        MedNeXtBlock(feat, 2, 3, "group", DT), (B, s, s, s, feat), f"dec stage{5+j} block x2 (C{feat}@{s})"
    )
# head
total += bench_mod(nn.Conv(1, (1, 1, 1), dtype=jnp.float32), (B, 112, 112, 112, C), "head 1x1 conv")

print(f"\nsum of stages: {total*1e3:.1f} ms for {B}x112^3 = {B*112**3/total/1e6:.1f} Mvox/s processed", flush=True)
print("DONE", flush=True)
