#!/usr/bin/env python
"""Real-TPU validation + microbench of the fused MedNeXt block kernels
(ops/fused_block_pallas.py) against the flax/XLA path at the bench
workload's stage shapes (MedNeXt-S, 112^3 windows, sw_batch=8).

Timing: the op is chained N times on device inside one jitted fori_loop so
a single dispatch + scalar fetch covers all reps (the axon relay has ~1 s
fetch latency, which swamps per-dispatch timing)."""

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

from pytorch_connectomics_tpu.ops.fused_block_pallas import (
    fused_mednext_block,
    reference_block,
)

print("devices:", jax.devices(), flush=True)
REPS = int(os.environ.get("REPS", "20"))


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def params_for(c, r, key, dtype, cout=None):
    cout = cout or c
    ks = jax.random.split(key, 8)
    return dict(
        w_dw=(jax.random.normal(ks[0], (3, 3, 3, c)) * 0.3).astype(dtype),
        b_dw=(jax.random.normal(ks[1], (c,)) * 0.1).astype(dtype),
        gamma=(1.0 + 0.1 * jax.random.normal(ks[2], (c,))).astype(dtype),
        beta=(0.1 * jax.random.normal(ks[3], (c,))).astype(dtype),
        w1=(jax.random.normal(ks[4], (c, r)) / np.sqrt(c)).astype(dtype),
        b1=(0.1 * jax.random.normal(ks[5], (r,))).astype(dtype),
        w2=(jax.random.normal(ks[6], (r, cout)) / np.sqrt(r)).astype(dtype),
        b2=(0.1 * jax.random.normal(ks[7], (cout,))).astype(dtype),
    )


def bench_chained(step, x0, label):
    """step: x -> x (same shape). Times REPS chained applications."""

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, REPS, lambda i, v: step(v), x)

    s = sync(chain(x0))  # compile + run
    t0 = time.time()
    s = sync(chain(x0))
    dt = (time.time() - t0) / REPS
    print(f"{label}: {dt*1e3:.2f} ms/iter (sum={s:.3e})", flush=True)
    return dt


def main():
    # -------- correctness on-chip (small shape) --------
    for dtype in (jnp.float32, jnp.bfloat16):
        name = np.dtype(dtype).name
        try:
            x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 24, 32, 40)).astype(dtype)
            p = params_for(32, 64, jax.random.PRNGKey(2), dtype)
            got = jax.jit(fused_mednext_block)(x, **p)
            want = jax.jit(reference_block)(x, **p)
            d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
            m = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
            print(f"correctness[{name}]: max|diff|={d:.2e} (max|ref|={m:.2f})", flush=True)
        except Exception as e:
            print(f"correctness[{name}] FAILED: {type(e).__name__}: {e}"[:300], flush=True)

    from pytorch_connectomics_tpu.models.mednext import MedNeXtBlock

    # -------- stage shapes: (C, R, Z=Y=X size) --------
    shapes = [(32, 64, 112, 8), (64, 128, 56, 8)]
    for c, r, s, b in shapes:
        # fused kernel path, (B, Z, Y, C, X) layout
        for dtype in (jnp.float32, jnp.bfloat16):
            name = np.dtype(dtype).name
            x = jax.random.normal(jax.random.PRNGKey(3), (b, s, s, c, s)).astype(dtype)
            p = params_for(c, r, jax.random.PRNGKey(4), dtype)

            def step(v, p=p):
                return fused_mednext_block(v, **p)

            try:
                t_fused = bench_chained(step, x, f"fused [{name}] B{b} {s}^3 C{c}")
            except Exception as e:
                print(f"fused[{name}] C{c} FAILED: {type(e).__name__}: {e}"[:300], flush=True)
                continue
        # flax module path (what bench.py runs today), bf16, NDHWC
        mod = MedNeXtBlock(c, r // c, 3, "group", jnp.bfloat16)
        xn = jax.random.normal(jax.random.PRNGKey(5), (b, s, s, s, c)).astype(jnp.bfloat16)
        v = jax.jit(mod.init)(jax.random.PRNGKey(6), xn)

        def flax_step(h, mod=mod, v=v):
            return mod.apply(v, h)

        t_flax = bench_chained(flax_step, xn, f"flax  [bf16] B{b} {s}^3 C{c}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
