#!/usr/bin/env python
"""Layout probe: XLA dw-conv / pointwise / full block in NCDHW (C before
spatial; X lands on lanes) vs NDHWC (C on lanes) at stage-0 shapes."""

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

print("devices:", jax.devices(), flush=True)
REPS = int(os.environ.get("REPS", "10"))
DT = jnp.bfloat16
B, S, C = 8, 112, 32


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, x, label):
    @jax.jit
    def chain(v):
        return jax.lax.fori_loop(0, REPS, lambda i, a: fn(a), v)

    try:
        s = sync(chain(x))
        t0 = time.time()
        s = sync(chain(x))
        dt = (time.time() - t0) / REPS
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {e}"[:200], flush=True)


wd = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 1, C)) * 0.2).astype(DT)
wp = (jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, C, 2 * C)) * 0.2).astype(DT)

# NDHWC (current)
x1 = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, S, C)).astype(DT)
timeit(
    lambda v: jax.lax.conv_general_dilated(
        v, wd, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C),
    x1, "dw NDHWC (current)")
timeit(
    lambda v: jax.lax.conv_general_dilated(
        jax.lax.conv_general_dilated(
            v, wd, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C),
        wp, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[..., :C],
    x1, "dw+pw NDHWC")

# NCDHW (X on lanes)
x2 = jax.random.normal(jax.random.PRNGKey(0), (B, C, S, S, S)).astype(DT)
wd2 = jnp.transpose(wd, (4, 3, 0, 1, 2))  # OIDHW
wp2 = jnp.transpose(wp, (4, 3, 0, 1, 2))
timeit(
    lambda v: jax.lax.conv_general_dilated(
        v, wd2, (1, 1, 1), "SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), feature_group_count=C),
    x2, "dw NCDHW (X on lanes)")
timeit(
    lambda v: jax.lax.conv_general_dilated(
        jax.lax.conv_general_dilated(
            v, wd2, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"), feature_group_count=C),
        wp2, (1, 1, 1), "SAME", dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))[:, :C],
    x2, "dw+pw NCDHW")
print("DONE", flush=True)
