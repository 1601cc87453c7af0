#!/usr/bin/env python
"""Probe the v5e VPU's sustained FMA rate on VMEM-resident data, and time a
CF-layout depthwise-3^3 stencil kernel prototype (VPU FMAs + lane rolls)
against the numbers that matter (flax dw-conv ~28 ms at stage-0 shapes)."""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
LANE = 128


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, x, label, reps=20):
    @jax.jit
    def chain(v):
        return jax.lax.fori_loop(0, reps, lambda i, a: fn(a), v)

    s = sync(chain(x))
    t0 = time.time()
    s = sync(chain(x))
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms (sum={s:.3e})", flush=True)
    return dt


# ---------------- 1. raw VPU FMA rate, VMEM-resident ----------------
def _fma_kernel(x_ref, o_ref, *, inner):
    a = x_ref[...]
    acc = jnp.zeros_like(a)
    for i in range(inner):
        acc = acc + a * (1.0 + i * 1e-6)  # FMA chainable
    o_ref[...] = acc


for dtype in (jnp.float32, jnp.bfloat16):
    name = np.dtype(dtype).name
    shape = (256, 1024)  # 1 MB f32, VMEM resident
    inner = 256
    x = jax.random.normal(jax.random.PRNGKey(0), shape).astype(dtype)
    try:
        f = pl.pallas_call(
            functools.partial(_fma_kernel, inner=inner),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )
        dt = timeit(jax.jit(f), x, f"vpu fma [{name}] {shape} x{inner}")
        fma = np.prod(shape) * inner
        print(f"  -> {fma/dt/1e12:.2f} T-FMA/s", flush=True)
    except Exception as e:
        print(f"vpu fma [{name}] FAILED: {type(e).__name__}: {e}"[:300], flush=True)


# ---------------- 2. CF depthwise stencil prototype ----------------
# x_cf: (B, Zp, C, F) with F = Yp*128, zero pad lanes/halo (fused_block CF
# layout). out = dw3^3(x) interior, same CF shape.
def _dw_kernel(x0, x1, x2, w_ref, o_ref, *, k, y_size, z_size, f):
    z = pl.program_id(1)
    p = k // 2
    interior = jnp.logical_and(z >= p, z < p + z_size)

    @pl.when(jnp.logical_not(interior))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(interior)
    def _():
        planes = (x0, x1, x2)
        n = y_size * LANE
        c = o_ref.shape[-2]
        acc = jnp.zeros((c, n), jnp.float32)
        for kz in range(k):
            pl_ = planes[kz][0, 0]  # (C, F)
            for kx in range(k):
                off = kx - p
                rolled = pl_ if off == 0 else pltpu.roll(pl_, (-off) % f, axis=1)
                for ky in range(k):
                    tap = rolled[:, ky * LANE : ky * LANE + n]
                    acc = acc + w_ref[kz * k * k + ky * k + kx][:, None] * tap.astype(
                        jnp.float32
                    )
        o_ref[0, 0, :, 0 : p * LANE] = jnp.zeros((c, p * LANE), o_ref.dtype)
        o_ref[0, 0, :, p * LANE : p * LANE + n] = acc.astype(o_ref.dtype)
        o_ref[0, 0, :, p * LANE + n :] = jnp.zeros((c, f - p * LANE - n), o_ref.dtype)


def dw_cf(x_cf, w, y_size, z_size, k=3):
    b, zp, c, f = x_cf.shape
    p = k // 2
    in_specs = [
        pl.BlockSpec(
            (1, 1, c, f),
            functools.partial(
                lambda bi, zi, kz_: (bi, jnp.clip(zi - p + kz_, 0, zp - 1), 0, 0),
                kz_=kz,
            ),
            memory_space=pltpu.VMEM,
        )
        for kz in range(k)
    ]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_dw_kernel, k=k, y_size=y_size, z_size=z_size, f=f),
        grid=(b, zp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, c, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x_cf.shape, x_cf.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x_cf, x_cf, x_cf, w)


from pytorch_connectomics_tpu.ops.fused_block_pallas import to_cf

B, Z, Y, X, C = 8, 112, 112, 112, 32
for dtype in (jnp.float32, jnp.bfloat16):
    name = np.dtype(dtype).name
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Z, Y, C, X)).astype(dtype)
    w = jax.random.normal(jax.random.PRNGKey(2), (27, C)).astype(jnp.float32)
    x_cf = jax.jit(to_cf)(x)
    try:
        dt = timeit(
            jax.jit(lambda v: dw_cf(v, w, Y, Z)),
            x_cf,
            f"dw stencil CF [{name}] B{B} {Z}^3 C{C}",
        )
        fma = 27 * B * Z * Y * C * 128  # incl. pad lanes (vector width)
        print(f"  -> {fma/dt/1e12:.2f} T-FMA/s effective", flush=True)
    except Exception as e:
        print(f"dw stencil [{name}] FAILED: {type(e).__name__}: {e}"[:300], flush=True)

# XLA depthwise conv comparison (NDHWC, feature_group_count)
for dtype in (jnp.bfloat16,):
    name = np.dtype(dtype).name
    xn = jax.random.normal(jax.random.PRNGKey(3), (B, Z, Y, X, C)).astype(dtype)
    wd = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 3, 1, C)).astype(dtype)

    def xla_dw(v):
        return jax.lax.conv_general_dilated(
            v, wd, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=C,
        )

    timeit(jax.jit(xla_dw), xn, f"xla dw conv [{name}] B{B} {Z}^3 C{C}")
print("DONE", flush=True)
