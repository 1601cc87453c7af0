#!/usr/bin/env python
"""TPU experiments round 2:
E1b: bf16 lane shift via slice+pad (pltpu.roll crashes Mosaic on bf16).
E2:  tap-matmul apply kernel, f32 vs bf16 dot operands (fixed out write).
E3b: CF pointwise with z-blocked grid (amortize per-step overhead).
"""

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
REPS = int(os.environ.get("REPS", "20"))


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
        print(f"{label}: {dt*1e3:.2f} ms (sum={s:.3e})", flush=True)
        return dt
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {e}"[:220], flush=True)
        return None


def shift_lanes(a, off, f):
    """Lane shift with zero fill via slice+pad (bf16-safe; pltpu.roll
    crashes Mosaic on bf16). off = tap offset: reads x + off."""
    if off == 0:
        return a
    if off > 0:
        return jnp.pad(a[:, off:], ((0, 0), (0, off)))
    return jnp.pad(a[:, :off], ((0, 0), (-off, 0)))


# ---------------- E1b: bf16 slice+pad shift ----------------
def _shift_kernel(x_ref, o_ref):
    o_ref[...] = shift_lanes(x_ref[...], 1, x_ref.shape[-1])


for dtype in (jnp.bfloat16, jnp.float32):
    name = np.dtype(dtype).name
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 14592)).astype(dtype)
    f = pl.pallas_call(_shift_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, dtype))
    try:
        _ = sync(jax.jit(f)(x))
        print(f"E1b slice+pad shift [{name}]: OK", flush=True)
    except Exception as e:
        print(f"E1b slice+pad shift [{name}] FAILED: {type(e).__name__}"[:200], flush=True)


# ---------------- E2: tap matmuls with fixed write ----------------
def _apply_kernel(x0, x1, x2, w_ref, o_ref, xcat_s, *, cast, k=3, y_size=112):
    f = x0.shape[-1]
    c = x0.shape[-2]
    planes = (x0, x1, x2)
    for kz in range(k):
        a = planes[kz][0, 0]
        for kx in range(k):
            xcat_s[kz, kx * c : (kx + 1) * c, :] = shift_lanes(a, kx - 1, f)
    n = y_size * LANE
    r = w_ref.shape[1]
    acc = jnp.zeros((r, n), jnp.float32)
    for kz in range(k):
        for ky in range(k):
            tap = xcat_s[kz, :, ky * LANE : ky * LANE + n]
            w = w_ref[kz * k + ky]
            if cast:
                tap = tap.astype(jnp.bfloat16)
                w = w.astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                w, tap, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    cout = o_ref.shape[2]
    o_ref[0, 0, :, 0:LANE] = jnp.zeros((cout, LANE), o_ref.dtype)
    o_ref[0, 0, :, LANE : LANE + n] = acc[:cout].astype(o_ref.dtype)
    o_ref[0, 0, :, LANE + n :] = jnp.zeros((cout, f - LANE - n), o_ref.dtype)


def apply_taps(x_cf, wbig, cast, y_size=112):
    b, zp, c, f = x_cf.shape
    in_specs = [
        pl.BlockSpec(
            (1, 1, c, f),
            functools.partial(
                lambda bi, zi, kz_: (bi, jnp.clip(zi - 1 + kz_, 0, zp - 1), 0, 0),
                kz_=kz,
            ),
            memory_space=pltpu.VMEM,
        )
        for kz in range(3)
    ]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_apply_kernel, cast=cast, y_size=y_size),
        grid=(b, zp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, c, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, zp, c, f), x_cf.dtype),
        scratch_shapes=[pltpu.VMEM((3, 3 * c, f), x_cf.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(x_cf, x_cf, x_cf, wbig)


from pytorch_connectomics_tpu.ops.fused_block_pallas import to_cf

B, S, C, R = 8, 112, 32, 64
x = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, C, S), jnp.float32)
x_cf = jax.jit(functools.partial(to_cf, k=3))(x)
wbig = jax.random.normal(jax.random.PRNGKey(2), (9, R, 3 * C), jnp.float32) * 0.1
for cast in (False, True):
    dt = timeit(
        lambda v, cast=cast: apply_taps(v, wbig, cast),
        x_cf,
        f"E2 tap-matmuls f32-stage dot={'bf16' if cast else 'f32'} (R={R})",
    )
    if dt:
        mac = 9 * R * 3 * C * S * S * LANE * (S + 2) * B / (S + 2)  # ~ per out plane
        mac = 27 * R * C * (S * S * LANE) * S * B  # true interior taps
        print(f"   -> {27*R*C*S*S*128*S*B/dt/1e12:.1f} T-MAC/s", flush=True)

# bf16 storage variant: stage scratch in bf16 (slice+pad shifts only)
x_cf16 = x_cf.astype(jnp.bfloat16)
wbig16 = wbig.astype(jnp.bfloat16)
dt = timeit(
    lambda v: apply_taps(v, wbig16, False),
    x_cf16,
    "E2 tap-matmuls bf16-stage bf16-dot",
)

# ---------------- E3b: z-blocked CF pointwise ----------------
def _pw_kernel(x_ref, w_ref, o_ref):
    zb = x_ref.shape[1]
    for z in range(zb):
        o_ref[0, z] = jax.lax.dot_general(
            w_ref[...], x_ref[0, z], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def pw_cf(x_cf, w, zb):
    b, zp, c, f = x_cf.shape
    cout = w.shape[0]
    return pl.pallas_call(
        _pw_kernel,
        grid=(b, zp // zb),
        in_specs=[
            pl.BlockSpec((1, zb, c, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, zb, cout, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, zp, cout, f), x_cf.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(x_cf, w)


xpad = jnp.pad(x_cf, ((0, 0), (0, 6), (0, 0), (0, 0)))  # zp 114 -> 120
for zb in (4, 8):
    for dtype, name in ((jnp.bfloat16, "bf16"),):
        xcf = xpad.astype(dtype)
        w32 = (jax.random.normal(jax.random.PRNGKey(3), (32, 32)) * 0.2).astype(dtype)
        dt = timeit(lambda v, zb=zb: pw_cf(v, w32, zb), xcf, f"E3b pw 32->32 CF zb={zb} [{name}]")
        if dt:
            gb = 2 * xcf.size * np.dtype(dtype).itemsize / 1e9
            print(f"   -> {gb/dt:.0f} GB/s effective", flush=True)
print("DONE", flush=True)
