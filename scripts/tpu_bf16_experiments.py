#!/usr/bin/env python
"""TPU experiments:
E1: which CF-kernel op crashes Mosaic under bf16 (roll? slice? scratch write?)
E2: bf16-cast-before-dot inside an f32 CF kernel — compiles? how fast?
E3: CF pointwise matmul kernel rate (stem/head replacement feasibility).
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


# ---------------- E1: isolate bf16 crash ----------------
def _probe_kernel(x_ref, o_ref, *, op):
    a = x_ref[...]  # (C, F)
    if op == "roll":
        o_ref[...] = pltpu.roll(a, 5, axis=1)
    elif op == "slice":
        o_ref[...] = jnp.pad(a[:, 128:], ((0, 0), (0, 128)))
    elif op == "scratch_off":
        o_ref[...] = a
    elif op == "copy":
        o_ref[...] = a


for dtype in (jnp.bfloat16,):
    for op in ("copy", "roll", "slice"):
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 14592)).astype(dtype)
        f = pl.pallas_call(
            functools.partial(_probe_kernel, op=op),
            out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        )
        try:
            _ = sync(jax.jit(f)(x))
            print(f"E1 {op} [bf16 (32,14592)]: OK", flush=True)
        except Exception as e:
            print(f"E1 {op} [bf16] FAILED: {type(e).__name__}: {e}"[:200], flush=True)


# scratch write at sublane offset (the xcat staging pattern)
def _scratch_kernel(x_ref, o_ref, s_ref):
    a = x_ref[...]
    for kx in range(3):
        s_ref[kx * 32 : (kx + 1) * 32, :] = pltpu.roll(a, kx, axis=1)
    o_ref[...] = s_ref[32:64, :]


for dtype in (jnp.bfloat16,):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 14592)).astype(dtype)
    f = pl.pallas_call(
        _scratch_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        scratch_shapes=[pltpu.VMEM((96, 14592), dtype)],
    )
    try:
        _ = sync(jax.jit(f)(x))
        print("E1 scratch-stage [bf16]: OK", flush=True)
    except Exception as e:
        print(f"E1 scratch-stage [bf16] FAILED: {type(e).__name__}: {e}"[:200], flush=True)


# ---------------- E2: f32 CF apply kernel with bf16 dot operands ----------
from pytorch_connectomics_tpu.ops.fused_block_pallas import to_cf


def _apply_b16_kernel(x0, x1, x2, w_ref, o_ref, xcat_s, *, cast, k=3, y_size=112):
    f = x0.shape[-1]
    c = x0.shape[-2]
    planes = (x0, x1, x2)
    for kz in range(k):
        a = planes[kz][0, 0]
        for kx in range(k):
            off = kx - 1
            xcat_s[kz, kx * c : (kx + 1) * c, :] = (
                a if off == 0 else pltpu.roll(a, (-off) % f, axis=1)
            )
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
    o_ref[0, 0] = acc[: o_ref.shape[2]].astype(o_ref.dtype)


def apply_b16(x_cf, wbig, cast, y_size=112):
    b, zp, c, f = x_cf.shape
    r = wbig.shape[1]
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
        functools.partial(_apply_b16_kernel, cast=cast, y_size=y_size),
        grid=(b, zp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, c, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, zp, c, f), x_cf.dtype),
        scratch_shapes=[pltpu.VMEM((3, 3 * c, f), x_cf.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(x_cf, x_cf, x_cf, wbig)


B, S, C, R = 8, 112, 32, 64
x = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, C, S), jnp.float32)
x_cf = jax.jit(functools.partial(to_cf, k=3))(x)
wbig = jax.random.normal(jax.random.PRNGKey(2), (9, R, 3 * C), jnp.float32) * 0.1
for cast in (False, True):
    timeit(
        lambda v, cast=cast: apply_b16(v, wbig, cast),
        x_cf,
        f"E2 tap-matmuls f32-store dot={'bf16' if cast else 'f32'} (R={R})",
    )

# ---------------- E3: CF pointwise (stem/head) kernel ----------------
def _pw_kernel(x_ref, w_ref, o_ref):
    o_ref[0, 0] = jax.lax.dot_general(
        w_ref[...], x_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pw_cf(x_cf, w):
    b, zp, c, f = x_cf.shape
    cout = w.shape[0]
    return pl.pallas_call(
        _pw_kernel,
        grid=(b, zp),
        in_specs=[
            pl.BlockSpec((1, 1, c, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cout, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, zp, cout, f), x_cf.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(x_cf, w)


for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    xcf = x_cf.astype(dtype)
    w32 = (jax.random.normal(jax.random.PRNGKey(3), (32, 32)) * 0.2).astype(dtype)
    dt = timeit(lambda v: pw_cf(v, w32), xcf, f"E3 pw 32->32 CF [{name}] B8 112^3")
    if dt:
        gb = 2 * x_cf.size * np.dtype(dtype).itemsize / 1e9
        print(f"   -> {gb/dt:.0f} GB/s effective", flush=True)
print("DONE", flush=True)
