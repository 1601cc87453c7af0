#!/usr/bin/env python
"""XLA-level rewrites of the layout-crippled MedNeXt layers, timed on TPU:
R1: depthwise 3^3 conv as 27 static-slice FMAs (vs lax conv feature_group).
R2: stride-2 depthwise conv as decimated-slice FMAs (down block path).
R3: ConvTranspose k3 s2 as 8-phase dense 2^3 convs + interleave (up path).
R4: stem/head pointwise conv via CF pallas pw kernel vs XLA conv.
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

print("devices:", jax.devices(), flush=True)
REPS = int(os.environ.get("REPS", "10"))
DT = jnp.bfloat16


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, args, label, chained_idx=None):
    @jax.jit
    def chain(*a):
        def body(i, state):
            out = fn(*state[0]) + 0 * i
            if chained_idx is None:
                return ((state[0][0] + 0 * jnp.mean(out).astype(state[0][0].dtype),) + state[0][1:], out)
            a2 = list(state[0])
            a2[chained_idx] = out
            return (tuple(a2), out)

        return jax.lax.fori_loop(0, REPS, body, (a, fn(*a)))[1]

    try:
        s = sync(chain(*args))
        t0 = time.time()
        s = sync(chain(*args))
        dt = (time.time() - t0) / REPS
        print(f"{label}: {dt*1e3:.2f} ms (sum={s:.3e})", flush=True)
        return dt
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {e}"[:250], flush=True)
        return None


B, S, C = 8, 112, 32

# ---------------- R1: dw conv as 27 shift-FMAs ----------------
x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, S, C)).astype(DT)
wd = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C)) * 0.2).astype(DT)


def dw_shift_add(v, w):
    xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(v, dtype=jnp.float32)
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                sl = jax.lax.slice(
                    xp, (0, kz, ky, kx, 0), (B, kz + S, ky + S, kx + S, C)
                )
                acc = acc + w[kz, ky, kx].astype(jnp.float32) * sl.astype(jnp.float32)
    return acc.astype(v.dtype)


def dw_conv(v, w):
    return jax.lax.conv_general_dilated(
        v, w[..., None, :], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
    )


timeit(dw_shift_add, (x, wd), "R1 dw shift-add bf16-in f32-acc")


def dw_shift_add16(v, w):
    xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(v)
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                sl = jax.lax.slice(
                    xp, (0, kz, ky, kx, 0), (B, kz + S, ky + S, kx + S, C)
                )
                acc = acc + w[kz, ky, kx] * sl
    return acc


timeit(dw_shift_add16, (x, wd), "R1 dw shift-add pure bf16")
timeit(dw_conv, (x, wd), "R1 dw lax.conv (current)")

# ---------------- R2: stride-2 dw conv ----------------
def dw_s2_shift(v, w):
    xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    h = S // 2
    acc = jnp.zeros((B, h, h, h, C), jnp.float32)
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                sl = jax.lax.slice(
                    xp, (0, kz, ky, kx, 0), (B, kz + S - 1, ky + S - 1, kx + S - 1, C),
                    (1, 2, 2, 2, 1),
                )
                acc = acc + w[kz, ky, kx].astype(jnp.float32) * sl.astype(jnp.float32)
    return acc.astype(v.dtype)


def dw_s2_conv(v, w):
    return jax.lax.conv_general_dilated(
        v, w[..., None, :], (2, 2, 2), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=C,
    )


timeit(dw_s2_shift, (x, wd), "R2 dw s2 decimated shift-add")
timeit(dw_s2_conv, (x, wd), "R2 dw s2 lax.conv (current)")

# ---------------- R3: transpose conv k3 s2 ----------------
CI, CO, SL = 64, 32, 56
xl = jax.random.normal(jax.random.PRNGKey(2), (B, SL, SL, SL, CI)).astype(DT)
wt = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, CI, CO)) * 0.05).astype(DT)


def upconv_xla(v, w):
    return jax.lax.conv_transpose(
        v, w, (2, 2, 2), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


def upconv_phase(v, w):
    """8-phase decomposition: out[.., p + 2i, ..] = sum over the <=2^3
    subkernel w[taps at parity p]. All phases are dense 1- or 2-tap convs at
    LOW resolution -> pure matmuls, then interleave."""
    outs = {}
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                acc = None
                # output index o = 2i + p; kernel tap k (same parity as p)
                # contributes from input i + d, d = (p - k + 1)//2
                for kz in range(pz, 3, 2):
                    for ky in range(py, 3, 2):
                        for kx in range(px, 3, 2):
                            dz, dy, dx = (pz - kz + 1) // 2, (py - ky + 1) // 2, (px - kx + 1) // 2
                            sl = jax.lax.slice(
                                vp,
                                (0, 1 + dz, 1 + dy, 1 + dx, 0),
                                (B, 1 + dz + SL, 1 + dy + SL, 1 + dx + SL, CI),
                            )
                            t = jnp.einsum(
                                "bzyxc,co->bzyxo", sl, w[kz, ky, kx],
                                preferred_element_type=jnp.float32,
                            )
                            acc = t if acc is None else acc + t
                outs[(pz, py, px)] = acc.astype(v.dtype)
    # interleave phases
    z = jnp.stack(
        [outs[(pz, py, px)] for pz in range(2) for py in range(2) for px in range(2)],
        axis=-1,
    )  # (B, S, S, S, CO, 8)
    z = z.reshape(B, SL, SL, SL, CO, 2, 2, 2)
    z = jnp.transpose(z, (0, 1, 5, 2, 6, 3, 7, 4))
    return z.reshape(B, 2 * SL, 2 * SL, 2 * SL, CO)


timeit(upconv_xla, (xl, wt), "R3 conv_transpose XLA (current)")
timeit(upconv_phase, (xl, wt), "R3 conv_transpose 8-phase einsum")

# correctness cross-check (small)
xs = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 6, 6, 4)).astype(jnp.float32)
ws = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 3, 4, 2)).astype(jnp.float32)


def up_phase_small(v, w):
    global B, SL, CI, CO
    ob, osl, oci, oco = B, SL, CI, CO
    B2, SL2, CI2, CO2 = v.shape[0], v.shape[1], v.shape[-1], w.shape[-1]
    try:
        B, SL, CI, CO = B2, SL2, CI2, CO2
        return upconv_phase(v, w)
    finally:
        B, SL, CI, CO = ob, osl, oci, oco


try:
    a = jax.jit(upconv_xla)(xs, ws)
    b = jax.jit(up_phase_small)(xs, ws)
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"R3 correctness: max|diff|={d:.2e} (shapes {a.shape} vs {b.shape})", flush=True)
except Exception as e:
    print(f"R3 correctness FAILED: {type(e).__name__}: {e}"[:300], flush=True)

# ---------------- R4: pointwise head via matmul reshape ----------------
xh = jax.random.normal(jax.random.PRNGKey(6), (B, S, S, S, C)).astype(DT)
wh = (jax.random.normal(jax.random.PRNGKey(7), (C, 1)) * 0.2).astype(jnp.float32)


def head_conv(v, w):
    return jax.lax.conv_general_dilated(
        v.astype(jnp.float32), w[None, None, None], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def head_dense(v, w):
    return jnp.einsum("bzyxc,co->bzyxo", v.astype(jnp.float32), w)


def head_dense_bf16(v, w):
    return jnp.einsum(
        "bzyxc,co->bzyxo", v, w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


timeit(head_conv, (xh, wh), "R4 head 1x1 conv f32 (current)")
timeit(head_dense, (xh, wh), "R4 head einsum f32")
timeit(head_dense_bf16, (xh, wh), "R4 head einsum bf16->f32")
print("DONE", flush=True)
