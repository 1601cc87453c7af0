#!/usr/bin/env python
"""Space-to-depth (S2D) probe — VERDICT r2 item 2.

Question: can a (2,2,2)->C rearrangement of the full-resolution MedNeXt
stages (C=32 @ 112^3 -> C=256 @ 56^3, full 128-lane tiles) beat XLA's
baseline lowering? Exact-equivalent formulations exist for every full-res
op (weight scatter); this probe measures the *throughput* of each candidate
formulation at bench geometry with random weights. Only if one wins do we
invest in the exact weight mapping + equivalence tests.

Measured candidates per op:
  dw 3^3 conv:  baseline C=32@112^3 (fgc=32)  vs  S2D grouped conv
                C=256@56^3 fgc=32 k=3^3 (exact: 27 of 27*8*8 taps/group
                nonzero -> 8x FMA inflation)  vs  phase-major 216-slice
                shift-FMA (exact, FMA-neutral).
  GroupNorm:    per-channel C=32@112^3  vs  groups=32 over C=256@56^3.
  pointwise:    C=32->64 @112^3  vs  reshape-einsum K=32 @56^3 (exact)
                vs  phase-major grouped conv fgc=8 (exact after one static
                permutation).
  elementwise:  FMA micro at both layouts (quantifies VPU lane fill).
  int8/bf16:    pointwise matmul operand-dtype micro (quantized-inference
                lever).
  full block:   baseline MedNeXtBlock  vs  best S2D block assembly.

Run on the real TPU in the background; prints one line per measurement.
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(Path(__file__).resolve().parents[1] / ".cache" / "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
REPS = int(os.environ.get("REPS", "10"))
DT = jnp.bfloat16
B = int(os.environ.get("S2D_B", "8"))
S = int(os.environ.get("S2D_S", "112"))  # full-res spatial
H = S // 2
C = 32
C8 = C * 8

key = jax.random.PRNGKey(0)


def sync(x):
    return float(jnp.sum(x).astype(jnp.float32))


def bench(fn, args, label, reps=REPS):
    """Chained fori_loop timing: data dependency via mean re-injection."""
    jfn = jax.jit(fn)
    out = jfn(*args)

    @jax.jit
    def run(x0, *rest):
        def body(i, h):
            o = jfn(h, *rest)
            if o.shape == h.shape and o.dtype == h.dtype:
                return o
            return h + jnp.mean(o.astype(jnp.float32)).astype(h.dtype)

        return jax.lax.fori_loop(0, reps, body, x0)

    sync(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        sync(run(*args))
        ts.append((time.time() - t0) / reps)
    dt = sorted(ts)[1]
    print(f"{label:<52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- inputs
x_full = jax.random.normal(key, (B, S, S, S, C)).astype(DT)
x_s2d = jax.random.normal(key, (B, H, H, H, C8)).astype(DT)

# ------------------------------------------------------- elementwise micro
a = jnp.float32(1.0003)


def fma_chain(x):
    for _ in range(16):
        x = x * a.astype(x.dtype) + x
    return x


print("\n-- elementwise FMA chain (16 fused mul-adds, VPU lane-fill probe)")
t_full = bench(fma_chain, (x_full,), f"fma x16  C={C}@{S}^3 (NDHWC)")
t_s2d = bench(fma_chain, (x_s2d,), f"fma x16  C={C8}@{H}^3 (S2D)")
vox = B * S**3 * C * 16
print(f"   -> T-FMA/s: full {vox/t_full/1e12:.2f}  s2d {vox/t_s2d/1e12:.2f}", flush=True)

# ------------------------------------------------------------- GroupNorm
import flax.linen as nn


def gn(groups, c):
    mod = nn.GroupNorm(num_groups=groups, dtype=DT)
    v = jax.jit(mod.init)(key, jnp.zeros((1, 4, 4, 4, c), DT))
    return lambda x: mod.apply(v, x)


print("\n-- GroupNorm (per-orig-channel stats)")
bench(gn(C, C), (x_full,), f"GN groups={C}  C={C}@{S}^3")
bench(gn(C, C8), (x_s2d,), f"GN groups={C} over C={C8}@{H}^3 (S2D exact)")

# ------------------------------------------------------------- depthwise
def dw_full(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", feature_group_count=C,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def dw_s2d_grouped(x, w):
    # exact lowering: fgc=32 groups of 8 phases, k=3^3 (27/1728 per-group
    # taps nonzero after weight scatter; timed dense)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", feature_group_count=C,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def dw_s2d_phase(x, w27):
    # exact FMA-neutral formulation: out[(pz,py,px) block] accumulates 27
    # shifted slices of the right phase block, each scaled per-channel.
    # x channel order: phase-major (p, c) so each phase is a contiguous C=32.
    out = jnp.zeros_like(x)
    for po in range(8):
        poz, poy, pox = po >> 2 & 1, po >> 1 & 1, po & 1
        acc = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        for t in range(27):
            dz, dy, dx = t // 9 - 1, (t // 3) % 3 - 1, t % 3 - 1
            pz, sz = divmod(poz + dz + 2, 2); sz -= 0  # phase & half-res shift
            py, sy = divmod(poy + dy + 2, 2)
            px, sx = divmod(pox + dx + 2, 2)
            pi = (sz << 2) | (sy << 1) | sx
            shz, shy, shx = pz - 1, py - 1, px - 1
            blk = jax.lax.dynamic_slice_in_dim(x, pi * C, C, axis=4)
            if shz or shy or shx:
                blk = jnp.roll(blk, (-shz, -shy, -shx), axis=(1, 2, 3))
            acc = acc + blk * w27[t]
        out = jax.lax.dynamic_update_slice_in_dim(out, acc, po * C, axis=4)
    return out


print("\n-- depthwise 3^3 conv")
w_dwf = jax.random.normal(key, (3, 3, 3, 1, C)).astype(DT)
w_dws = jax.random.normal(key, (3, 3, 3, 8, C8)).astype(DT)
w27 = jax.random.normal(key, (27, C)).astype(DT)
bench(dw_full, (x_full, w_dwf), f"dw baseline      C={C}@{S}^3 fgc={C}")
if os.environ.get("S2D_TRY_GROUPED", "0") == "1":
    # measured 2026-08-17: DOES NOT COMPILE at bench geometry — XLA lays the
    # (32 groups, 8 phases) channel split out as an (8,128)-tiled [.,32,8]
    # minor pair -> 16x padding -> 21.4 GB HBM for one bf16 activation.
    bench(dw_s2d_grouped, (x_s2d, w_dws), f"dw S2D grouped   C={C8}@{H}^3 fgc={C} (8x FMA)")
else:
    print("dw S2D grouped: SKIPPED (OOM: 16x tile padding, see docstring)", flush=True)
bench(dw_s2d_phase, (x_s2d, w27), f"dw S2D phase-major 216-slice (FMA-neutral)")

# ------------------------------------------------------------- pointwise
def pw_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def pw_einsum_s2d(x, w):
    # exact: channel-major (c,p) layout; matmul over c only
    xr = x.reshape(x.shape[:-1] + (C, 8))
    return jnp.einsum("...cp,cd->...dp", xr, w).reshape(
        x.shape[:-1] + (2 * C8,))


def pw_grouped_s2d(x, w):
    # exact in phase-major layout: 8 groups of (32 -> 64)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", feature_group_count=8,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


print("\n-- pointwise expand (32->64 per orig channel)")
w_pwf = jax.random.normal(key, (1, 1, 1, C, 2 * C)).astype(DT)
w_pwe = jax.random.normal(key, (C, 2 * C)).astype(DT)
w_pwg = jax.random.normal(key, (1, 1, 1, C, 2 * C8)).astype(DT)
bench(pw_conv, (x_full, w_pwf), f"pw baseline conv  C={C}->?{2*C}@{S}^3")
bench(pw_einsum_s2d, (x_s2d, w_pwe), f"pw S2D einsum K={C} (channel-major)")
bench(pw_grouped_s2d, (x_s2d, w_pwg), f"pw S2D grouped fgc=8 (phase-major)")

# -------------------------------------------------- int8 / dtype micro
print("\n-- pointwise matmul operand dtypes (quantized-inference lever)")
M = B * H**3
xa = jax.random.normal(key, (M, 128)).astype(DT)
wb = jax.random.normal(key, (128, 128)).astype(DT)


def mm(x, w):
    return jax.lax.dot(x, w, precision=None)


def mm_i8(x, w8, scale):
    return jax.lax.dot_general(
        x, w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale


bench(mm, (xa, wb), "matmul bf16xbf16 (M=8*56^3,K=128,N=128)")
xi8 = (xa * 10).astype(jnp.int8)
wi8 = (wb * 10).astype(jnp.int8)
bench(mm_i8, (xi8, wi8, jnp.float32(0.01)), "matmul int8xint8 -> f32 (same shape)")

# ---------------------------------------------------------- full blocks
from pytorch_connectomics_tpu.models.mednext import MedNeXtBlock


class S2DBlock(nn.Module):
    """S2D-space MedNeXt block, phase-major (p, c) layout: dw via the
    216-slice phase formulation, per-orig-channel GN via reshape stats,
    pw as fgc=8 grouped convs (each group a K=32 matmul)."""

    @nn.compact
    def __call__(self, x):
        w27 = self.param("w27", nn.initializers.normal(), (27, C), DT)
        y = dw_s2d_phase(x, w27)
        # GN per original channel: stats over (spatial, phases) for each c
        yr = y.astype(jnp.float32).reshape(y.shape[:-1] + (8, C))
        mu = yr.mean(axis=(1, 2, 3, 4), keepdims=True)
        var = yr.var(axis=(1, 2, 3, 4), keepdims=True)
        g = self.param("g", nn.initializers.ones, (C,), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (C,), jnp.float32)
        yr = (yr - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        y = yr.reshape(y.shape).astype(DT)
        w1 = self.param("w1", nn.initializers.normal(), (1, 1, 1, C, 2 * C8), DT)
        y = jax.lax.conv_general_dilated(
            y, w1, (1, 1, 1), "SAME", feature_group_count=8,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = nn.gelu(y)
        w2 = self.param("w2", nn.initializers.normal(), (1, 1, 1, 2 * C, C8), DT)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1, 1), "SAME", feature_group_count=8,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return x + y


print("\n-- full stage-0 block")
blk = MedNeXtBlock(C, 2, 3, "group", DT)
vb = jax.jit(blk.init)(key, x_full)
bench(lambda x: blk.apply(vb, x), (x_full,), f"MedNeXtBlock baseline C={C}@{S}^3")
s2db = S2DBlock()
vs = jax.jit(s2db.init)(key, x_s2d)
bench(lambda x: s2db.apply(vs, x), (x_s2d,), f"S2DBlock C={C8}@{H}^3 (grouped dw + einsum pw)")

print("\nDONE", flush=True)
