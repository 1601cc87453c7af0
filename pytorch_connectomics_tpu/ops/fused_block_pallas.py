"""Fused MedNeXt block for TPU: dw-conv + per-channel GroupNorm + pointwise
expand + GELU + pointwise compress + residual, as two Pallas kernels.

Why: XLA's depthwise-3^3 lowering runs at ~0.7 TFLOPS / 50 GB/s at EM stage-0
shapes and the VPU can only sustain ~0.5 T-FMA/s, so neither a conv nor a
27-tap VPU stencil can be fast. The trick is algebraic: GroupNorm's
normalization and affine are LINEAR in the dw output, so

    pw1(GN(dw(x))) = sum_{kz,ky} Wbig[(kz,ky)] @ xcat[(kz,ky)] + b'

where xcat stacks the kx in-lane-rolled copies of x on the channel
(sublane) axis (K = k*C contraction depth) and
``Wbig[r, kx*C+c] = w_dw[kz,ky,kx,c] * s_c * W1[c,r]`` with
``s_c = gamma_c * rsqrt(var_c + eps)``. The whole dw conv + GN ride the MXU
inside the expand matmul; only per-(b,c) stats need a separate (cheap)
pass. Layout is (B, Z, Y, C, X): X on lanes (kx shifts = lane rolls),
C on sublanes (contraction axis), Z/Y leading (kz/ky shifts = free slices).

Reference semantics: ``MedNeXtBlock`` (models/mednext.py; reference
``mednext_models.py:304``) with norm = per-channel GroupNorm.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _lane_shift(v, kx: int, k: int, x_size: int):
    """Value of x at lane position (x + kx - k//2) with zero boundary.

    v: (..., X) with X on lanes. Static kx.
    """
    off = kx - k // 2
    if off == 0:
        return v
    rolled = pltpu.roll(v, (-off) % x_size, axis=v.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    if off > 0:  # reads x+off: last `off` lanes out of range
        return jnp.where(lane < x_size - off, rolled, 0)
    return jnp.where(lane >= -off, rolled, 0)


def _build_xcat(rows, k: int, x_size: int):
    """rows: (Yp, C, X) -> (Yp, k*C, X): kx-shifted copies stacked on C."""
    return jnp.concatenate(
        [_lane_shift(rows, kx, k, x_size) for kx in range(k)], axis=1
    )


# ---------------------------------------------------------------------------
# stats kernel: per-(b, c) sum and sumsq of dw(x) over spatial dims
# ---------------------------------------------------------------------------


def _stats_kernel(*refs, k: int, x_size: int, y_size: int, z_size: int):
    # refs: k input row-specs, wdw_ref, out_ref
    in_refs = refs[:k]
    wdw_ref, out_ref = refs[k], refs[k + 1]
    z = pl.program_id(1)

    @pl.when(z == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_and(z >= 1, z <= z_size))
    def _():
        c = out_ref.shape[-1]
        acc = jnp.zeros((c, y_size, x_size), jnp.float32)
        for kz in range(k):
            rows = in_refs[kz][0, 0]  # (Yp, C, X)
            xcat = _build_xcat(rows, k, x_size)  # (Yp, kC, X)
            for ky in range(k):
                tap = xcat[ky : ky + y_size]  # (Y, kC, X)
                w = wdw_ref[kz * k + ky]  # (C, kC) diagonal-expanded
                acc = acc + jax.lax.dot_general(
                    w, tap,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C, Y, X)
        lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
        acc = jnp.where(lane < x_size, acc, 0.0)
        s = jnp.sum(acc, axis=(1, 2))  # (C,)
        s2 = jnp.sum(acc * acc, axis=(1, 2))
        out_ref[0, 0, :] += s
        out_ref[0, 1, :] += s2


def dw_stats(x_pad: jax.Array, w_dw: jax.Array, k: int = 3):
    """Per-(b, c) [sum, sumsq] of the depthwise conv output.

    x_pad: (B, Z+2p, Y+2p, C, X) zero-padded in Z and Y by p = k//2.
    w_dw: (k, k, k, C) depthwise taps. Returns (B, 2, C) float32.
    """
    b, zp, yp, c, x = x_pad.shape
    p = k // 2
    z_size, y_size = zp - 2 * p, yp - 2 * p
    # diagonal-expanded taps: (k*k, C, k*C); [t, c', kx*C+c] = delta * w
    w = np.zeros((k * k, c, k * c), np.float32)
    wnp = np.asarray(w_dw, np.float32)
    for kz in range(k):
        for ky in range(k):
            for kx in range(k):
                w[kz * k + ky, np.arange(c), kx * c + np.arange(c)] = wnp[kz, ky, kx]
    w = jnp.asarray(w)

    in_specs = [
        pl.BlockSpec(
            (1, 1, yp, c, x),
            functools.partial(
                lambda bi, zi, kz_: (bi, jnp.clip(zi - 1 + kz_, 0, zp - 1), 0, 0, 0),
                kz_=kz,
            ),
            memory_space=pltpu.VMEM,
        )
        for kz in range(k)
    ]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # weights
    grid = (b, z_size + 2)
    return pl.pallas_call(
        functools.partial(
            _stats_kernel, k=k, x_size=x, y_size=y_size, z_size=z_size
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, c), lambda bi, zi: (bi, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
    )(*([x_pad] * k), w)


# ---------------------------------------------------------------------------
# apply kernel: out = x + pw2(gelu(Wbig9 (x) xcat + b1')) + b2-fold
# ---------------------------------------------------------------------------


def _apply_kernel(*refs, k: int, x_size: int, y_size: int, z_size: int):
    # refs: k input row-specs, wbig_ref (k*k, R, kC), b1_ref (1, R),
    #       w2_ref (Cout, R), b2_ref (1, Cout), out_ref (1, 1, Y, C, X)
    in_refs = refs[:k]
    wbig_ref, b1_ref, w2_ref, b2_ref, out_ref = refs[k : k + 5]
    r = wbig_ref.shape[1]
    cout = w2_ref.shape[0]

    acc = jnp.zeros((r, y_size, x_size), jnp.float32)
    for kz in range(k):
        rows = in_refs[kz][0, 0]  # (Yp, C, X)
        xcat = _build_xcat(rows, k, x_size)  # (Yp, kC, X)
        for ky in range(k):
            tap = xcat[ky : ky + y_size]
            w = wbig_ref[kz * k + ky]  # (R, kC)
            acc = acc + jax.lax.dot_general(
                w, tap,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, Y, X)
    h = acc + b1_ref[0][:, None, None]
    h = jax.nn.gelu(h, approximate=True)
    o = jax.lax.dot_general(
        w2_ref[...].astype(jnp.float32), h,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Cout, Y, X)
    o = o + b2_ref[0][:, None, None]
    # residual: center row of the kz = center spec, trimmed to (Y, C, X)
    p = k // 2
    resid = in_refs[p][0, 0, p : p + y_size].astype(jnp.float32)  # (Y, C, X)
    o = jnp.transpose(o, (1, 0, 2))  # (Y, Cout, X)
    if cout == resid.shape[1]:
        o = o + resid
    out_ref[0, 0] = o.astype(out_ref.dtype)


def fused_block_apply(
    x_pad: jax.Array,
    wbig: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    k: int = 3,
    out_dtype=None,
):
    """x_pad: (B, Z+2p, Y+2p, C, X); wbig: (k*k, R, k*C) folded weights;
    b1: (R,) folded bias; w2: (Cout, R); b2: (Cout,).
    Returns (B, Z, Y, Cout, X) = x + pw2(gelu(pw1(GN(dw(x))))).
    """
    b, zp, yp, c, x = x_pad.shape
    p = k // 2
    z_size, y_size = zp - 2 * p, yp - 2 * p
    kk, r, kc = wbig.shape
    cout = w2.shape[0]
    out_dtype = out_dtype or x_pad.dtype

    in_specs = [
        pl.BlockSpec(
            (1, 1, yp, c, x),
            functools.partial(
                lambda bi, zi, kz_: (bi, zi + kz_, 0, 0, 0), kz_=kz
            ),
            memory_space=pltpu.VMEM,
        )
        for kz in range(k)
    ]
    for _ in range(4):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    grid = (b, z_size)
    return pl.pallas_call(
        functools.partial(
            _apply_kernel, k=k, x_size=x, y_size=y_size, z_size=z_size
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, y_size, cout, x), lambda bi, zi: (bi, zi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, z_size, y_size, cout, x), out_dtype),
    )(
        *([x_pad] * k),
        wbig,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
    )


# ---------------------------------------------------------------------------
# full block: stats -> fold -> apply
# ---------------------------------------------------------------------------


def fold_block_weights(
    w_dw: jax.Array,  # (k,k,k,C) taps
    b_dw: jax.Array,  # (C,)
    gamma: jax.Array,  # (C,)
    beta: jax.Array,  # (C,)
    w1: jax.Array,  # (C, R)
    b1: jax.Array,  # (R,)
    mean: jax.Array,  # (B, C) stats of dw(x) (bias NOT included)
    var: jax.Array,  # (B, C)
    eps: float = 1e-6,
):
    """Fold GN into the expand matmul. Returns (wbig (B,k*k,R,k*C), b1eff (B,R)).

    t = dw(x) + b_dw;  GN(t) = (t - mu_t) * s + beta,  s = gamma*rsqrt(var+eps)
    pw1(GN(t)) = W1^T (s*dw(x)) + [W1^T (s*(b_dw - mu_t) + beta) + b1]
    """
    k = w_dw.shape[0]
    c = w_dw.shape[-1]
    s = gamma[None, :] * jax.lax.rsqrt(var + eps)  # (B, C)
    mu_t = mean + b_dw[None, :]
    # W1s[b, c, r] = W1[c, r] * s[b, c]
    w1s = w1[None] * s[:, :, None]  # (B, C, R)
    # wbig[b, kz*k+ky, r, kx*C+c] = w_dw[kz,ky,kx,c] * w1s[b, c, r]
    parts = []
    for kx in range(k):
        parts.append(jnp.einsum("zyc,bcr->bzyrc", w_dw[:, :, kx], w1s))
    wbig = jnp.concatenate(parts, axis=-1)  # (B, k, k, R, k*C)
    b_eff = (
        jnp.einsum("bc,cr->br", s * (b_dw[None] - mu_t) + beta[None], w1)
        + b1[None]
    )  # (B, R)
    bsz = wbig.shape[0]
    r = w1.shape[1]
    return wbig.reshape(bsz, k * k, r, k * c), b_eff


def fused_mednext_block(
    x: jax.Array,  # (B, Z, Y, C, X)
    w_dw: jax.Array,  # (k,k,k,C)
    b_dw: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w1: jax.Array,  # (C, R)
    b1: jax.Array,
    w2: jax.Array,  # (R, Cout)
    b2: jax.Array,
    eps: float = 1e-6,
    k: int = 3,
):
    """Full fused MedNeXt block in (B, Z, Y, C, X) layout.

    Semantics == x + pw2(gelu(pw1(GN_perchannel(dw(x))))) with SAME zero
    padding, matching ``MedNeXtBlock`` (models/mednext.py:35).
    """
    b, z, y, c, xs = x.shape
    p = k // 2
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
    stats = dw_stats(x_pad, w_dw, k=k)  # (B, 2, C) f32
    n = z * y * xs
    mean = stats[:, 0] / n
    var = jnp.maximum(stats[:, 1] / n - mean * mean, 0.0)
    wbig, b1eff = fold_block_weights(
        w_dw, b_dw, gamma, beta, w1, b1, mean, var, eps
    )
    # per-batch folded weights: vmap the apply over B (weights differ per b)
    def one(xp, wb, be):
        return fused_block_apply(
            xp[None],
            wb.astype(x.dtype),
            be.astype(jnp.float32),
            w2.T.astype(x.dtype),
            b2.astype(jnp.float32),
            k=k,
            out_dtype=x.dtype,
        )[0]

    return jax.vmap(one)(x_pad, wbig, b1eff)


# ---------------------------------------------------------------------------
# pure-XLA reference (for tests): identical math, NDHWC-free formulation
# ---------------------------------------------------------------------------


def reference_block(x, w_dw, b_dw, gamma, beta, w1, b1, w2, b2, eps=1e-6, k=3):
    """x: (B, Z, Y, C, X). Direct (slow) computation for parity tests."""
    xf = x.astype(jnp.float32)
    p = k // 2
    xp = jnp.pad(xf, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
    b, z, y, c, xs = x.shape
    t = jnp.zeros_like(xf)
    for kz in range(k):
        for ky in range(k):
            for kx in range(k):
                sl = xp[:, kz : kz + z, ky : ky + y]
                off = kx - p
                if off > 0:
                    sl = jnp.pad(sl[..., off:], ((0, 0),) * 4 + ((0, off),))
                elif off < 0:
                    sl = jnp.pad(sl[..., :off], ((0, 0),) * 4 + ((-off, 0),))
                t = t + w_dw[kz, ky, kx][None, None, None, :, None] * sl
    t = t + b_dw[None, None, None, :, None]
    mu = t.mean(axis=(1, 2, 4), keepdims=True)
    var = t.var(axis=(1, 2, 4), keepdims=True)
    tn = (t - mu) * jax.lax.rsqrt(var + eps)
    tn = tn * gamma[None, None, None, :, None] + beta[None, None, None, :, None]
    h = jnp.einsum("bzycx,cr->bzyrx", tn, w1) + b1[None, None, None, :, None]
    h = jax.nn.gelu(h, approximate=True)
    o = jnp.einsum("bzyrx,rc->bzycx", h, w2) + b2[None, None, None, :, None]
    return (xf + o).astype(x.dtype)
