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


def _fill_xcat_scratch(in_refs, xcat_s, k: int, x_size: int, chunk: int = 8):
    """Stage the kx lane-shifted copies into scratch: (k, Yp, k*C, X).

    Row-chunked so live vector temporaries stay small (a whole (Yp, C, X)
    value on the register stack OOMs VMEM at stage-0 shapes)."""
    c = in_refs[0].shape[-2]
    yp = in_refs[0].shape[2]
    chunk = min(chunk, yp)
    n_chunks = -(-yp // chunk)
    for kz in range(k):

        def fill_body(i, _, kz=kz):
            lo = jnp.minimum(i * chunk, yp - chunk)  # last chunk overlaps
            rows = in_refs[kz][0, 0, pl.ds(lo, chunk)]  # (chunk, C, X)
            for kx in range(k):
                xcat_s[kz, pl.ds(lo, chunk), kx * c : (kx + 1) * c, :] = _lane_shift(
                    rows, kx, k, x_size
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, fill_body, 0)


def _stats_kernel(*refs, k: int, x_size: int, y_size: int, z_size: int):
    # refs: k input row-specs, wdw_ref, out_ref, xcat scratch
    in_refs = refs[:k]
    wdw_ref, out_ref, xcat_s = refs[k], refs[k + 1], refs[k + 2]
    z = pl.program_id(1)

    @pl.when(z == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_and(z >= 1, z <= z_size))
    def _():
        c = out_ref.shape[-1]
        _fill_xcat_scratch(in_refs, xcat_s, k, x_size)
        wdw = wdw_ref[...]  # (k*k, C, kC)

        def body(y, carry):
            acc_s, acc_s2 = carry
            t = jnp.zeros((c, x_size), jnp.float32)
            for kz in range(k):
                for ky in range(k):
                    tap = xcat_s[kz, pl.ds(y + ky, 1)][0]  # (kC, X)
                    t = t + jax.lax.dot_general(
                        wdw[kz * k + ky], tap,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            return acc_s + t, acc_s2 + t * t

        zero = jnp.zeros((c, x_size), jnp.float32)
        acc_s, acc_s2 = jax.lax.fori_loop(0, y_size, body, (zero, zero))
        out_ref[0, 0, :] += jnp.sum(acc_s, axis=1)
        out_ref[0, 1, :] += jnp.sum(acc_s2, axis=1)


def dw_stats(x_pad: jax.Array, w_dw: jax.Array, k: int = 3):
    """Per-(b, c) [sum, sumsq] of the depthwise conv output.

    x_pad: (B, Z+2p, Y+2p, C, X) zero-padded in Z and Y by p = k//2.
    w_dw: (k, k, k, C) depthwise taps. Returns (B, 2, C) float32.
    """
    b, zp, yp, c, x = x_pad.shape
    p = k // 2
    z_size, y_size = zp - 2 * p, yp - 2 * p
    # diagonal-expanded taps: (k*k, C, k*C); [t, c', kx*C+c] = delta * w
    # (trace-safe: built from eye() products so it jits)
    eye = jnp.eye(c, dtype=jnp.float32)
    w = jnp.stack(
        [
            jnp.concatenate(
                [eye * w_dw[kz, ky, kx][None, :].astype(jnp.float32) for kx in range(k)],
                axis=1,
            )
            for kz in range(k)
            for ky in range(k)
        ]
    )

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
        scratch_shapes=[pltpu.VMEM((k, yp, k * c, x), x_pad.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*([x_pad] * k), w)


# ---------------------------------------------------------------------------
# apply kernel: out = x + pw2(gelu(Wbig9 (x) xcat + b1')) + b2-fold
# ---------------------------------------------------------------------------


def _apply_kernel(*refs, k: int, x_size: int, y_size: int, z_size: int):
    # refs: k input row-specs, wbig_ref (k*k, R, kC), b1_ref (1, R),
    #       w2_ref (Cout, R), b2_ref (1, Cout), out_ref (1, 1, Y, C, X),
    #       xcat scratch (k, Yp, kC, X)
    in_refs = refs[:k]
    wbig_ref, b1_ref, w2_ref, b2_ref, out_ref, xcat_s = refs[k : k + 6]
    r = wbig_ref.shape[1]
    cout = w2_ref.shape[0]
    c = in_refs[0].shape[-2]
    p = k // 2

    _fill_xcat_scratch(in_refs, xcat_s, k, x_size)
    wbig = wbig_ref[...]
    w2 = w2_ref[...].astype(jnp.float32)
    b1 = b1_ref[0]
    b2 = b2_ref[0]
    add_residual = cout == c

    def body(y, _):
        acc = jnp.zeros((r, x_size), jnp.float32)
        for kz in range(k):
            for ky in range(k):
                tap = xcat_s[kz, pl.ds(y + ky, 1)][0]  # (kC, X)
                acc = acc + jax.lax.dot_general(
                    wbig[kz * k + ky], tap,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (R, X)
        h = jax.nn.gelu(acc + b1[:, None], approximate=True)
        o = jax.lax.dot_general(
            w2, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2[:, None]  # (Cout, X)
        if add_residual:
            o = o + in_refs[p][0, 0, pl.ds(y + p, 1)][0].astype(jnp.float32)
        out_ref[0, 0, pl.ds(y, 1)] = o[None].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, y_size, body, 0)


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
        scratch_shapes=[pltpu.VMEM((k, yp, k * c, x), x_pad.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
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
