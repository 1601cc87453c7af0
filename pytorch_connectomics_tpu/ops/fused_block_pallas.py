"""Fused MedNeXt block for TPU: dw-conv + per-channel GroupNorm + pointwise
expand + GELU + pointwise compress + residual, as two Pallas kernels.

Why: XLA's depthwise-3^3 lowering runs at ~0.7 TFLOPS / 50 GB/s at EM stage-0
shapes and the VPU only sustains ~0.5 T-FMA/s (measured, scripts/
tpu_microbench.py), so neither a conv nor a 27-tap VPU stencil can be fast.
The fix is algebraic: GroupNorm's normalization and affine are LINEAR in the
dw output, so

    pw1(GN(dw(x))) = sum_{kz,ky} Wbig[(kz,ky)] @ xcat[(kz,ky)] + b'

where ``Wbig[r, kx*C+c] = w_dw[kz,ky,kx,c] * s_c * W1[c,r]`` and
``s_c = gamma_c * rsqrt(var_c + eps)`` — the entire dw conv + GN ride the
MXU inside the expand matmul. Only per-(b,c) stats need a separate (cheap)
pass.

Layout — "CF": activations live as ``(B, Zp, C, F)`` with
``F = Yp * 128``: each y-row's X extent is zero-padded to one full 128-lane
tile and rows are flattened onto the lane axis. Then

  - a kx (x-direction) tap shift is a whole-plane lane roll whose
    cross-row wraps land on stored zeros (pad lanes / halo rows), giving
    exact SAME-conv zero boundaries for free;
  - a ky shift is a lane slice at offset ky*128 — tile-aligned, free;
  - a kz shift selects a neighboring z-plane (grid-supplied);
  - each tap contributes ONE matmul (R, kC) @ (kC, Y*128) — huge N keeps
    the MXU streaming (the earlier per-y-row loop was overhead-bound).

Invariant: every CF tensor has zeros in its pad lanes (x >= X) and halo
rows (y outside [p, Y+p), z outside [p, Z+p)); kernels re-establish it on
their outputs so blocks chain with no re-padding.

Reference semantics: ``MedNeXtBlock`` (models/mednext.py; reference
``mednext_models.py:304``) with norm = per-channel GroupNorm.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


# ---------------------------------------------------------------------------
# CF layout conversion (XLA glue)
# ---------------------------------------------------------------------------


def to_cf(x: jax.Array, k: int = 3) -> jax.Array:
    """(B, Z, Y, C, X) -> (B, Z+2p, C, (Y+2p)*LANE) zero-padded CF tensor."""
    b, z, y, c, xs = x.shape
    p = k // 2
    x = jnp.transpose(x, (0, 1, 3, 2, 4))  # (B, Z, C, Y, X)
    x = jnp.pad(x, ((0, 0), (p, p), (0, 0), (p, p), (0, LANE - xs)))
    return x.reshape(b, z + 2 * p, c, (y + 2 * p) * LANE)


def from_cf(x_cf: jax.Array, y: int, xs: int, k: int = 3) -> jax.Array:
    """(B, Zp, C, Yp*LANE) -> (B, Z, Y, C, X) interior."""
    b, zp, c, f = x_cf.shape
    p = k // 2
    x = x_cf.reshape(b, zp, c, f // LANE, LANE)
    x = x[:, p : zp - p, :, p : p + y, :xs]
    return jnp.transpose(x, (0, 1, 3, 2, 4))


def ndhwc_to_cf(x: jax.Array, k: int = 3) -> jax.Array:
    """(B, Z, Y, X, C) -> CF."""
    return to_cf(jnp.transpose(x, (0, 1, 2, 4, 3)), k)


def cf_to_ndhwc(x_cf: jax.Array, y: int, xs: int, k: int = 3) -> jax.Array:
    out = from_cf(x_cf, y, xs, k)  # (B, Z, Y, C, X)
    return jnp.transpose(out, (0, 1, 2, 4, 3))


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _fill_xcat(in_refs, xcat_s, k: int, f: int):
    """Stage kx lane-rolled copies on the sublane (channel) axis:
    scratch (k, k*C, F). Wrapped lanes land on stored zeros (see module
    docstring), so boundaries are exact."""
    c = in_refs[0].shape[-2]
    for kz in range(k):
        plane = in_refs[kz][0, 0]  # (C, F)
        for kx in range(k):
            off = kx - k // 2  # tap reads x + off
            rolled = plane if off == 0 else pltpu.roll(plane, (-off) % f, axis=1)
            xcat_s[kz, kx * c : (kx + 1) * c, :] = rolled


def _tap_matmuls(xcat_s, w_ref, k: int, y_size: int, out_rows: int):
    """sum over (kz, ky) of W[(kz,ky)] @ xcat[kz][:, ky*LANE:...] in f32."""
    n = y_size * LANE
    acc = jnp.zeros((out_rows, n), jnp.float32)
    for kz in range(k):
        for ky in range(k):
            tap = xcat_s[kz, :, ky * LANE : ky * LANE + n]  # (kC, Y*LANE)
            acc = acc + jax.lax.dot_general(
                w_ref[kz * k + ky], tap,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _pad_lane_mask(shape, xs: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) % LANE
    return lane < xs


# ---------------------------------------------------------------------------
# stats kernel: per-(b, c) [sum, sumsq] of dw(x) over real voxels
# ---------------------------------------------------------------------------


def _stats_kernel(*refs, k: int, y_size: int, z_size: int, x_size: int):
    in_refs = refs[:k]
    wdw_ref, out_ref, xcat_s = refs[k], refs[k + 1], refs[k + 2]
    z = pl.program_id(1)
    p = k // 2

    @pl.when(z == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_and(z >= p, z < p + z_size))
    def _():
        c = out_ref.shape[-1]
        _fill_xcat(in_refs, xcat_s, k, in_refs[0].shape[-1])
        t = _tap_matmuls(xcat_s, wdw_ref, k, y_size, c)  # (C, Y*LANE)
        # shifted xcat bands wrap real values into pad lanes (x >= X), so t's
        # pad columns are garbage — mask before reducing
        t = jnp.where(_pad_lane_mask(t.shape, x_size), t, 0.0)
        out_ref[0, 0, :] += jnp.sum(t, axis=1)
        out_ref[0, 1, :] += jnp.sum(t * t, axis=1)


def dw_stats(x_cf: jax.Array, w_dw: jax.Array, y_size: int, x_size: int, k: int = 3):
    """x_cf: (B, Zp, C, F) CF tensor. w_dw: (k, k, k, C) depthwise taps.
    Returns (B, 2, C) float32 [sum, sumsq] of dw(x) over real voxels."""
    b, zp, c, f = x_cf.shape
    p = k // 2
    z_size = zp - 2 * p
    # diagonal-expanded taps (k*k, C, k*C), trace-safe
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
        functools.partial(
            _stats_kernel, k=k, y_size=y_size, z_size=z_size, x_size=x_size
        ),
        grid=(b, zp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 2, c), lambda bi, zi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k * c, f), x_cf.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*([x_cf] * k), w)


# ---------------------------------------------------------------------------
# apply kernel: out = x + pw2(gelu(sum_taps Wbig @ xcat + b1'))
# ---------------------------------------------------------------------------


def _apply_kernel(*refs, k: int, y_size: int, z_size: int, x_size: int):
    in_refs = refs[:k]
    wbig_ref, b1_ref, w2_ref, b2_ref, out_ref, xcat_s = refs[k : k + 6]
    r = wbig_ref.shape[1]
    c = in_refs[0].shape[-2]
    p = k // 2
    z = pl.program_id(1)
    interior = jnp.logical_and(z >= p, z < p + z_size)

    @pl.when(jnp.logical_not(interior))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(interior)
    def _():
        f = in_refs[0].shape[-1]
        n = y_size * LANE
        _fill_xcat(in_refs, xcat_s, k, f)
        acc = _tap_matmuls(xcat_s, wbig_ref, k, y_size, r)  # (R, Y*LANE)
        h = jax.nn.gelu(acc + b1_ref[0][:, None], approximate=True)
        o = jax.lax.dot_general(
            w2_ref[...].astype(jnp.float32), h,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0][:, None]  # (Cout, Y*LANE)
        if w2_ref.shape[0] == c:  # residual (stride-1 same-channel block)
            o = o + xcat_s[p, p * c : (p + 1) * c, p * LANE : p * LANE + n].astype(
                jnp.float32
            )
        # re-establish the CF invariant: zero pad lanes and y-halo rows
        o = jnp.where(_pad_lane_mask(o.shape, x_size), o, 0.0)
        out_ref[0, 0, :, 0 : p * LANE] = jnp.zeros(
            (out_ref.shape[2], p * LANE), out_ref.dtype
        )
        out_ref[0, 0, :, p * LANE : p * LANE + n] = o.astype(out_ref.dtype)
        out_ref[0, 0, :, p * LANE + n :] = jnp.zeros(
            (out_ref.shape[2], f - p * LANE - n), out_ref.dtype
        )


def fused_block_apply_cf(
    x_cf: jax.Array,
    wbig: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    y_size: int,
    x_size: int,
    k: int = 3,
):
    """x_cf: (B, Zp, C, F) CF tensor; wbig: (k*k, R, k*C) folded weights;
    w2: (Cout, R). Returns a CF tensor (B, Zp, Cout, F) with the same
    zero-halo invariant, so blocks chain without re-padding."""
    b, zp, c, f = x_cf.shape
    p = k // 2
    z_size = zp - 2 * p
    cout = w2.shape[0]
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
    for _ in range(4):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(
            _apply_kernel, k=k, y_size=y_size, z_size=z_size, x_size=x_size
        ),
        grid=(b, zp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, cout, f), lambda bi, zi: (bi, zi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, zp, cout, f), x_cf.dtype),
        scratch_shapes=[pltpu.VMEM((k, k * c, f), x_cf.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        *([x_cf] * k),
        wbig,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
    )


# ---------------------------------------------------------------------------
# GN folding + full block
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
    w1s = w1[None] * s[:, :, None]  # (B, C, R)
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


def fused_block_cf(
    x_cf: jax.Array,  # (B, Zp, C, F) CF tensor
    w_dw: jax.Array,  # (k,k,k,C)
    b_dw: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w1: jax.Array,  # (C, R)
    b1: jax.Array,
    w2: jax.Array,  # (R, Cout)
    b2: jax.Array,
    z_size: int,
    y_size: int,
    x_size: int,
    eps: float = 1e-6,
    k: int = 3,
):
    """One fused block CF -> CF (chainable)."""
    stats = dw_stats(x_cf, w_dw, y_size, x_size, k=k)  # (B, 2, C) f32
    n = z_size * y_size * x_size
    mean = stats[:, 0] / n
    var = jnp.maximum(stats[:, 1] / n - mean * mean, 0.0)
    wbig, b1eff = fold_block_weights(
        w_dw, b_dw, gamma, beta, w1, b1, mean, var, eps
    )

    def one(xp, wb, be):
        return fused_block_apply_cf(
            xp[None],
            wb.astype(x_cf.dtype),
            be.astype(jnp.float32),
            w2.T.astype(x_cf.dtype),
            b2.astype(jnp.float32),
            y_size,
            x_size,
            k=k,
        )[0]

    return jax.vmap(one)(x_cf, wbig, b1eff)


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
    """Full fused MedNeXt block on (B, Z, Y, C, X) data (converts to the CF
    layout and back; chained use should stay in CF via fused_block_cf).

    Semantics == x + pw2(gelu(pw1(GN_perchannel(dw(x))))) with SAME zero
    padding, matching ``MedNeXtBlock`` (models/mednext.py:35).
    """
    b, z, y, c, xs = x.shape
    x_cf = to_cf(x, k)
    out_cf = fused_block_cf(
        x_cf, w_dw, b_dw, gamma, beta, w1, b1, w2, b2, z, y, xs, eps=eps, k=k
    )
    return from_cf(out_cf, y, xs, k)


# ---------------------------------------------------------------------------
# pure-XLA reference (for tests): identical math
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
