"""Pallas TPU kernel: depthwise 3x3x3 conv (NDHWC, SAME, stride 1).

XLA's depthwise-conv lowering reaches ~96 GB/s of the v5e's 819 GB/s HBM at
MedNeXt shapes (15 ms for C=32 @ 8x112^3). This kernel reads each spatial
block (+1-voxel halo) once into VMEM, accumulates the 27 shifted
tap-products on the VPU in f32, and writes the block once — memory-bound at
full bandwidth in the ideal case.

DMA alignment rules (learned the hard way, see CLAUDE.md): channels padded
to 128 lanes; the x (sublane) DMA extent padded to 16 so both f32 and bf16
tilings are legal; shifted slicing happens on the f32-cast VMEM copy.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _dw_kernel(x_hbm, w_ref, b_ref, out_ref, scratch, sem, *, block, cin):
    bz, by, bx = block
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    ix = pl.program_id(3)
    copy = pltpu.make_async_copy(
        x_hbm.at[
            b,
            pl.ds(iz * bz, bz + 2),
            pl.ds(iy * by, by + 2),
            pl.ds(ix * bx, bx + 16),
            :,
        ],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()
    base = scratch[:].astype(jnp.float32)
    acc = jnp.zeros((bz, by, bx, cin), jnp.float32)
    t = 0
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = base[dz : dz + bz, dy : dy + by, 7 + dx : 7 + dx + bx, :cin]
                acc = acc + tap * w_ref[t, :cin].astype(jnp.float32)
                t += 1
    acc = acc + b_ref[0, :cin].astype(jnp.float32)
    out_ref[:] = acc[None].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def depthwise3x3_pallas(
    x: jax.Array,  # (B, Z, Y, X, C)
    w: jax.Array,  # (3, 3, 3, 1, C) flax depthwise kernel layout
    bias: Optional[jax.Array] = None,  # (C,)
    block: Tuple[int, int, int] = (8, 8, 64),
) -> jax.Array:
    B, Z, Y, X, C = x.shape
    bz, by, bx = block
    Zp, Yp, Xp = _cdiv(Z, bz) * bz, _cdiv(Y, by) * by, _cdiv(X, bx) * bx
    Cp = _cdiv(C, 128) * 128
    xp = jnp.pad(
        x,
        ((0, 0), (1, 1 + Zp - Z), (1, 1 + Yp - Y), (8, 8 + Xp - X), (0, Cp - C)),
    )
    wm = jnp.pad(w.reshape(27, C), ((0, 0), (0, Cp - C)))
    bm = jnp.zeros((1, Cp), w.dtype) if bias is None else jnp.pad(
        bias.reshape(1, C), ((0, 0), (0, Cp - C))
    )
    grid = (B, Zp // bz, Yp // by, Xp // bx)
    out = pl.pallas_call(
        functools.partial(_dw_kernel, block=block, cin=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, Cp), lambda b, z, y, x: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, z, y, x: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bz, by, bx, C),
            lambda b, z, y, x: (b, z, y, x, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Zp, Yp, Xp, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bz + 2, by + 2, bx + 16, Cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wm, bm)
    return out[:, :Z, :Y, :X, :]


def depthwise3x3(x, w, bias=None, force_pallas: Optional[bool] = None):
    """Depthwise 3^3 stride-1 SAME conv; pallas on TPU, XLA elsewhere.

    ``w``: flax layout (3,3,3,1,C) (feature_group_count=C convolution)."""
    # Status: bit-exact (matches HIGHEST-precision XLA conv) but currently
    # ~8x SLOWER than XLA's depthwise lowering: with C=32 the 128-lane
    # channel pad wastes 4x DMA and the sublane-shifted taps force VPU
    # relayouts. The fix is an (B,Z,Y,C,X) layout with X on lanes (x-shifts
    # become cheap lane rolls) — round-2 work. Opt-in only.
    use_pallas = force_pallas
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        return depthwise3x3_pallas(x, w, bias)
    out = jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 3, 1, x.shape[-1]), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
