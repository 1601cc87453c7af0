"""SwinUNETR: hierarchical 3-D shifted-window transformer encoder + conv
decoder (reference wrapper: ``monai_models.py:298``).

TPU notes: window attention reshapes to (num_windows, tokens, C) — a batched
matmul the MXU eats directly; shifted windows are ``jnp.roll`` (cheap layout
ops under XLA). Window size fixed per stage -> fully static shapes.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, UpConv
from .registry import register_architecture


def _window_partition(x, ws: Tuple[int, int, int]):
    """(B, Z, Y, X, C) -> (B*nW, wz*wy*wx, C)."""
    b, z, y, xx, c = x.shape
    wz, wy, wx = ws
    x = x.reshape(b, z // wz, wz, y // wy, wy, xx // wx, wx, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, wz * wy * wx, c)


def _window_unpartition(win, ws, spatial, batch):
    wz, wy, wx = ws
    z, y, xx = spatial
    c = win.shape[-1]
    x = win.reshape(batch, z // wz, y // wy, xx // wx, wz, wy, wx, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(batch, z, y, xx, c)


class WindowAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, z, y, xx, c = x.shape
        ws = tuple(min(w, s) for w, s in zip(self.window_size, (z, y, xx)))
        shift = tuple(w // 2 for w in ws) if self.shift else (0, 0, 0)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        if any(shift):
            h = jnp.roll(h, tuple(-s for s in shift), axis=(1, 2, 3))
        win = _window_partition(h, ws)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype
        )(win, win)
        h = _window_unpartition(attn, ws, (z, y, xx), b)
        if any(shift):
            h = jnp.roll(h, shift, axis=(1, 2, 3))
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class SwinUNETR(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    feature_size: int = 24
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = (4, 4, 4)
    norm: str = "instance"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        fs = self.feature_size
        ws = tuple(self.window_size)
        # stem: stride-2 patch embed
        e0 = ConvNormAct(fs, norm=self.norm, dtype=self.dtype)(x)
        t = nn.Conv(fs, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype, name="patch_embed")(x)
        skips = []
        dims = [fs, fs * 2, fs * 4, fs * 8]
        for stage, (depth, heads, dim) in enumerate(zip(self.depths, self.num_heads, dims)):
            for blk in range(depth):
                t = WindowAttentionBlock(
                    dim, heads, ws, shift=bool(blk % 2), dtype=self.dtype
                )(t)
            skips.append(t)
            if stage < len(self.depths) - 1:
                # patch merging: stride-2 conv downsample, double channels
                t = nn.Conv(dims[min(stage + 1, 3)], (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype)(t)
        # conv decoder with transformer-stage skips
        y = skips[-1]
        for stage in reversed(range(len(self.depths) - 1)):
            y = UpConv(dims[stage], (2, 2, 2), dtype=self.dtype)(y)
            y = jnp.concatenate([y, ConvNormAct(dims[stage], norm=self.norm, dtype=self.dtype)(skips[stage])], axis=-1)
            y = ConvNormAct(dims[stage], norm=self.norm, dtype=self.dtype)(y)
        y = UpConv(fs, (2, 2, 2), dtype=self.dtype)(y)
        y = jnp.concatenate([y, e0], axis=-1)
        y = ConvNormAct(fs, norm=self.norm, dtype=self.dtype)(y)
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(y)


@register_architecture("monai_swin_unetr", "SwinUNETR: shifted-window transformer U-Net")
def build_swin_unetr(model_cfg):
    m = model_cfg.monai
    return SwinUNETR(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        feature_size=m.feature_size,
        depths=tuple(m.depths),
        num_heads=tuple(max(1, m.feature_size * (2**i) // 8) for i in range(len(m.depths))),
        window_size=tuple(m.window_size),
        norm=m.norm,
        dtype=jnp.dtype(model_cfg.compute_dtype),
    )
