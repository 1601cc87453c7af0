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
import numpy as np
from flax import linen as nn

from .layers import ConvNormAct, UpConv
from .registry import register_architecture


def relative_position_index(ws: Tuple[int, int, int]) -> np.ndarray:
    """(T, T) int index into the (2wz-1)(2wy-1)(2wx-1) bias table for each
    ordered token pair in a window (Swin-T 3-D; ref MONAI SwinUNETR,
    ``monai_models.py:298``). Static — computed with numpy at trace time."""
    coords = np.stack(
        np.meshgrid(*(np.arange(w) for w in ws), indexing="ij")
    ).reshape(3, -1)  # (3, T)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, T, T)
    idx = np.zeros(rel.shape[1:], np.int64)
    stride = 1
    for d in reversed(range(3)):
        idx += (rel[d] + ws[d] - 1) * stride
        stride *= 2 * ws[d] - 1
    return idx


def shift_attention_mask(
    spatial: Tuple[int, int, int],
    ws: Tuple[int, int, int],
    shift: Tuple[int, int, int],
) -> np.ndarray:
    """(nW, T, T) additive mask (0 / -1e9) forbidding attention between
    tokens that were not spatially adjacent before the cyclic roll (the
    standard Swin shifted-window mask). Static numpy — shapes are trace-time
    Python ints."""
    z, y, x = spatial
    img = np.zeros((1, z, y, x, 1), np.int32)
    cnt = 0
    slices = []
    for s, w, sh in zip(spatial, ws, shift):
        if sh == 0:
            slices.append([slice(0, s)])
        else:
            slices.append([slice(0, s - w), slice(s - w, s - sh), slice(s - sh, s)])
    for sz in slices[0]:
        for sy in slices[1]:
            for sx in slices[2]:
                img[:, sz, sy, sx, :] = cnt
                cnt += 1
    wz, wy, wx = ws
    win = img.reshape(1, z // wz, wz, y // wy, wy, x // wx, wx, 1)
    win = win.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wz * wy * wx)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -1e9, 0.0).astype(np.float32)


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


class WindowAttention(nn.Module):
    """Window MHSA with learned relative position bias and an optional
    shifted-window mask (ref MONAI SwinUNETR ``WindowAttention``)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, win, attn_mask: np.ndarray | None = None):
        bn, t, _ = win.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(3 * nh * hd, dtype=self.dtype, name="qkv")(win)
        q, k, v = jnp.split(qkv.reshape(bn, t, 3, nh, hd), 3, axis=2)
        q = jnp.squeeze(q, 2).transpose(0, 2, 1, 3)  # (Bn, H, T, hd)
        k = jnp.squeeze(k, 2).transpose(0, 2, 1, 3)
        v = jnp.squeeze(v, 2).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        table_size = int(np.prod([2 * w - 1 for w in self.window_size]))
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            (table_size, nh),
            jnp.float32,
        )
        idx = relative_position_index(self.window_size)
        logits = logits + table[idx.reshape(-1)].reshape(t, t, nh).transpose(2, 0, 1)
        if attn_mask is not None:
            n_win = attn_mask.shape[0]
            logits = logits.reshape(-1, n_win, nh, t, t)
            logits = logits + jnp.asarray(attn_mask)[None, :, None]
            logits = logits.reshape(bn, nh, t, t)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bn, t, nh * hd)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


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
        # no shift along axes a single window already covers (standard Swin)
        shift = (
            tuple(0 if s <= w else w // 2 for w, s in zip(ws, (z, y, xx)))
            if self.shift
            else (0, 0, 0)
        )
        h = nn.LayerNorm(dtype=self.dtype)(x)
        if any(shift):
            h = jnp.roll(h, tuple(-s for s in shift), axis=(1, 2, 3))
            mask = shift_attention_mask((z, y, xx), ws, shift)
        else:
            mask = None
        win = _window_partition(h, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype)(
            win, mask
        )
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
