"""MONAI-style U-Nets reimplemented in Flax: BasicUNet, UNet (res units),
UNETR (ViT encoder + conv decoder).

Reference wrappers: ``connectomics/models/architectures/monai_models.py``
(BasicUNet :143, UNet :198, UNETR :254, SwinUNETR :298).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, ResBlock, UpConv, downsample, get_act
from .registry import register_architecture


class BasicUNet3D(nn.Module):
    """MONAI BasicUNet topology: two-conv blocks, maxpool downs, upcat decoder.

    ``features`` follows MONAI's 6-entry convention: 4 encoder levels,
    bottleneck, final decoder width."""

    in_channels: int = 1
    out_channels: int = 1
    features: Sequence[int] = (32, 32, 64, 128, 256, 32)
    norm: str = "instance"
    act: str = "leaky_relu"
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.features)

        def block(x, w):
            x = ConvNormAct(w, norm=self.norm, act=self.act, dtype=self.dtype)(x)
            x = ConvNormAct(w, norm=self.norm, act=self.act, dtype=self.dtype)(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return x

        x0 = block(x, f[0])
        x1 = block(downsample(x0, (2, 2, 2)), f[1])
        x2 = block(downsample(x1, (2, 2, 2)), f[2])
        x3 = block(downsample(x2, (2, 2, 2)), f[3])
        x4 = block(downsample(x3, (2, 2, 2)), f[4])

        def up(x, skip, w):
            x = UpConv(w, (2, 2, 2), dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            return block(x, w)

        y = up(x4, x3, f[3])
        y = up(y, x2, f[2])
        y = up(y, x1, f[1])
        y = up(y, x0, f[5])
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(y)


class UNet3D(nn.Module):
    """MONAI UNet topology: per-level strided conv encoder with residual
    units, transposed-conv decoder."""

    in_channels: int = 1
    out_channels: int = 1
    channels: Sequence[int] = (16, 32, 64)
    strides: Optional[Sequence[Sequence[int]]] = None
    num_res_units: int = 1
    kernel_size: int = 3
    up_kernel_size: int = 3
    norm: str = "instance"
    act: str = "prelu"
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = list(self.channels)
        n_down = len(ch) - 1
        strides = [tuple(s) for s in (self.strides or [(2, 2, 2)] * n_down)]
        k = (self.kernel_size,) * 3

        def res_units(x, w):
            for _ in range(max(1, self.num_res_units)):
                x = ResBlock(w, k, norm=self.norm, act=self.act, dtype=self.dtype)(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return x

        skips = []
        x = res_units(ConvNormAct(ch[0], k, norm=self.norm, act=self.act, dtype=self.dtype)(x), ch[0])
        for i in range(n_down):
            skips.append(x)
            x = ConvNormAct(ch[i + 1], k, strides=strides[i], norm=self.norm, act=self.act, dtype=self.dtype)(x)
            x = res_units(x, ch[i + 1])
        for i in reversed(range(n_down)):
            x = UpConv(
                ch[i], strides[i], dtype=self.dtype,
                kernel=(self.up_kernel_size,) * 3,
            )(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = res_units(x, ch[i])
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(x)


class UNETR(nn.Module):
    """UNETR: ViT encoder over 3-D patches + conv decoder with skip
    projections from intermediate transformer layers."""

    in_channels: int = 1
    out_channels: int = 1
    img_size: Sequence[int] = (96, 96, 96)
    patch_size: Sequence[int] = (16, 16, 16)
    hidden_size: int = 384
    mlp_dim: int = 1536
    num_heads: int = 6
    num_layers: int = 8
    feature_size: int = 16
    norm: str = "instance"
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        ps = tuple(self.patch_size)
        gz, gy, gx = [s // p for s, p in zip(x.shape[1:4], ps)]
        n_tokens = gz * gy * gx
        # patch embed: conv with stride=patch
        t = nn.Conv(self.hidden_size, ps, strides=ps, dtype=self.dtype, name="patch_embed")(x)
        t = t.reshape(t.shape[0], n_tokens, self.hidden_size)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n_tokens, self.hidden_size))
        t = t + pos.astype(t.dtype)
        if self.dropout:
            t = nn.Dropout(self.dropout, deterministic=not train)(t)
        taps = []
        tap_every = max(1, self.num_layers // 4)
        for li in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype)(t)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, qkv_features=self.hidden_size
            )(h, h)
            t = t + h
            h = nn.LayerNorm(dtype=self.dtype)(t)
            h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(self.hidden_size, dtype=self.dtype)(h)
            if self.dropout:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            t = t + h
            if (li + 1) % tap_every == 0:
                taps.append(t)
        taps = taps[-4:]

        def to_vol(tok):
            return tok.reshape(tok.shape[0], gz, gy, gx, self.hidden_size)

        fs = self.feature_size
        # decoder: progressively upsample transformer taps
        d4 = ConvNormAct(fs * 8, norm=self.norm, dtype=self.dtype)(to_vol(taps[3]))
        d3 = ConvNormAct(fs * 4, norm=self.norm, dtype=self.dtype)(to_vol(taps[2]))
        d2 = ConvNormAct(fs * 2, norm=self.norm, dtype=self.dtype)(to_vol(taps[1]))
        d1 = ConvNormAct(fs, norm=self.norm, dtype=self.dtype)(to_vol(taps[0]))
        y = UpConv(fs * 4, (2, 2, 2), dtype=self.dtype)(d4)
        y = jnp.concatenate([y, UpConv(fs * 4, (2, 2, 2), dtype=self.dtype)(d3)], axis=-1)
        y = ConvNormAct(fs * 4, norm=self.norm, dtype=self.dtype)(y)
        y = UpConv(fs * 2, (2, 2, 2), dtype=self.dtype)(y)
        y = jnp.concatenate([y, UpConv(fs * 2, (4, 4, 4), dtype=self.dtype)(d2)], axis=-1)
        y = ConvNormAct(fs * 2, norm=self.norm, dtype=self.dtype)(y)
        y = UpConv(fs, (2, 2, 2), dtype=self.dtype)(y)
        y = jnp.concatenate([y, UpConv(fs, (8, 8, 8), dtype=self.dtype)(d1)], axis=-1)
        y = ConvNormAct(fs, norm=self.norm, dtype=self.dtype)(y)
        y = UpConv(fs, (2, 2, 2), dtype=self.dtype)(y)
        # final skip from raw input scale
        inp = ConvNormAct(fs, norm=self.norm, dtype=self.dtype)(x)
        y = jnp.concatenate([y, inp], axis=-1)
        y = ConvNormAct(fs, norm=self.norm, dtype=self.dtype)(y)
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(y)


@register_architecture("monai_basic_unet", "BasicUNet 3D (two-conv blocks)")
def build_basic_unet(model_cfg):
    m = model_cfg.monai
    feats = m.features or [32, 32, 64, 128, 256, 32]
    return BasicUNet3D(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        features=tuple(feats),
        norm=m.norm,
        dropout=m.dropout,
        dtype=jnp.dtype(model_cfg.compute_dtype),
    )


@register_architecture("monai_unet", "UNet 3D with residual units")
def build_unet(model_cfg):
    m = model_cfg.monai
    return UNet3D(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        channels=tuple(m.filters),
        strides=m.strides,
        num_res_units=m.num_res_units,
        kernel_size=m.kernel_size,
        up_kernel_size=m.up_kernel_size,
        norm=m.norm,
        act=m.act,
        dropout=m.dropout,
        dtype=jnp.dtype(model_cfg.compute_dtype),
    )


@register_architecture("monai_unetr", "UNETR: ViT encoder + conv decoder")
def build_unetr(model_cfg):
    m = model_cfg.monai
    return UNETR(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        img_size=tuple(model_cfg.input_size),
        patch_size=tuple(m.patch_size),
        hidden_size=m.hidden_size,
        mlp_dim=m.mlp_dim,
        num_heads=m.num_heads,
        num_layers=m.num_layers,
        feature_size=m.feature_size,
        dropout=m.dropout,
        dtype=jnp.dtype(model_cfg.compute_dtype),
    )
