"""Shared Flax building blocks for 3-D segmentation models.

Layout: all models run **NDHWC** (batch, z, y, x, channel) — the layout XLA
tiles best onto the TPU MXU for convolutions. Compute dtype is configurable
(bfloat16 by default); params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_act(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "leaky_relu": lambda x: nn.leaky_relu(x, 0.01),
        "elu": nn.elu,
        "gelu": nn.gelu,
        "prelu": lambda x: nn.leaky_relu(x, 0.25),  # fixed-slope PReLU approx
        "silu": nn.silu,
        "tanh": jnp.tanh,
        "none": lambda x: x,
    }[name.lower()]


class Norm(nn.Module):
    """Norm dispatcher: group | instance | batch(->group) | layer | none.

    InstanceNorm == GroupNorm with one group per channel; BatchNorm is mapped
    to GroupNorm to stay stateless under jit/pjit (no running stats to
    synchronize across the mesh).
    """

    kind: str = "group"
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kind = self.kind.lower()
        if kind in ("none", ""):
            return x
        if kind in ("instance",):
            return nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        if kind in ("layer",):
            return nn.LayerNorm(dtype=self.dtype)(x)
        groups = min(self.groups, x.shape[-1])
        while x.shape[-1] % groups != 0:
            groups -= 1
        return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)


class ConvNormAct(nn.Module):
    features: int
    kernel: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    norm: str = "group"
    act: str = "relu"
    dtype: Dtype = jnp.bfloat16
    groups: int = 8
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            strides=tuple(self.strides),
            padding="SAME",
            dtype=self.dtype,
            feature_group_count=self.feature_group_count,
        )(x)
        x = Norm(self.norm, self.groups, dtype=self.dtype)(x)
        return get_act(self.act)(x)


class ResBlock(nn.Module):
    """Two conv-norm-act layers with additive skip (pre-activation style)."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    norm: str = "group"
    act: str = "relu"
    dtype: Dtype = jnp.bfloat16
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        skip = x
        if skip.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype)(skip)
        y = ConvNormAct(
            self.features, self.kernel, norm=self.norm, act=self.act,
            dtype=self.dtype, groups=self.groups,
        )(x)
        y = nn.Conv(self.features, tuple(self.kernel), padding="SAME", dtype=self.dtype)(y)
        y = Norm(self.norm, self.groups, dtype=self.dtype)(y)
        return get_act(self.act)(y + skip)


def downsample(x, factors: Sequence[int]):
    """Max-pool downsample by per-axis integer factors."""
    window = (1,) + tuple(factors) + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, window, "VALID"
    ).astype(x.dtype)


def upsample_nearest(x, factors: Sequence[int]):
    for axis, f in zip((1, 2, 3), factors):
        if f > 1:
            x = jnp.repeat(x, f, axis=axis)
    return x


def upsample_trilinear(x, factors: Sequence[int]):
    """Trilinear upsample via jax.image.resize (XLA lowers to gathers; used by
    RSUNet 'bilinear 3D' mode, reference rsunet.py:33)."""
    n, z, y, xx, c = x.shape
    new = (n, z * factors[0], y * factors[1], xx * factors[2], c)
    return jax.image.resize(x, new, method="linear").astype(x.dtype)


class UpConv(nn.Module):
    """Transposed-conv upsampling by per-axis factors. ``kernel`` widens the
    transposed-conv taps beyond the stride (MONAI ``up_kernel_size``);
    default = stride (non-overlapping)."""

    features: int
    factors: Sequence[int] = (2, 2, 2)
    dtype: Dtype = jnp.bfloat16
    kernel: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x):
        f = tuple(self.factors)
        k = tuple(self.kernel) if self.kernel is not None else f
        k = tuple(max(ki, fi) for ki, fi in zip(k, f))
        return nn.ConvTranspose(
            self.features, kernel_size=k, strides=f, padding="SAME", dtype=self.dtype
        )(x)


def center_crop_to(x, target_spatial: Tuple[int, int, int]):
    """Crop NDHWC tensor spatially to target (for skip connections)."""
    starts = [(x.shape[i + 1] - target_spatial[i]) // 2 for i in range(3)]
    return x[
        :,
        starts[0] : starts[0] + target_spatial[0],
        starts[1] : starts[1] + target_spatial[1],
        starts[2] : starts[2] + target_spatial[2],
        :,
    ]
