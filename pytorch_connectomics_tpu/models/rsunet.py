"""RSUNet — residual symmetric U-Net (SNEMI lineage).

TPU-native reimplementation of the reference architecture
(``connectomics/models/architectures/rsunet.py:262``): anisotropic
down-factors (default ``[1,2,2]`` for the shallow stages), a 2-D stem
(``depth_2d`` stages convolve with ``[1,3,3]`` kernels so the anisotropic
z-axis is untouched), trilinear 3-D upsampling, residual conv blocks.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    ConvNormAct,
    ResBlock,
    downsample,
    upsample_trilinear,
)
from .registry import register_architecture


class RSUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 3
    width: Sequence[int] = (16, 32, 64, 128)
    down_factors: Optional[Sequence[Sequence[int]]] = None
    depth_2d: int = 0
    kernel_2d: Sequence[int] = (1, 3, 3)
    norm: str = "group"
    act: str = "elu"
    groups: int = 8
    iso: bool = False
    dtype: Any = jnp.bfloat16
    deep_supervision: bool = False

    def _factors(self) -> List[Sequence[int]]:
        n = len(self.width) - 1
        if self.down_factors is not None:
            return [tuple(f) for f in self.down_factors]
        if self.iso:
            return [(2, 2, 2)] * n
        # anisotropic default: keep z at the first two levels
        return [(1, 2, 2) if i < 2 else (2, 2, 2) for i in range(n)]

    def _kernel(self, level: int) -> Sequence[int]:
        if level < self.depth_2d:
            return tuple(self.kernel_2d)
        return (3, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        factors = self._factors()
        # stem
        x = ConvNormAct(
            self.width[0], self._kernel(0), norm=self.norm, act=self.act, dtype=self.dtype, groups=self.groups
        )(x)
        skips = []
        for i, w in enumerate(self.width[:-1]):
            x = ResBlock(w, self._kernel(i), norm=self.norm, act=self.act, dtype=self.dtype, groups=self.groups)(x)
            skips.append(x)
            x = downsample(x, factors[i])
        x = ResBlock(
            self.width[-1], (3, 3, 3), norm=self.norm, act=self.act, dtype=self.dtype, groups=self.groups
        )(x)
        ds_outputs = []
        for i in reversed(range(len(self.width) - 1)):
            x = upsample_trilinear(x, factors[i])
            x = nn.Conv(self.width[i], (1, 1, 1), dtype=self.dtype)(x)
            x = x + skips[i]
            x = ResBlock(self.width[i], self._kernel(i), norm=self.norm, act=self.act, dtype=self.dtype, groups=self.groups)(x)
            if self.deep_supervision and i > 0:
                ds_outputs.append(
                    nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name=f"ds_head_{i}")(x)
                )
        out = nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(x)
        if self.deep_supervision:
            res = {"out": out}
            for k, ds in enumerate(reversed(ds_outputs)):
                res[f"ds_{k}"] = ds
            return res
        return out


@register_architecture("rsunet", "Residual symmetric U-Net (anisotropic EM default)")
def build_rsunet(model_cfg):
    r = model_cfg.rsunet
    return RSUNet(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        width=tuple(r.width),
        down_factors=r.down_factors,
        depth_2d=r.depth_2d,
        kernel_2d=tuple(r.kernel_2d),
        norm=r.norm,
        act=r.act,
        groups=r.group_norm_groups,
        iso=r.iso,
        dtype=jnp.dtype(model_cfg.compute_dtype),
        deep_supervision=model_cfg.loss.deep_supervision,
    )


@register_architecture("rsunet_iso", "Isotropic RSUNet variant")
def build_rsunet_iso(model_cfg):
    m = build_rsunet(model_cfg)
    return m.replace(iso=True)
