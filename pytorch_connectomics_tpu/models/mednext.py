"""MedNeXt — ConvNeXt-style 3-D encoder-decoder (Roy et al., MICCAI 2023).

TPU-native implementation of the architecture the reference wraps from the
external MedNeXt package (``connectomics/models/architectures/mednext_models.py:304``):
depthwise k^3 conv -> GroupNorm -> 1x1 expand (ratio R) -> GELU -> 1x1
compress, residual; stride-2 depthwise down blocks; transposed-conv up
blocks; deep-supervision heads per decoder scale; S/B/M/L presets; optional
multi-head variant (shared backbone + named task heads with per-head
out_channels/num_blocks, ``mednext_models.py:129,197``).

The depthwise + pointwise split is MXU-friendly: the 1x1x1 convs are pure
matmuls over the channel axis and dominate FLOPs; XLA fuses norm/GELU into
them. ``checkpoint_style='outside_block'`` maps to ``nn.remat`` over stages.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import Norm, get_act
from .registry import register_architecture

# size presets: (base_channels, exp_ratios[9], block_counts[9])
_PRESETS: Dict[str, Tuple[int, List[int], List[int]]] = {
    "S": (32, [2] * 9, [2] * 9),
    "B": (32, [2, 3, 4, 4, 4, 4, 4, 3, 2], [2] * 9),
    "M": (32, [2, 3, 4, 4, 4, 4, 4, 3, 2], [3, 4, 4, 4, 4, 4, 4, 4, 3]),
    "L": (32, [3, 4, 8, 8, 8, 8, 8, 4, 3], [3, 4, 8, 8, 8, 8, 8, 4, 3]),
}


class MedNeXtBlock(nn.Module):
    features: int
    exp_ratio: int = 4
    kernel: int = 3
    norm: str = "group"
    dtype: Any = jnp.bfloat16
    out_features: Optional[int] = None
    stride: int = 1
    transpose: bool = False
    # 2-D mode (reference mednext dim='2d'): in-plane kernels/strides only,
    # so z stays untouched on 2-D stacks
    two_d: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.out_features or self.features
        k = (1, self.kernel, self.kernel) if self.two_d else (self.kernel,) * 3
        s = (1, self.stride, self.stride) if self.two_d else (self.stride,) * 3
        if self.transpose:
            y = nn.ConvTranspose(
                cin, kernel_size=k, strides=s, padding="SAME", dtype=self.dtype,
            )(x)
        else:
            y = nn.Conv(
                cin, k, strides=s, padding="SAME",
                feature_group_count=cin, dtype=self.dtype,
            )(x)
        y = Norm(self.norm, groups=cin, dtype=self.dtype)(y)
        y = nn.Conv(cin * self.exp_ratio, (1, 1, 1), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Conv(cout, (1, 1, 1), dtype=self.dtype)(y)
        if self.stride == 1 and cin == cout:
            return x + y
        # strided / channel-changing residual
        if self.transpose:
            res = nn.ConvTranspose(cout, kernel_size=(1, 1, 1), strides=s, dtype=self.dtype)(x)
        else:
            res = nn.Conv(cout, (1, 1, 1), strides=s, dtype=self.dtype)(x)
        return res + y


class _Stage(nn.Module):
    features: int
    num_blocks: int
    exp_ratio: int
    kernel: int
    norm: str
    dtype: Any
    remat: bool = False
    two_d: bool = False

    @nn.compact
    def __call__(self, x):
        block_cls = nn.remat(MedNeXtBlock) if self.remat else MedNeXtBlock
        for _ in range(self.num_blocks):
            x = block_cls(
                self.features, self.exp_ratio, self.kernel, self.norm, self.dtype,
                two_d=self.two_d,
            )(x)
        return x


class MedNeXtTaskHead(nn.Module):
    """Per-task head: N MedNeXt blocks + 1x1 projection
    (reference ``mednext_models.py:129``)."""

    out_channels: int
    num_blocks: int = 1
    exp_ratio: int = 2
    kernel: int = 3
    norm: str = "group"
    dtype: Any = jnp.bfloat16
    two_d: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        for _ in range(self.num_blocks):
            x = MedNeXtBlock(
                c, self.exp_ratio, self.kernel, self.norm, self.dtype,
                two_d=self.two_d,
            )(x)
        return nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32)(x)


class MedNeXt(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    base_channels: int = 32
    exp_ratios: Sequence[int] = (2,) * 9
    block_counts: Sequence[int] = (2,) * 9
    kernel: int = 3
    norm: str = "group"
    deep_supervision: bool = False
    dtype: Any = jnp.bfloat16
    remat: bool = False
    heads: Optional[Tuple[Tuple[str, int, int], ...]] = None  # (name, out_ch, blocks)
    two_d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.base_channels
        R = list(self.exp_ratios)
        B = list(self.block_counts)
        x = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="stem")(x)
        skips = []
        # encoder stages 0..3
        for i in range(4):
            x = _Stage(C * 2**i, B[i], R[i], self.kernel, self.norm, self.dtype, self.remat, self.two_d)(x)
            skips.append(x)
            x = MedNeXtBlock(
                C * 2**i, R[i], self.kernel, self.norm, self.dtype,
                out_features=C * 2 ** (i + 1), stride=2, two_d=self.two_d,
            )(x)
        # bottleneck
        x = _Stage(C * 16, B[4], R[4], self.kernel, self.norm, self.dtype, self.remat, self.two_d)(x)
        ds: List[Any] = []
        # decoder stages 5..8
        for j in range(4):
            i = 3 - j
            x = MedNeXtBlock(
                C * 2 ** (i + 1), R[5 + j], self.kernel, self.norm, self.dtype,
                out_features=C * 2**i, stride=2, transpose=True, two_d=self.two_d,
            )(x)
            x = x + skips[i]
            x = _Stage(C * 2**i, B[5 + j], R[5 + j], self.kernel, self.norm, self.dtype, self.remat, self.two_d)(x)
            if self.deep_supervision and i > 0:
                ds.append(nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name=f"ds_head_{i}")(x))
        if self.heads:
            outputs: Dict[str, Any] = {}
            for name, out_ch, nblocks in self.heads:
                outputs[name] = MedNeXtTaskHead(
                    out_ch, nblocks, 2, self.kernel, self.norm, self.dtype,
                    two_d=self.two_d, name=f"head_{name}"
                )(x)
            if self.deep_supervision:
                for k, d in enumerate(reversed(ds)):
                    outputs[f"ds_{k}"] = d
            return outputs
        out = nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(x)
        if self.deep_supervision:
            res = {"out": out}
            for k, d in enumerate(reversed(ds)):
                res[f"ds_{k}"] = d
            return res
        return out


@register_architecture("mednext", "MedNeXt S/B/M/L ConvNeXt-style 3D U-Net")
def build_mednext(model_cfg):
    m = model_cfg.mednext
    size = (m.size or "S").upper()
    if size in _PRESETS:
        base, ratios, counts = _PRESETS[size]
    else:  # custom
        base = m.base_channels
        ratios = m.exp_ratio if isinstance(m.exp_ratio, list) else [m.exp_ratio] * 9
        counts = m.block_counts or [2] * 9
    ds = m.deep_supervision
    if ds is None:
        ds = model_cfg.loss.deep_supervision
    heads = None
    if m.heads:
        heads = tuple((h.name, h.out_channels, h.num_blocks) for h in m.heads)
    return MedNeXt(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        base_channels=base,
        exp_ratios=tuple(ratios),
        block_counts=tuple(counts),
        kernel=m.kernel_size,
        norm=m.norm_type,
        deep_supervision=bool(ds),
        dtype=jnp.dtype(model_cfg.compute_dtype),
        two_d=(str(m.dim).lower() == "2d"),
        remat=(m.checkpoint_style == "outside_block"),
        heads=heads,
    )
