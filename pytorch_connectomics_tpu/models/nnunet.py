"""nnU-Net v2 checkpoint/plans loader: build a matching Flax U-Net topology
from an nnU-Net ``plans.json`` configuration and fill it with the trained
torch weights for inference.

Reference: ``connectomics/models/architectures/nnunet_models.py:49,146``.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, UpConv
from .registry import register_architecture

logger = logging.getLogger(__name__)


class PlainConvUNet(nn.Module):
    """nnU-Net PlainConvUNet topology: per-stage double conv (stride on the
    first conv of each encoder stage), transposed-conv decoder, optional
    deep supervision heads."""

    in_channels: int = 1
    out_channels: int = 2
    features_per_stage: Sequence[int] = (32, 64, 128, 256)
    strides: Sequence[Sequence[int]] = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    kernel_sizes: Sequence[Sequence[int]] = ((3, 3, 3),) * 4
    n_conv_per_stage: Any = 2  # int, or per-stage Sequence[int] (nnU-Net plans)
    # decoder conv counts (nnU-Net ``n_conv_per_stage_decoder``): length
    # S-1, ordered deepest decoder stage first; None = mirror the encoder
    n_conv_per_stage_decoder: Any = None
    norm: str = "instance"
    act: str = "leaky_relu"
    deep_supervision: bool = False
    dtype: Any = jnp.bfloat16

    def _n_conv(self, stage: int) -> int:
        if isinstance(self.n_conv_per_stage, (list, tuple)):
            return int(self.n_conv_per_stage[stage])
        return int(self.n_conv_per_stage)

    def _n_conv_dec(self, level: int) -> int:
        """Convs at decoder resolution level ``level`` (0 = full res)."""
        dec = self.n_conv_per_stage_decoder
        if dec is None:
            return self._n_conv(level)
        if isinstance(dec, (list, tuple)):
            # nnU-Net orders the decoder list deepest-first
            return int(dec[len(self.features_per_stage) - 2 - level])
        return int(dec)

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i, (f, s, k) in enumerate(zip(self.features_per_stage, self.strides, self.kernel_sizes)):
            x = ConvNormAct(f, tuple(k), strides=tuple(s), norm=self.norm, act=self.act, dtype=self.dtype)(x)
            for _ in range(self._n_conv(i) - 1):
                x = ConvNormAct(f, tuple(k), norm=self.norm, act=self.act, dtype=self.dtype)(x)
            skips.append(x)
        ds = []
        y = skips[-1]
        for i in reversed(range(len(self.features_per_stage) - 1)):
            y = UpConv(self.features_per_stage[i], tuple(self.strides[i + 1]), dtype=self.dtype)(y)
            y = jnp.concatenate([y, skips[i]], axis=-1)
            for _ in range(self._n_conv_dec(i)):
                y = ConvNormAct(
                    self.features_per_stage[i], tuple(self.kernel_sizes[i]),
                    norm=self.norm, act=self.act, dtype=self.dtype,
                )(y)
            if self.deep_supervision and i > 0:
                ds.append(nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name=f"ds_head_{i}")(y))
        out = nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(y)
        if self.deep_supervision:
            res = {"out": out}
            for kk, d in enumerate(reversed(ds)):
                res[f"ds_{kk}"] = d
            return res
        return out


class ResidualEncoderUNet(nn.Module):
    """nnU-Net ResidualEncoderUNet (ResEnc presets): encoder stages of
    BasicBlockD residual blocks (conv-norm-act, conv-norm, projected skip,
    act after add; the first block of each stage carries the stride), plain
    UNetDecoder identical to :class:`PlainConvUNet`'s."""

    in_channels: int = 1
    out_channels: int = 2
    features_per_stage: Sequence[int] = (32, 64, 128, 256)
    strides: Sequence[Sequence[int]] = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    kernel_sizes: Sequence[Sequence[int]] = ((3, 3, 3),) * 4
    n_blocks_per_stage: Any = 2
    n_conv_per_stage_decoder: Any = None
    norm: str = "instance"
    act: str = "leaky_relu"
    deep_supervision: bool = False
    dtype: Any = jnp.bfloat16

    def _n_blocks(self, stage: int) -> int:
        if isinstance(self.n_blocks_per_stage, (list, tuple)):
            return int(self.n_blocks_per_stage[stage])
        return int(self.n_blocks_per_stage or 2)

    def _n_conv_dec(self, level: int) -> int:
        dec = self.n_conv_per_stage_decoder
        if dec is None:
            return self._n_blocks(level)
        if isinstance(dec, (list, tuple)):
            return int(dec[len(self.features_per_stage) - 2 - level])
        return int(dec)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import Norm, get_act

        def res_block(x, f, k, s):
            skip = x
            y = ConvNormAct(f, tuple(k), strides=tuple(s), norm=self.norm,
                            act=self.act, dtype=self.dtype)(x)
            y = nn.Conv(f, tuple(k), padding="SAME", dtype=self.dtype)(y)
            y = Norm(self.norm, dtype=self.dtype)(y)
            if skip.shape[-1] != f or tuple(s) != (1, 1, 1):
                skip = nn.Conv(f, (1, 1, 1), strides=tuple(s), dtype=self.dtype)(skip)
                skip = Norm(self.norm, dtype=self.dtype)(skip)
            return get_act(self.act)(y + skip)

        skips = []
        for i, (f, s, k) in enumerate(
            zip(self.features_per_stage, self.strides, self.kernel_sizes)
        ):
            x = res_block(x, f, k, s)
            for _ in range(self._n_blocks(i) - 1):
                x = res_block(x, f, k, (1, 1, 1))
            skips.append(x)
        ds = []
        y = skips[-1]
        for i in reversed(range(len(self.features_per_stage) - 1)):
            y = UpConv(self.features_per_stage[i], tuple(self.strides[i + 1]), dtype=self.dtype)(y)
            y = jnp.concatenate([y, skips[i]], axis=-1)
            for _ in range(self._n_conv_dec(i)):
                y = ConvNormAct(
                    self.features_per_stage[i], tuple(self.kernel_sizes[i]),
                    norm=self.norm, act=self.act, dtype=self.dtype,
                )(y)
            if self.deep_supervision and i > 0:
                ds.append(nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name=f"ds_head_{i}")(y))
        out = nn.Conv(self.out_channels, (1, 1, 1), dtype=jnp.float32, name="head")(y)
        if self.deep_supervision:
            res = {"out": out}
            for kk, d in enumerate(reversed(ds)):
                res[f"ds_{kk}"] = d
            return res
        return out


def _map_norm(op: Optional[str]) -> str:
    """nnU-Net norm_op class path -> our Norm kind."""
    if not op:
        return "instance"
    low = op.lower()
    if "instancenorm" in low:
        return "instance"
    if "groupnorm" in low:
        return "group"
    if "batchnorm" in low:
        return "batch"
    if "layernorm" in low:
        return "layer"
    raise ValueError(f"unsupported nnU-Net norm_op {op!r}")


def _map_act(op: Optional[str]) -> str:
    if not op:
        return "leaky_relu"
    low = op.lower()
    for name in ("leakyrelu", "leaky_relu"):
        if name in low:
            return "leaky_relu"
    for name, ours in (("gelu", "gelu"), ("prelu", "prelu"), ("elu", "elu"),
                       ("relu", "relu")):
        if name in low:
            return ours
    raise ValueError(f"unsupported nnU-Net nonlin {op!r}")


def parse_nnunet_plans(plans_path: str | Path, configuration: str = "3d_fullres") -> Dict[str, Any]:
    plans = json.loads(Path(plans_path).read_text())
    cfg = plans["configurations"][configuration]
    arch = cfg.get("architecture", {})
    kw = arch.get("arch_kwargs", {})

    def _expand(seqs, fill):
        """2-D plans carry 2-element kernels/strides; a 2-D net applied
        slice-wise is a 3-D net with singleton-z ops — expand (k,k)->(1,k,k)
        and (s,s)->(1,s,s) so one topology serves both."""
        if seqs is None:
            return None
        out = []
        for s in seqs:
            if isinstance(s, (list, tuple)):
                s = tuple(int(v) for v in s)
                out.append((fill,) + s if len(s) == 2 else s)
            else:
                out.append((int(s),) * 3)
        return tuple(out)

    net_class = str(arch.get("network_class_name", "") or "")
    return {
        "patch_size": cfg.get("patch_size"),
        "network_class_name": net_class,
        "features_per_stage": kw.get("features_per_stage")
        or cfg.get("UNet_base_num_features") and None,
        "strides": _expand(kw.get("strides"), 1),
        "kernel_sizes": _expand(kw.get("kernel_sizes"), 1),
        "n_conv_per_stage": tuple(kw["n_conv_per_stage"])
        if isinstance(kw.get("n_conv_per_stage"), list)
        else kw.get("n_conv_per_stage", 2),
        "n_blocks_per_stage": tuple(kw["n_blocks_per_stage"])
        if isinstance(kw.get("n_blocks_per_stage"), list)
        else kw.get("n_blocks_per_stage"),
        "n_conv_per_stage_decoder": tuple(kw["n_conv_per_stage_decoder"])
        if isinstance(kw.get("n_conv_per_stage_decoder"), list)
        else kw.get("n_conv_per_stage_decoder"),
        "norm": _map_norm(kw.get("norm_op")),
        "act": _map_act(kw.get("nonlin")),
        "spacing": cfg.get("spacing"),
        "normalization": cfg.get("normalization_schemes", ["zscore"]),
    }


@register_architecture("nnunet", "nnU-Net v2 plans-defined PlainConvUNet")
def build_nnunet(model_cfg):
    n = model_cfg.nnunet
    kw: Dict[str, Any] = {}
    residual = False
    if n.plans_path:
        plans = parse_nnunet_plans(n.plans_path, n.configuration)
        net_class = plans.get("network_class_name", "")
        leaf = net_class.rsplit(".", 1)[-1]
        if leaf in ("ResidualEncoderUNet", "ResEncUNet"):
            residual = True
        elif leaf and leaf != "PlainConvUNet":
            raise ValueError(
                f"unsupported nnU-Net network_class_name {net_class!r}; "
                "supported: PlainConvUNet, ResidualEncoderUNet"
            )
        if plans.get("features_per_stage"):
            kw["features_per_stage"] = tuple(plans["features_per_stage"])
        if plans.get("strides"):
            kw["strides"] = plans["strides"]
        if plans.get("kernel_sizes"):
            kw["kernel_sizes"] = plans["kernel_sizes"]
        kw["n_conv_per_stage_decoder"] = plans.get("n_conv_per_stage_decoder")
        kw["norm"] = plans.get("norm", "instance")
        kw["act"] = plans.get("act", "leaky_relu")
        if residual:
            kw["n_blocks_per_stage"] = (
                plans.get("n_blocks_per_stage") or plans.get("n_conv_per_stage", 2)
            )
        else:
            kw["n_conv_per_stage"] = plans.get("n_conv_per_stage", 2)
    cls = ResidualEncoderUNet if residual else PlainConvUNet
    return cls(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        dtype=jnp.dtype(model_cfg.compute_dtype),
        **kw,
    )


def load_nnunet_checkpoint(flax_params, checkpoint_path: str):
    """Fill params from an nnU-Net v2 torch checkpoint (shape matcher)."""
    from ..training.model_weights import load_external_weights

    return load_external_weights(
        flax_params, checkpoint_path,
        strip_prefixes=("network.", "module.", "_orig_mod.", "model."),
    )
