"""Fused-kernel MedNeXt inference forward.

Runs the full-resolution stages (the ~3/4 of wall-clock where XLA's
depthwise-conv lowering collapses to <1 TFLOPS — see CLAUDE.md measurements)
through the Pallas fused-block kernels (ops/fused_block_pallas.py) in the
(B, Z, Y, C, X) lane layout, and everything else (stem, down/up transition
blocks, deep stages, heads) through the ordinary flax modules so semantics
stay exactly the reference's (``mednext_models.py:304``).

Only used at inference (the bench workload + sliding-window predictors);
training keeps the plain flax forward/backward.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.fused_block_pallas import fused_mednext_block
from .mednext import MedNeXt, MedNeXtBlock, _Stage

# a stage runs fused when C (sublanes) stays MXU-friendly and X (lanes) is
# not hopelessly padded: stage0 (C=32, X=full) and stage1 (C=64, X/2)
_FUSED_MAX_C = 64
_FUSED_MIN_X = 48


def _to_cx(x):  # NDHWC -> NZYCX
    return jnp.transpose(x, (0, 1, 2, 4, 3))


def _from_cx(x):  # NZYCX -> NDHWC
    return jnp.transpose(x, (0, 1, 2, 4, 3))


def _fused_block_cx(x_cx, block_params: Dict[str, Any], eps: float = 1e-6):
    """One stride-1 same-channel MedNeXt block on (B, Z, Y, C, X) data."""
    w_dw = block_params["Conv_0"]["kernel"][:, :, :, 0, :]  # (k,k,k,C)
    b_dw = block_params["Conv_0"]["bias"]
    gn = block_params["Norm_0"]["GroupNorm_0"]
    w1 = block_params["Conv_1"]["kernel"][0, 0, 0]  # (C, RC)
    b1 = block_params["Conv_1"]["bias"]
    w2 = block_params["Conv_2"]["kernel"][0, 0, 0]  # (RC, Cout)
    b2 = block_params["Conv_2"]["bias"]
    k = w_dw.shape[0]
    return fused_mednext_block(
        x_cx, w_dw, b_dw, gn["scale"], gn["bias"], w1, b1, w2, b2, eps=eps, k=k
    )


def _stage_fused(x_cx, stage_params, num_blocks: int):
    for j in range(num_blocks):
        x_cx = _fused_block_cx(x_cx, stage_params[f"MedNeXtBlock_{j}"])
    return x_cx


def fused_mednext_forward(
    model: MedNeXt, params, x,
    fused_max_c: int = _FUSED_MAX_C, fused_min_x: int = _FUSED_MIN_X,
):
    """Inference-only forward equivalent to ``model.apply({'params': params},
    x)['out' or tensor]`` with fused full-res stages. Deep-supervision heads
    are skipped (inference consumes the primary output only)."""
    C = model.base_channels
    R = list(model.exp_ratios)
    B = list(model.block_counts)
    kern = model.kernel
    dtype = model.dtype

    def sub(mod, p, v, name):
        return mod.apply({"params": p[name]}, v)

    # stem (1x1x1 conv, NDHWC)
    import flax.linen as nn

    x = x.astype(dtype)
    stem = nn.Conv(C, (1, 1, 1), dtype=dtype)
    h = stem.apply({"params": params["stem"]}, x)

    def stage_mod(feat, nb, ratio):
        return _Stage(feat, nb, ratio, kern, model.norm, dtype, model.remat)

    def block_mod(feat, ratio, out_feat, stride, transpose):
        return MedNeXtBlock(
            feat, ratio, kern, model.norm, dtype,
            out_features=out_feat, stride=stride, transpose=transpose,
        )

    skips = []
    for i in range(4):
        feat = C * 2**i
        x_size = h.shape[3]
        if feat <= fused_max_c and x_size >= fused_min_x:
            h = _from_cx(_stage_fused(_to_cx(h), params[f"_Stage_{i}"], B[i]))
        else:
            h = stage_mod(feat, B[i], R[i]).apply({"params": params[f"_Stage_{i}"]}, h)
        skips.append(h)
        h = block_mod(feat, R[i], feat * 2, 2, False).apply(
            {"params": params[f"MedNeXtBlock_{i}"]}, h
        )
    h = stage_mod(C * 16, B[4], R[4]).apply({"params": params["_Stage_4"]}, h)
    for j in range(4):
        i = 3 - j
        feat = C * 2**i
        h = block_mod(feat * 2, R[5 + j], feat, 2, True).apply(
            {"params": params[f"MedNeXtBlock_{4 + j}"]}, h
        )
        h = h + skips[i]
        x_size = h.shape[3]
        if feat <= fused_max_c and x_size >= fused_min_x:
            h = _from_cx(_stage_fused(_to_cx(h), params[f"_Stage_{5 + j}"], B[5 + j]))
        else:
            h = stage_mod(feat, B[5 + j], R[5 + j]).apply(
                {"params": params[f"_Stage_{5 + j}"]}, h
            )
    if model.heads:
        from .mednext import MedNeXtTaskHead

        outputs = {}
        for name, out_ch, nblocks in model.heads:
            mod = MedNeXtTaskHead(out_ch, nblocks, 2, kern, model.norm, dtype)
            outputs[name] = mod.apply({"params": params[f"head_{name}"]}, h)
        return outputs
    head = nn.Conv(model.out_channels, (1, 1, 1), dtype=jnp.float32)
    return head.apply({"params": params["head"]}, h)


def make_fused_apply_fn(model, cfg=None):
    """Returns apply_fn(variables, x) using the fused inference forward when
    the model is a plain MedNeXt; falls back to model.apply otherwise."""
    if not isinstance(model, MedNeXt):
        def apply_fn(variables, x):
            return model.apply(variables, x)

        return apply_fn

    def apply_fn(variables, x):
        p = variables["params"] if "params" in variables else variables
        return fused_mednext_forward(model, p, x)

    return apply_fn
