"""External checkpoint import: load foreign (PyTorch) checkpoints — BANIS,
nnU-Net, reference-framework runs — into our Flax models.

Reference: ``load_external_weights`` (``connectomics/training/model_weights.py:14``)
and the nnU-Net loader (``models/architectures/nnunet_models.py:49``).

Strategy: strip configured key prefixes from the torch state_dict, convert
conv kernels from torch OIZYX to flax (Z,Y,X,I,O) layout, then match
against the flax param tree by (path-suffix similarity, shape). Exact
architecture parity is not required — anything that matches by shape and
name order is filled; the rest is reported.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str, strip_prefixes: Tuple[str, ...] = ("model.", "module.", "network.")) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt.get("model_state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    out = {}
    for key, value in state.items():
        if not hasattr(value, "numpy"):
            continue
        for pre in strip_prefixes:
            if key.startswith(pre):
                key = key[len(pre):]
        out[key] = value.detach().cpu().numpy()
    return out


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch conv3d (O, I, Z, Y, X) -> flax (Z, Y, X, I, O); conv2d/1d analogous."""
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 3:
        return np.transpose(w, (2, 1, 0))
    if w.ndim == 2:  # linear (O, I) -> (I, O)
        return w.T
    return w


def _flatten(tree, prefix=()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten(v, prefix + (k,)))
    else:
        out.append((prefix, np.asarray(tree)))
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        node = root
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
    return root


def load_external_weights(
    flax_params: Any,
    checkpoint_path: str,
    strip_prefixes: Tuple[str, ...] = ("model.", "module.", "network."),
    strict: bool = False,
    upkern: bool = False,
) -> Tuple[Any, Dict[str, int]]:
    """Fill ``flax_params`` with shape-matching tensors from a torch ckpt.

    Returns (new_params, stats). Matching: greedy in-order assignment within
    each shape bucket (torch param order vs flax traversal order — both are
    construction order, which lines up for same-topology networks).

    With ``upkern=True``, a conv kernel with no same-shape source falls back
    to a source kernel matching in (in, out) channels but smaller spatial
    extent, trilinearly inflated (UpKern, reference
    ``mednext_models.py:487``)."""
    state = load_torch_state_dict(checkpoint_path, strip_prefixes)
    flat = _flatten(flax_params)
    torch_items = [(k, torch_conv_to_flax(v)) for k, v in state.items()]

    by_shape: Dict[Tuple[int, ...], List[Tuple[str, np.ndarray]]] = {}
    by_io: Dict[Tuple[int, int], List[Tuple[str, np.ndarray]]] = {}
    for k, v in torch_items:
        by_shape.setdefault(tuple(v.shape), []).append((k, v))
        if v.ndim == 5:
            by_io.setdefault((v.shape[3], v.shape[4]), []).append((k, v))

    new_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    loaded = 0
    inflated = 0
    missed = 0
    for path, value in flat:
        bucket = by_shape.get(tuple(value.shape))
        if bucket:
            src_key, src_val = bucket.pop(0)
            new_flat[path] = src_val.astype(value.dtype)
            loaded += 1
            continue
        if upkern and value.ndim == 5:
            cands = by_io.get((value.shape[3], value.shape[4]), [])
            pick = next(
                (c for c in cands
                 if c[1].shape != tuple(value.shape)
                 and all(s <= t for s, t in zip(c[1].shape[:3], value.shape[:3]))),
                None,
            )
            if pick is not None:
                cands.remove(pick)
                new_flat[path] = upkern_resize_kernel(pick[1], value.shape[:3]).astype(value.dtype)
                inflated += 1
                continue
        new_flat[path] = value
        missed += 1
    stats = {
        "loaded": loaded,
        "missed": missed,
        "inflated": inflated,
        "unused": sum(len(b) for b in by_shape.values()),
    }
    if strict and missed:
        raise ValueError(f"strict load failed: {stats}")
    logger.info("external weights: %s", stats)
    return _unflatten(new_flat), stats


# -- UpKern: small-kernel -> large-kernel transfer ---------------------------


def upkern_resize_kernel(w: np.ndarray, spatial: Tuple[int, int, int]) -> np.ndarray:
    """Trilinearly interpolate a flax conv kernel ``(z, y, x, I, O)`` to a new
    spatial extent — the UpKern initialization (Roy et al., MICCAI 2023;
    reference ``mednext_models.py:487`` via nnunet_mednext's
    ``upkern_load_weights``, which uses ``F.interpolate(mode='trilinear')``)."""
    z, y, x, ci, co = w.shape
    if (z, y, x) == tuple(spatial):
        return np.asarray(w)
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(np.transpose(w, (3, 4, 0, 1, 2)))).float()
    t = t.reshape(1, ci * co, z, y, x)
    t = F.interpolate(t, size=tuple(int(s) for s in spatial), mode="trilinear")
    t = t.reshape(ci, co, *spatial)
    return np.transpose(t.numpy(), (2, 3, 4, 0, 1)).astype(w.dtype)


def upkern_transfer(target_params: Any, source_params: Any) -> Tuple[Any, Dict[str, int]]:
    """Copy a small-kernel model's params into a large-kernel one by path:
    same-shape leaves copy verbatim; 5-D conv kernels with matching channel
    dims are trilinearly inflated; anything else keeps the target init.

    flax->flax analog of the reference's ``upkern_load_weights``
    (``mednext_models.py:487``)."""
    tgt = dict(_flatten(target_params))
    src = dict(_flatten(source_params))
    new_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    copied = inflated = kept = 0
    for path, value in tgt.items():
        s = src.get(path)
        if s is None:
            new_flat[path] = value
            kept += 1
        elif s.shape == value.shape:
            new_flat[path] = s.astype(value.dtype)
            copied += 1
        elif (
            s.ndim == 5
            and value.ndim == 5
            and s.shape[3:] == value.shape[3:]
        ):
            new_flat[path] = upkern_resize_kernel(s, value.shape[:3]).astype(value.dtype)
            inflated += 1
        else:
            logger.warning("upkern: incompatible shapes at %s: %s vs %s",
                           "/".join(path), s.shape, value.shape)
            new_flat[path] = value
            kept += 1
    stats = {"copied": copied, "inflated": inflated, "kept": kept}
    logger.info("upkern transfer: %s", stats)
    return _unflatten(new_flat), stats


def upkern_initialize(model_cfg: Any, target_params: Any) -> Any:
    """Initialize a large-kernel MedNeXt from a trained small-kernel run
    (``model.mednext.upkern_from``). Torch sources go through the shape
    matcher with spatial inflation; native checkpoints (full TrainState
    trees) are restored targetless and path-transferred — the stored arrays
    already carry the small-kernel shapes, so no source model is built."""
    m = model_cfg.mednext
    path = str(m.upkern_from)
    if path.endswith((".pt", ".pth", ".ckpt", ".pytorch")):
        params, _ = load_external_weights(target_params, path, upkern=True)
        return params

    from pathlib import Path as _P

    import orbax.checkpoint as ocp

    p = _P(path)
    if (p / "state").exists():
        p = p / "state"
    restored = ocp.StandardCheckpointer().restore(p.resolve())
    src_params = restored["params"]
    if isinstance(src_params, dict) and "model" in src_params:
        src_params = src_params["model"]
    params, _ = upkern_transfer(target_params, src_params)
    return params
