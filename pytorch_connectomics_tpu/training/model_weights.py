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
) -> Tuple[Any, Dict[str, int]]:
    """Fill ``flax_params`` with shape-matching tensors from a torch ckpt.

    Returns (new_params, stats). Matching: greedy in-order assignment within
    each shape bucket (torch param order vs flax traversal order — both are
    construction order, which lines up for same-topology networks)."""
    state = load_torch_state_dict(checkpoint_path, strip_prefixes)
    flat = _flatten(flax_params)
    torch_items = [(k, torch_conv_to_flax(v)) for k, v in state.items()]

    by_shape: Dict[Tuple[int, ...], List[Tuple[str, np.ndarray]]] = {}
    for k, v in torch_items:
        by_shape.setdefault(tuple(v.shape), []).append((k, v))

    new_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    loaded = 0
    missed = 0
    for path, value in flat:
        bucket = by_shape.get(tuple(value.shape))
        if bucket:
            src_key, src_val = bucket.pop(0)
            new_flat[path] = src_val.astype(value.dtype)
            loaded += 1
        else:
            new_flat[path] = value
            missed += 1
    stats = {"loaded": loaded, "missed": missed, "unused": sum(len(b) for b in by_shape.values())}
    if strict and missed:
        raise ValueError(f"strict load failed: {stats}")
    logger.info("external weights: %s", stats)
    return _unflatten(new_flat), stats
