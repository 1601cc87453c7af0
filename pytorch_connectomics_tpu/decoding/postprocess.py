"""Decode postprocessing (reference ``connectomics/decoding/postprocess.py``):
small-instance removal, cc filtering, binary morphology, transpose."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..config.schema import DecodingPostprocessConfig
from ..ops import connected_components, remove_small, renumber


def remove_small_instances(labels: np.ndarray, min_size: int) -> np.ndarray:
    out, _ = remove_small(np.asarray(labels, dtype=np.uint32), min_size)
    out, _ = renumber(out)
    return out


def cc_instance_filter(labels: np.ndarray, connectivity: int = 6) -> np.ndarray:
    """Split disconnected instances (cc3d relabel pass)."""
    lab = np.asarray(labels, dtype=np.uint32)
    fg = lab > 0
    cc, _ = connected_components(fg, connectivity)
    combined = cc.astype(np.int64) * (int(lab.max()) + 1) + lab.astype(np.int64)
    _, inv = np.unique(combined, return_inverse=True)
    out = inv.reshape(lab.shape).astype(np.uint32)
    out[~fg] = 0
    out, _ = renumber(out)
    return out


def apply_postprocessing(
    labels: np.ndarray, cfg: Optional[DecodingPostprocessConfig]
) -> np.ndarray:
    if cfg is None:
        return labels
    out = np.asarray(labels)
    if cfg.split_disconnected:
        out = cc_instance_filter(out, cfg.connectivity)
    if cfg.min_instance_size:
        out = remove_small_instances(out, cfg.min_instance_size)
    if cfg.transpose:
        out = np.transpose(out, cfg.transpose)
    return out
