"""Misc label targets: binary mask, synaptic polarity, small-object mask,
flow fields, weight maps, label cleanup.

Reference: ``connectomics/data/processing/target.py`` (polarity :218,
small-object :256, flows :28) and weight transforms
(``processing/transforms.py:426,446``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage


def seg_to_binary(seg: np.ndarray, dtype=np.float32) -> np.ndarray:
    return (np.asarray(seg) > 0).astype(dtype)


def seg_to_polarity(
    seg: np.ndarray, exclusive: bool = False, dtype=np.float32
) -> np.ndarray:
    """Synaptic polarity. Convention follows the reference (odd ids = pre,
    even ids = post; ``target.py:218``; parity-locked by
    ``tests/unit/test_target_parity.py``).

    ``exclusive=False``: 3 non-exclusive channels (pre, post, union) for BCE.
    ``exclusive=True``: single-channel int64 classes {0: bg, 1: pre, 2: post}
    for CE."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    pre = (seg > 0) & (seg % 2 == 1)
    post = (seg > 0) & (seg % 2 == 0)
    if exclusive:
        return np.maximum(pre.astype(np.int64), 2 * post.astype(np.int64))
    return np.stack([pre, post, pre | post]).astype(dtype)


def seg_to_small_object(
    seg: np.ndarray, size_threshold: int = 1000, dtype=np.float32
) -> np.ndarray:
    """Mask of voxels belonging to instances smaller than threshold
    (reference ``target.py:256``)."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    ids, counts = np.unique(seg, return_counts=True)
    small = set(ids[(counts < size_threshold) & (ids > 0)].tolist())
    if not small:
        return np.zeros(seg.shape, dtype=dtype)
    lut = np.zeros(int(seg.max()) + 1, dtype=bool)
    for s in small:
        lut[int(s)] = True
    return lut[seg].astype(dtype)


def seg_to_flow(seg: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Center-of-mass flow field (cellpose-style): 3 channels of normalized
    offsets toward each instance's centroid (reference ``target.py:28``)."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    out = np.zeros((3,) + seg.shape, dtype=dtype)
    coords = np.meshgrid(*[np.arange(n, dtype=np.float32) for n in seg.shape], indexing="ij")
    for iid in np.unique(seg):
        if iid == 0:
            continue
        m = seg == iid
        com = [float(c[m].mean()) for c in coords]
        for d in range(3):
            v = com[d] - coords[d][m]
            norm = np.abs(v).max()
            out[d][m] = v / max(norm, 1e-6)
    return out


def binary_ratio_weight(target: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Inverse-class-frequency weights (reference ``ComputeBinaryRatioWeightd``,
    ``processing/transforms.py:426``)."""
    fg = np.asarray(target) > 0
    n = fg.size
    pos = int(fg.sum())
    if pos == 0 or pos == n:
        return np.ones(fg.shape, dtype=dtype)
    w_pos = n / (2.0 * pos)
    w_neg = n / (2.0 * (n - pos))
    return np.where(fg, w_pos, w_neg).astype(dtype)


def unet3d_weight(
    seg: np.ndarray, w0: float = 10.0, sigma: float = 5.0, dtype=np.float32
) -> np.ndarray:
    """U-Net border-emphasis weight map (reference ``ComputeUNet3DWeightd``,
    ``processing/transforms.py:446``): class-balance plus exponential bump
    near instance boundaries."""
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    base = binary_ratio_weight(seg > 0, dtype)
    bg = seg == 0
    if bg.any() and (~bg).any():
        d = ndimage.distance_transform_edt(bg)
        border = w0 * np.exp(-(d**2) / (2.0 * sigma**2))
        base = base + np.where(bg, border, 0.0)
    return base.astype(dtype)


def relabel_connected_components(seg: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Split disconnected components of each id into separate labels
    (reference ``RelabelConnectedComponentsd``, ``transforms.py:536``)."""
    seg = np.asarray(seg)
    squeeze = False
    if seg.ndim == 4:
        seg, squeeze = seg[0], True
    st = ndimage.generate_binary_structure(seg.ndim, connectivity)
    out, _ = ndimage.label(seg > 0, structure=st)
    # preserve splits between touching different-id instances
    combined = out.astype(np.int64) * (int(seg.max()) + 1) + seg.astype(np.int64)
    _, relabeled = np.unique(combined, return_inverse=True)
    relabeled = relabeled.reshape(seg.shape).astype(np.uint32)
    relabeled[seg == 0] = 0
    # compact ids
    _, relabeled = np.unique(relabeled, return_inverse=True)
    relabeled = relabeled.reshape(seg.shape).astype(np.uint32)
    return relabeled[None] if squeeze else relabeled


def normalize_labels(seg: np.ndarray) -> np.ndarray:
    """Remap ids to contiguous 0..K (reference ``NormalizeLabelsd``)."""
    seg = np.asarray(seg)
    _, inv = np.unique(seg, return_inverse=True)
    return inv.reshape(seg.shape).astype(np.uint32)


def energy_quantize(energy: np.ndarray, levels: int = 10) -> np.ndarray:
    """Quantize a continuous energy map (typically in [-1, 1] or [0, 1])
    into discrete classes (reference ``EnergyQuantized`` / ``processing/
    quantize.py:12``): class 0 = negative energy, classes 1..levels = the
    [0, 1] range split into ``levels`` bins (1.0 lands in the top bin).
    ``decode_quantize``'s mean-mode centers ``linspace(-1/lv, 1-1/lv, C)``
    assume exactly this class layout (C = levels + 1)."""
    bins = np.concatenate([[-1.0], np.linspace(0.0, 1.0, levels + 1)])
    bins[-1] = 1.1  # values at exactly 1.0 fall in the top bin
    return (np.digitize(np.asarray(energy, dtype=np.float32), bins) - 1).astype(np.int64)


def decode_quantize(output: np.ndarray, mode: str = "max", levels: int = 0) -> np.ndarray:
    """Decode per-level class scores (C, Z, Y, X) back to a continuous
    energy map (reference ``processing/quantize.py:28``): ``max`` takes the
    argmax level / levels; ``mean`` softmax-weights the level centers."""
    if mode not in ("max", "mean"):
        raise ValueError(f"decode_quantize mode must be max|mean, got {mode!r}")
    out = np.asarray(output, dtype=np.float32)
    c = out.shape[0]
    lv = int(levels) if levels else c
    if mode == "max":
        return np.argmax(out, axis=0).astype(np.float32) / float(lv)
    centers = np.linspace(-1.0 / lv, 1.0 - 1.0 / lv, c, dtype=np.float32)
    ex = np.exp(out - out.max(axis=0, keepdims=True))
    w = ex / ex.sum(axis=0, keepdims=True)
    return np.tensordot(centers, w, axes=(0, 0)).astype(np.float32)
