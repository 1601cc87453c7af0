"""Local Shape Descriptors (Sheridan et al.) as training targets.

Reference: ``connectomics/data/processing/lsd.py:35`` (itself a port of
funkelab/lsd).  10 channels, all normalized to [0,1]:
  0-2  mean offset to local center of mass (z,y,x)
  3-5  covariance diagonal (z,y,x)
  6-8  covariance off-diagonals (zy, zx, yx)
  9    local size (voxel count in the Gaussian window)

Computed per instance with separable Gaussian aggregation — O(N · #instances)
via scipy gaussian_filter on the instance mask and its moment fields.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from scipy import ndimage


def seg_to_lsd(
    seg: np.ndarray,
    sigma: Sequence[float] = (5.0, 5.0, 5.0),
    truncate: float = 3.0,
    dtype=np.float32,
) -> np.ndarray:
    seg = np.asarray(seg)
    if seg.ndim == 4:
        seg = seg[0]
    shape = seg.shape
    sigma = tuple(float(s) for s in sigma)
    coords = np.meshgrid(
        *[np.arange(n, dtype=np.float32) for n in shape], indexing="ij"
    )
    lsd = np.zeros((10,) + shape, dtype=np.float64)
    ids = np.unique(seg)
    ids = ids[ids > 0]

    def g(x):
        return ndimage.gaussian_filter(x, sigma=sigma, truncate=truncate, mode="constant")

    for iid in ids:
        mask = (seg == iid).astype(np.float64)
        # bound computation to a padded bbox for speed
        obj = ndimage.find_objects(mask.astype(np.uint8))[0]
        pad = tuple(int(np.ceil(s * truncate)) for s in sigma)
        sl = tuple(
            slice(max(0, o.start - p), min(n, o.stop + p))
            for o, p, n in zip(obj, pad, shape)
        )
        m = mask[sl]
        c = [cc[sl] for cc in coords]
        w = ndimage.gaussian_filter(m, sigma=sigma, truncate=truncate, mode="constant")
        eps = 1e-6
        inv = 1.0 / np.maximum(w, eps)
        mean = [ndimage.gaussian_filter(m * ci, sigma=sigma, truncate=truncate, mode="constant") * inv for ci in c]
        # second moments
        second = {}
        pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
        for a, b in pairs:
            second[(a, b)] = (
                ndimage.gaussian_filter(m * c[a] * c[b], sigma=sigma, truncate=truncate, mode="constant") * inv
            )
        inside = m > 0.5
        for d in range(3):
            off = (mean[d] - c[d]) / (sigma[d] * 2.0) + 0.5  # -> [0,1] around 0.5
            lsd[d][sl][inside] = np.clip(off, 0.0, 1.0)[inside]
        for k, (a, b) in enumerate(pairs[:3]):
            cov = second[(a, b)] - mean[a] * mean[b]
            lsd[3 + k][sl][inside] = np.clip(cov / (sigma[a] * sigma[b]), 0.0, 1.0)[inside]
        for k, (a, b) in enumerate(pairs[3:]):
            cov = second[(a, b)] - mean[a] * mean[b]
            lsd[6 + k][sl][inside] = np.clip(cov / (2.0 * sigma[a] * sigma[b]) + 0.5, 0.0, 1.0)[inside]
        # local size: gaussian-window voxel count normalized by window mass
        norm = (2.0 * np.pi) ** 1.5 * np.prod(sigma)
        lsd[9][sl][inside] = np.clip(w * norm / max(norm, 1.0), 0.0, 1.0)[inside]
    return lsd.astype(dtype)
