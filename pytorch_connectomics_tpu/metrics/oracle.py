"""Oracle metrics: upper bounds achievable from a candidate segmentation.

Reference: ``adapted_rand_oracle`` (``metrics/segmentation_numpy.py:21``) and
skeleton oracle merge (``metrics/oracle.py:10``): relabel each candidate
segment to its majority-overlap GT id (the best possible merge of candidate
fragments), then score — measures how much error is recoverable by merging
alone (i.e., isolates split errors)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .seg import adapted_rand, voi


def oracle_merge(seg: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Map each candidate segment to its majority GT label."""
    s = np.asarray(seg).astype(np.int64)
    g = np.asarray(gt).astype(np.int64)
    keep = (s > 0)
    pairs = np.stack([s[keep], g[keep]])
    # majority gt per seg id via sparse contingency argmax
    from scipy import sparse

    cont = sparse.csr_matrix(
        (np.ones(pairs.shape[1]), (pairs[0], pairs[1])),
        shape=(int(s.max()) + 1, int(g.max()) + 1),
    ).tocsr()
    mapping = np.zeros(int(s.max()) + 1, np.int64)
    for sid in range(1, mapping.size):
        row = cont.getrow(sid)
        if row.nnz:
            mapping[sid] = row.indices[np.argmax(row.data)]
    return mapping[s].astype(np.uint32)


def adapted_rand_oracle(seg: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """(actual adapted-Rand, oracle-merged adapted-Rand)."""
    return float(adapted_rand(seg, gt)), float(adapted_rand(oracle_merge(seg, gt), gt))


def voi_oracle(seg: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    vs, vm = voi(seg, gt)
    ovs, ovm = voi(oracle_merge(seg, gt), gt)
    return {"voi_split": vs, "voi_merge": vm, "oracle_voi_split": ovs, "oracle_voi_merge": ovm}
