"""(Normalized) Expected Run Length over ground-truth skeletons.

Reference: ``connectomics/metrics/nerl.py`` (ERL graph :120, score :457, via
the external em_erl package). Definition (Januszewski et al.): walk each GT
skeleton edge; an edge "runs" while the candidate segmentation id under it
stays constant and non-zero, and is voided entirely if its segment id is
*merged* (also covers nodes of a different GT skeleton). ERL is the
skeleton-length-weighted expected length of the run containing a uniformly
random skeleton point; NERL divides by the ERL of a perfect segmentation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .skeleton import Skeleton, skeletonize_volume


def _node_segment_ids(seg: np.ndarray, skeleton: Skeleton) -> np.ndarray:
    coords = np.clip(
        np.round(skeleton.nodes).astype(np.int64),
        0,
        np.asarray(seg.shape) - 1,
    )
    return seg[tuple(coords.T)]


def expected_run_length(
    seg: np.ndarray,
    skeletons: Dict[int, Skeleton],
    merge_penalty: bool = True,
) -> Tuple[float, float]:
    """Returns (ERL, max_ERL)."""
    # detect merged segments: a candidate id under >1 distinct GT skeletons
    seg_owner: Dict[int, int] = {}
    merged: set = set()
    node_ids: Dict[int, np.ndarray] = {}
    for gt_id, sk in skeletons.items():
        ids = _node_segment_ids(seg, sk)
        node_ids[gt_id] = ids
        for s in np.unique(ids):
            if s == 0:
                continue
            if seg_owner.get(int(s), gt_id) != gt_id:
                merged.add(int(s))
            seg_owner[int(s)] = gt_id

    total_len = 0.0
    erl_num = 0.0
    max_num = 0.0
    for gt_id, sk in skeletons.items():
        ids = node_ids[gt_id]
        if len(sk.edges) == 0:
            continue
        a = sk.edges[:, 0]
        b = sk.edges[:, 1]
        lengths = np.linalg.norm(sk.nodes[a] - sk.nodes[b], axis=1)
        skel_len = float(lengths.sum())
        total_len += skel_len
        max_num += skel_len * skel_len  # perfect: one run of full length
        # build runs: edges where both endpoint ids equal, nonzero, not merged
        ok = (ids[a] == ids[b]) & (ids[a] > 0)
        if merge_penalty and merged:
            is_merged = np.isin(ids[a], list(merged))
            ok &= ~is_merged
        # union-find over nodes through ok edges to get run components
        parent = np.arange(sk.nodes.shape[0])

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in np.flatnonzero(ok):
            ra, rb = find(a[e]), find(b[e])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        run_len: Dict[int, float] = {}
        for e in np.flatnonzero(ok):
            r = find(a[e])
            run_len[r] = run_len.get(r, 0.0) + float(lengths[e])
        # ERL contribution: sum over runs of run_len^2 (weighted by length)
        erl_num += sum(v * v for v in run_len.values())
    if total_len == 0:
        return 0.0, 0.0
    return erl_num / total_len, max_num / total_len


def compute_nerl(
    seg: np.ndarray,
    gt: Optional[np.ndarray] = None,
    skeletons: Optional[Dict[int, Skeleton]] = None,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
) -> Dict[str, float]:
    """NERL score from a candidate segmentation and GT volume or skeletons
    (reference ``compute_nerl_score``, ``metrics/nerl.py:457``)."""
    if skeletons is None:
        if gt is None:
            raise ValueError("need gt volume or precomputed skeletons")
        skeletons = skeletonize_volume(gt, anisotropy=anisotropy)
    erl, max_erl = expected_run_length(seg, skeletons)
    nerl = erl / max_erl if max_erl > 0 else 0.0
    return {"erl": erl, "max_erl": max_erl, "nerl": nerl}


def skeleton_voi(seg: np.ndarray, skeletons: Dict[int, Skeleton]) -> Tuple[float, float]:
    """VOI restricted to skeleton node samples (reference ``nerl.py:340``)."""
    from .seg import voi

    gt_ids, seg_ids = [], []
    for gt_id, sk in skeletons.items():
        ids = _node_segment_ids(seg, sk)
        gt_ids.extend([gt_id] * len(ids))
        seg_ids.extend(ids.tolist())
    if not gt_ids:
        return 0.0, 0.0
    return voi(np.asarray(seg_ids)[None, None], np.asarray(gt_ids)[None, None])
