"""Native TEASAR skeletonization (csrc teasar_skeleton; kimimaro equivalent,
reference metrics/skeleton_build.py)."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.metrics.skeleton import (
    Skeleton,
    skeletonize_instance,
    skeletonize_volume,
)
from pytorch_connectomics_tpu.ops.native import get_lib, teasar_skeleton

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def test_teasar_straight_tube_centerline():
    m = np.zeros((8, 50, 8), np.uint8)
    m[2:6, 2:48, 2:6] = 1
    nodes, edges = teasar_skeleton(m)
    assert len(nodes) >= 40 and len(edges) == len(nodes) - 1  # a single tree path
    length = np.linalg.norm(
        nodes[edges[:, 0]] - nodes[edges[:, 1]], axis=1
    ).sum()
    assert 40 <= length <= 55  # tube is 46 long
    # centerline stays near the tube axis (z=3.5, x=3.5)
    assert np.abs(nodes[:, [0, 2]] - 3.5).max() <= 1.5


def test_teasar_l_shape_has_corner():
    m = np.zeros((6, 40, 40), np.uint8)
    m[1:5, 2:36, 2:6] = 1  # vertical arm (along y)
    m[1:5, 32:36, 2:36] = 1  # horizontal arm (along x)
    nodes, edges = teasar_skeleton(m)
    # the skeleton must reach both arm ends
    assert nodes[:, 1].max() > 30 and nodes[:, 1].min() < 6
    assert nodes[:, 2].max() > 30
    # total length ~ two 34-long arms
    length = np.linalg.norm(nodes[edges[:, 0]] - nodes[edges[:, 1]], axis=1).sum()
    assert 50 <= length <= 90


def test_teasar_branching_y():
    """A Y-shaped object produces a branched tree (some node has degree 3)."""
    m = np.zeros((6, 40, 24), np.uint8)
    m[1:5, 2:22, 10:14] = 1  # trunk
    m[1:5, 20:38, 2:6] = 1  # branch A
    m[1:5, 20:38, 18:22] = 1  # branch B
    m[1:5, 18:24, 2:22] = 1  # junction blob connecting all
    nodes, edges = teasar_skeleton(m)
    deg = np.zeros(len(nodes), int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    assert (deg >= 3).any(), "expected a branch point"
    # all three extremities reached
    assert nodes[:, 1].min() < 6 and nodes[:, 1].max() > 34


def test_skeletonize_instance_uses_teasar_and_offsets():
    m = np.zeros((10, 30, 10), bool)
    m[4:8, 5:25, 4:8] = 1
    sk = skeletonize_instance(m)
    assert isinstance(sk, Skeleton)
    # nodes are in FULL-volume coordinates (bbox offset applied)
    assert sk.nodes[:, 1].min() >= 5 and sk.nodes[:, 1].max() <= 25
    assert 15 <= sk.total_length <= 28
    # mst fallback still available
    sk2 = skeletonize_instance(m, method="mst")
    assert sk2.total_length > 0


def test_skeletonize_volume_multi_instance():
    lab = np.zeros((8, 40, 20), np.uint32)
    lab[2:6, 2:38, 2:6] = 1
    lab[2:6, 2:38, 12:16] = 2
    out = skeletonize_volume(lab)
    assert set(out) == {1, 2}
    for sk in out.values():
        assert 28 <= sk.total_length <= 45
