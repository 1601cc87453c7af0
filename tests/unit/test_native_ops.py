"""Native C++ ops tests, cross-checked against scipy oracles."""

import numpy as np
import pytest
from scipy import ndimage

from pytorch_connectomics_tpu.ops import (
    affinity_connected_components,
    agglomerate,
    binary_dilation,
    binary_erosion,
    connected_components,
    edt,
    mutex_watershed,
    remap,
    remove_small,
    renumber,
    watershed,
)
from pytorch_connectomics_tpu.ops.native import get_lib


def test_native_library_loads():
    assert get_lib() is not None, "C++ ops library must compile and load"


def test_ccl_matches_scipy():
    rng = np.random.default_rng(0)
    fg = rng.random((16, 32, 32)) > 0.7
    for conn, order in ((6, 1), (18, 2), (26, 3)):
        ours, n_ours = connected_components(fg, conn)
        ref, n_ref = ndimage.label(fg, structure=ndimage.generate_binary_structure(3, order))
        assert n_ours == n_ref
        # same partition (bijective label mapping)
        pairs = set(zip(ours.ravel().tolist(), ref.ravel().tolist()))
        assert len(pairs) == n_ref + 1  # K pairs + (0,0)


def test_remap_and_renumber():
    lab = np.array([[[0, 5, 5], [7, 0, 9]]], dtype=np.uint32)
    out = remap(lab, {5: 1, 7: 2, 9: 2})
    assert out.tolist() == [[[0, 1, 1], [2, 0, 2]]]
    ren, n = renumber(np.array([[[0, 9, 9, 4]]], dtype=np.uint32))
    assert n == 2
    assert ren.tolist() == [[[0, 1, 1, 2]]]


def test_remove_small():
    lab = np.zeros((4, 8, 8), np.uint32)
    lab[0, 0, 0] = 1  # 1 voxel
    lab[1:3, 2:6, 2:6] = 2  # 32 voxels
    out, kept = remove_small(lab, 10)
    assert kept == 1
    assert (out == 1).sum() == 0 and (out == 2).sum() == 32


def test_watershed_two_basins():
    # energy: two wells separated by a ridge at x=8
    energy = np.zeros((2, 4, 16), np.float32)
    energy[..., 8] = 10.0
    seeds = np.zeros_like(energy, dtype=np.uint32)
    seeds[0, 0, 2] = 1
    seeds[0, 0, 12] = 2
    out = watershed(energy, seeds)
    assert (out[..., :8] == 1).all()
    assert (out[..., 9:] == 2).all()
    assert set(np.unique(out[..., 8])) <= {1, 2}


def test_affinity_cc_two_instances():
    # two segments along x joined internally, separated at x=4
    # channel order: aff[0]=x, aff[1]=y, aff[2]=z (offsets [(0,0,1),(0,1,0),(1,0,0)])
    z, y, x = 2, 2, 8
    aff = np.zeros((3, z, y, x), np.float32)
    aff[0, :, :, 1:4] = 1.0  # x-affinities inside segment A (voxels 0..3)
    aff[0, :, :, 5:8] = 1.0  # inside segment B (voxels 4..7)
    aff[2, 1] = 1.0  # z connectivity everywhere
    aff[1, :, 1] = 1.0  # y connectivity
    seg, n = affinity_connected_components(aff, 0.5)
    assert n == 2
    assert seg[0, 0, 0] != seg[0, 0, 5]
    assert seg[0, 0, 0] == seg[1, 1, 3]


def test_agglomerate_merges_high_affinity():
    z, y, x = 2, 2, 8
    frag = np.zeros((z, y, x), np.uint32)
    frag[..., :4] = 1
    frag[..., 4:] = 2
    aff = np.ones((3, z, y, x), np.float32)
    # boundary affinity between frag 1|2 at x=4 (x-channel 0 at high end)
    aff[0, :, :, 4] = 0.9
    merged, n = agglomerate(frag, aff, threshold=0.5)
    assert n == 1
    aff[0, :, :, 4] = 0.1
    split, n2 = agglomerate(frag, aff, threshold=0.5)
    assert n2 == 2


def test_mutex_watershed_basic():
    # 1-D line of 8 voxels: strong attraction within halves, strong repulsion
    # between the centers of the halves
    z, y, x = 1, 1, 8
    offsets = [[0, 0, 1], [0, 0, 4]]
    aff = np.zeros((2, z, y, x), np.float32)
    aff[0, 0, 0, 1:4] = 0.9  # attract 0-1-2-3
    aff[0, 0, 0, 5:8] = 0.9  # attract 4-5-6-7
    aff[0, 0, 0, 4] = 0.4  # weak attraction across the cut
    aff[1, 0, 0, 4:] = 0.05  # low long-range affinity = strong repulsion x->x+4
    seg, n = mutex_watershed(aff, offsets)
    assert seg[0, 0, 0] == seg[0, 0, 3]
    assert seg[0, 0, 4] == seg[0, 0, 7]
    assert seg[0, 0, 0] != seg[0, 0, 4]


def test_morphology_matches_scipy():
    rng = np.random.default_rng(1)
    m = rng.random((8, 16, 16)) > 0.5
    st = ndimage.generate_binary_structure(3, 1)
    np.testing.assert_array_equal(
        binary_erosion(m, 1), ndimage.binary_erosion(m, st)
    )
    np.testing.assert_array_equal(
        binary_dilation(m, 1), ndimage.binary_dilation(m, st)
    )


def test_edt_matches_scipy_single_instance():
    lab = np.zeros((8, 16, 16), np.uint32)
    lab[2:6, 4:12, 4:12] = 1
    ours = edt(lab)
    ref = ndimage.distance_transform_edt(lab > 0)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_edt_multilabel_boundary_between_instances():
    lab = np.zeros((1, 1, 8), np.uint32)
    lab[0, 0, :4] = 1
    lab[0, 0, 4:] = 2
    d = edt(lab)
    # distance at the touching boundary is 1 (to the other instance), not large
    assert d[0, 0, 3] == pytest.approx(1.0, abs=1e-3)
    assert d[0, 0, 4] == pytest.approx(1.0, abs=1e-3)
    # open volume border (black_border=False): distance measured to the
    # inter-instance wall at x=4, not to the volume edge
    assert d[0, 0, 0] == pytest.approx(4.0, abs=1e-3)
