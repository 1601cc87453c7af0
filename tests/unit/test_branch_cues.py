"""Branch-split cue-ladder tests (reference branch/split.py behaviors):
adaptive IoU change-point cutting with its over-cut gates, sustained area
bump detection, one-sided-containment pair detection, and the two-sided
anchored carve."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.decoding import branch_cues as bc


def _disk(yx, cy, cx, r):
    yy, xx = np.mgrid[: yx[0], : yx[1]]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


# ---------------------------------------------------------------- link cut


def _mislinked_tube(jump_z=30, Z=60, shape=(60, 48, 48)):
    """One label: square tube at (10,10) for z<jump_z, jumps to (30,30)."""
    seg = np.zeros(shape, np.uint32)
    for z in range(Z):
        if z < jump_z:
            seg[z, 8:16, 8:16] = 1
        else:
            seg[z, 30:38, 30:38] = 1
    return seg


def test_link_cut_change_cuts_mislink():
    seg = _mislinked_tube()
    out, n_cut = bc.link_cut_change(seg, min_size=100)
    assert n_cut == 1
    # the two halves now carry different labels
    assert out[10, 12, 12] != out[50, 34, 34]
    assert out[10, 12, 12] > 0 and out[50, 34, 34] > 0
    # voxels preserved
    assert (out > 0).sum() == (seg > 0).sum()


def test_link_cut_change_recover_gate_limits_single_bad_slice():
    """One displaced slice with clean recovery two slices out: the recover
    gate skips the leading seam (reference split.py:178), so at most one cut
    lands and the bad section is never isolated into its own fragment."""
    seg = np.zeros((60, 48, 48), np.uint32)
    for z in range(60):
        seg[z, 8:16, 8:16] = 1
    seg[30] = 0
    seg[30, 30:38, 30:38] = 1  # single displaced section
    out, n_cut = bc.link_cut_change(seg, min_size=100, recover=0.4)
    labels = np.unique(out[out > 0])
    assert n_cut <= 1 and len(labels) <= 2
    # the displaced section was not isolated as a third fragment
    assert out[30, 34, 34] in labels


def test_link_cut_change_min_frag_spacing():
    """Cuts closer than min_frag to an end are rejected."""
    seg = _mislinked_tube(jump_z=3)  # jump too close to the start
    out, n_cut = bc.link_cut_change(seg, min_size=100, min_frag=6)
    assert n_cut == 0


# ------------------------------------------------------------- area bump


def test_sustained_area_bump_detects_interior_bump():
    seg = np.zeros((50, 40, 40), np.uint32)
    for z in range(50):
        r = 3 if not (20 <= z < 26) else 6  # 6-slice bump in the interior
        seg[z][_disk((40, 40), 20, 20, r)] = 1
    events = bc.sustained_area_bump(seg, min_size=100, taper=4, min_run=3)
    assert len(events) == 1
    ev = events[0]
    assert ev["label"] == 1
    assert 19 <= ev["z_start"] <= 21 and 24 <= ev["z_end"] <= 27
    assert ev["peak_ratio"] >= 1.5


def test_sustained_area_bump_ignores_endpoint_taper():
    """Normal endpoint taper (the naive max-deviation failure mode) must not
    fire (reference split.py:22-27)."""
    seg = np.zeros((50, 40, 40), np.uint32)
    for z in range(50):
        r = 6
        if z < 4:
            r = 2 + z  # tapered start
        if z >= 46:
            r = 2 + (49 - z)  # tapered end
        seg[z][_disk((40, 40), 20, 20, r)] = 1
    assert bc.sustained_area_bump(seg, min_size=100, taper=5, min_run=3) == []


def test_sustained_area_bump_taper_zero_includes_all_slices():
    """taper=0 means 'no endpoint exclusion', not 'no detection' (pres[0:-0]
    is the empty-slice trap)."""
    seg = np.zeros((50, 40, 40), np.uint32)
    for z in range(50):
        r = 3 if not (20 <= z < 26) else 6
        seg[z][_disk((40, 40), 20, 20, r)] = 1
    events = bc.sustained_area_bump(seg, min_size=100, taper=0, min_run=3)
    assert len(events) == 1 and events[0]["label"] == 1


# ------------------------------------------------- containment + carve


def _tunnel_volume(Z=60, YX=56, z1=20, z2=36, r_host=16, r_tube=8):
    """Host = annulus around P for z<=z1 and z>=z2, full disk inside the gap
    (the tube fused into it); S1 = the hole for z<=z1, S2 for z>=z2."""
    seg = np.zeros((Z, YX, YX), np.uint32)
    P = YX // 2
    disk = _disk((YX, YX), P, P, r_host)
    hole = _disk((YX, YX), P, P, r_tube)
    for z in range(Z):
        if z <= z1:
            seg[z][disk & ~hole] = 3  # host
            seg[z][hole] = 1          # S1
        elif z >= z2:
            seg[z][disk & ~hole] = 3
            seg[z][hole] = 2          # S2
        else:
            seg[z][disk] = 3          # fused stretch
    return seg, dict(z1=z1, z2=z2, P=P, hole=hole)


def test_detect_confident_finds_tunnel_pair():
    seg, info = _tunnel_volume()
    bounds, sizes = bc.seg_stats(seg)
    pairs = bc.detect_confident(
        seg, bounds, sizes, host_min=1000, cand_min=100, min_end_area=20,
    )
    assert len(pairs) == 1
    f = pairs[0]
    assert {f["S1"], f["S2"]} == {1, 2}
    assert f["H"] == 3
    assert f["z1"] == info["z1"] and f["z2"] == info["z2"]


def test_detect_confident_host_must_extend_beyond_gap():
    """A 'host' that exists only inside the gap is not a tunnel host."""
    seg, info = _tunnel_volume()
    # truncate the host outside the gap -> it no longer extends beyond
    seg[seg == 3] = 0
    z1, z2, P = info["z1"], info["z2"], info["P"]
    disk = _disk(seg.shape[1:], P, P, 14)
    for z in range(z1 + 1, z2):
        seg[z][disk] = 3
    bounds, sizes = bc.seg_stats(seg)
    pairs = bc.detect_confident(
        seg, bounds, sizes, host_min=1000, cand_min=100, min_end_area=20,
    )
    assert pairs == []


def test_confident_parallel_split_carves_tube_through_host():
    seg, info = _tunnel_volume()
    before_host = int((seg == 3).sum())
    out, n, pairs = bc.confident_parallel_split(
        seg, host_min=1000, cand_min=100, min_end_area=20,
    )
    assert n == 1
    # S2 absorbed into S1, which now runs the full tube length
    assert (out == 2).sum() == 0
    z1, z2, P = info["z1"], info["z2"], info["P"]
    zm = (z1 + z2) // 2
    assert out[zm, P, P] == 1  # carved centre voxel belongs to the tube
    assert out[zm, P + 14, P] == 3  # host retains the annulus body
    # the carve stays near the caliber: host lost roughly the tube volume
    lost = before_host - int((out == 3).sum())
    tube_gap_volume = int(info["hole"].sum()) * (z2 - z1 - 1)
    assert lost <= 2 * tube_gap_volume
    # input untouched (inplace=False default)
    assert seg[zm, P, P] == 3


def test_split_pair_aborts_on_drift():
    """If the carve would exceed drift_hi x caliber the split must decline
    and leave the volume unchanged (reference abort path, split.py:455)."""
    seg, info = _tunnel_volume()
    bounds, sizes = bc.seg_stats(seg)
    pairs = bc.detect_confident(
        seg, bounds, sizes, host_min=1000, cand_min=100, min_end_area=20,
    )
    assert pairs
    before = seg.copy()
    got = bc.split_pair(seg, pairs[0], bounds, sizes, drift_hi=0.01)
    assert got == 0
    np.testing.assert_array_equal(seg, before)


def test_branch_split_decoder_runs_ladder():
    from pytorch_connectomics_tpu.decoding.branch import branch_split

    seg, info = _tunnel_volume()
    out = branch_split(
        seg, component=False, link_cut=False,
        gates=dict(host_min=1000, cand_min=100, min_end_area=20),
    )
    # after renumbering: tube is one label spanning the whole z range
    zm = (info["z1"] + info["z2"]) // 2
    tube_id = out[0, info["P"], info["P"]]
    assert tube_id > 0
    assert out[zm, info["P"], info["P"]] == tube_id
    assert out[-1, info["P"], info["P"]] == tube_id
