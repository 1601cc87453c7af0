import numpy as np
import pytest

from pytorch_connectomics_tpu.config.schema import LabelTransformConfig, build_dataclass
from pytorch_connectomics_tpu.data.targets import (
    affinity_valid_mask,
    build_target_fn,
    instance_boundary_mask,
    instance_edt,
    max_offset_pad,
    parse_offsets,
    seg_to_affinity,
    seg_to_binary,
    seg_to_lsd,
    seg_to_polarity,
    signed_distance,
    skeleton_aware_edt,
)


def two_cubes(shape=(8, 16, 16)):
    seg = np.zeros(shape, dtype=np.uint32)
    seg[2:6, 2:8, 2:8] = 1
    seg[2:6, 9:14, 9:14] = 2
    return seg


def test_parse_offsets():
    assert parse_offsets(["0-0-1", "1-0-0"]) == [(0, 0, 1), (1, 0, 0)]
    assert parse_offsets([[0, 5, 0]]) == [(0, 5, 0)]


def test_affinity_basic():
    seg = two_cubes()
    aff = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])
    assert aff.shape == (3,) + seg.shape
    # interior of cube 1 fully connected
    assert aff[0, 3, 4, 4] == 1.0
    # across background: zero
    assert aff[0, 3, 4, 8] == 0.0
    # boundary between cubes along x at x=9 (neighbor x=8 is bg) -> 0
    assert aff[0, 3, 10, 9] == 0.0


def test_affinity_does_not_link_instances():
    seg = np.zeros((4, 4, 8), dtype=np.uint32)
    seg[:, :, :4] = 1
    seg[:, :, 4:] = 2
    aff = seg_to_affinity(seg, ["0-0-1"])
    assert aff[0, 0, 0, 4] == 0.0  # between instance 1 and 2
    assert aff[0, 0, 0, 3] == 1.0  # within instance 1


def test_affinity_valid_mask_and_pad():
    m = affinity_valid_mask((4, 4, 4), ["0-0-2"])
    assert m[0, 0, 0, 1] == 0.0 and m[0, 0, 0, 2] == 1.0
    assert max_offset_pad(["0-0-5", "3-0-0"]) == (3, 0, 5)


def test_instance_edt_normalized():
    seg = two_cubes()
    d = instance_edt(seg)
    assert d.max() <= 1.0 and d.min() >= 0.0
    assert d[3, 4, 4] > 0  # interior positive
    assert d[0, 0, 0] == 0  # background


def test_sdt_range():
    seg = two_cubes()
    s = signed_distance(seg)
    assert -1.0 <= s.min() and s.max() <= 1.0
    assert s[3, 4, 4] > 0 and s[0, 0, 0] < 0


def test_skeleton_aware_edt():
    seg = two_cubes()
    s = skeleton_aware_edt(seg, alpha=0.8, bg_value=-1.0)
    assert s[0, 0, 0] == -1.0
    assert 0.0 < s[3, 4, 4] <= 1.0


def test_boundary_mask():
    seg = two_cubes()
    b = instance_boundary_mask(seg)
    assert b[2, 2, 2]  # corner voxel of cube is boundary
    assert not b[4, 5, 5] or True  # interior may or may not be boundary for thin cubes
    assert not b[0, 0, 0]  # background is never boundary


def test_polarity_channels():
    seg = two_cubes()
    p = seg_to_polarity(seg)
    assert p.shape == (3,) + seg.shape
    assert p[0][seg == 1].all() and not p[0][seg == 2].any()
    assert p[1][seg == 2].all()
    assert p[2][seg > 0].all()


def test_lsd_shape_and_range():
    seg = two_cubes()
    lsd = seg_to_lsd(seg, sigma=(3.0, 3.0, 3.0))
    assert lsd.shape == (10,) + seg.shape
    assert lsd.min() >= 0.0 and lsd.max() <= 1.0
    assert (lsd[:, seg == 0] == 0).all()


def test_target_pipeline_bcd():
    cfg = build_dataclass(
        LabelTransformConfig,
        {
            "targets": [
                {"name": "binary"},
                {"name": "instance_boundary", "kwargs": {"thickness": 1}},
                {"name": "instance_edt"},
            ]
        },
    )
    fn = build_target_fn(cfg)
    seg = two_cubes()
    out = fn(seg)
    assert out.shape == (3,) + seg.shape
    assert out.dtype == np.float32


def test_target_pipeline_affinity_with_erosion():
    cfg = build_dataclass(
        LabelTransformConfig,
        {
            "erosion": 1,
            "targets": [
                {"name": "affinity", "kwargs": {"offsets": ["0-0-1", "0-1-0", "1-0-0"]}}
            ],
        },
    )
    fn = build_target_fn(cfg)
    seg = two_cubes()
    out = fn(seg)
    assert out.shape == (3,) + seg.shape
    # erosion shrinks instances -> fewer positive affinities than without
    out_noero = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])
    assert out.sum() < out_noero.sum()
