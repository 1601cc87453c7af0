"""Reference-golden parity for the target-generation zoo (VERDICT r3 item 5).

``fixtures/target_goldens.npz`` holds the outputs of the REFERENCE pure
numpy/scipy generators on seed-42 fixture volumes (regenerate with
``scripts/gen_parity_goldens.py`` against a reference checkout):

- ``seg_to_affinity`` (``connectomics/data/processing/affinity.py:408``) —
  deepem + banis storage modes, mixed short/long/negative offsets, validity
  masks over -1-unlabeled voxels
- ``seg_to_lsd`` (``lsd.py:35``) — gaussian/sphere modes, aniso voxel size,
  component subsets
- ``seg_to_instance_bd`` (``target.py:122``) — 3 edge modes x 2d/3d x
  thickness {1, 3}
- ``seg_to_polarity`` (``target.py:218``) — multi-channel + exclusive
"""

from pathlib import Path

import numpy as np
import pytest

from pytorch_connectomics_tpu.data.targets import (
    affinity_unlabeled_mask,
    seg_to_affinity,
    seg_to_polarity,
)
from pytorch_connectomics_tpu.data.targets.distance import instance_boundary_mask
from pytorch_connectomics_tpu.data.targets.lsd import seg_to_lsd

_NPZ = Path(__file__).parent / "fixtures" / "target_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    return np.load(_NPZ)


def _offsets(goldens):
    return [tuple(int(v) for v in row) for row in goldens["offsets"]]


@pytest.mark.parametrize("mode", ["deepem", "banis"])
def test_affinity_values_match_reference(goldens, mode):
    aff = seg_to_affinity(goldens["seg"], _offsets(goldens), affinity_mode=mode)
    np.testing.assert_array_equal(
        aff.astype(bool), goldens[f"aff_{mode}_values"]
    )


@pytest.mark.parametrize("mode", ["deepem", "banis"])
def test_affinity_mask_matches_reference(goldens, mode):
    mask = affinity_unlabeled_mask(
        goldens["seg"], _offsets(goldens), affinity_mode=mode
    )
    np.testing.assert_array_equal(mask.astype(bool), goldens[f"aff_{mode}_mask"])


def test_affinity_modes_differ_on_fixture(goldens):
    # guard against a degenerate fixture where deepem == banis would make the
    # two parametrized asserts redundant
    assert not np.array_equal(
        goldens["aff_deepem_values"][3:], goldens["aff_banis_values"][3:]
    )


@pytest.mark.parametrize(
    "tag,kw",
    [
        ("g5", dict(sigma=5.0)),
        ("aniso", dict(sigma=(10.0, 5.0, 5.0), voxel_size=(2, 1, 1))),
        ("sub0129", dict(sigma=5.0, components="0129")),
        ("sphere", dict(sigma=4.0, mode="sphere")),
    ],
)
def test_lsd_matches_reference(goldens, tag, kw):
    ours = seg_to_lsd(goldens["seg_clean"].astype(np.uint64), **kw)
    ref = goldens[f"lsd_{tag}"]
    assert ours.shape == ref.shape
    # float32 accumulation-order noise only (measured max diff 1.2e-5, in a
    # sphere-mode Pearson channel; gaussian modes are within 1.3e-6)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("edge_mode", ["all", "seg-all", "seg-no-bg"])
@pytest.mark.parametrize("bmode", ["3d", "2d"])
def test_boundary_t1_matches_reference(goldens, edge_mode, bmode):
    ours = instance_boundary_mask(
        goldens["seg_clean"], thickness=1, mode=bmode, edge_mode=edge_mode
    )
    np.testing.assert_array_equal(
        ours.astype(np.uint8), goldens[f"bd_t1_{edge_mode}_{bmode}"]
    )


@pytest.mark.parametrize("edge_mode", ["all", "seg-all", "seg-no-bg"])
def test_boundary_t3_matches_reference(goldens, edge_mode):
    ours = instance_boundary_mask(
        goldens["seg_clean"], thickness=3, mode="3d", edge_mode=edge_mode
    )
    np.testing.assert_array_equal(
        ours.astype(np.uint8), goldens[f"bd_t3_{edge_mode}_3d"]
    )


def test_boundary_legacy_mode_unchanged(goldens):
    # edge_mode=None must keep the historic behavior the bcd decoder trained
    # against: any change, foreground-restricted
    seg = goldens["seg_clean"]
    legacy = instance_boundary_mask(seg, thickness=1, mode="3d")
    explicit = instance_boundary_mask(seg, 1, "3d", edge_mode="seg-all")
    np.testing.assert_array_equal(legacy, explicit & (seg > 0))


def test_polarity_matches_reference(goldens):
    seg = np.abs(goldens["seg_clean"])
    multi = seg_to_polarity(seg)
    np.testing.assert_array_equal(multi, goldens["polarity_multi"])
    excl = seg_to_polarity(seg, exclusive=True)
    assert excl.dtype == np.int64
    np.testing.assert_array_equal(excl, goldens["polarity_excl"])
