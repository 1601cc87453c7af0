"""Synthetic EM generator properties + visualizer smoke."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def gen():
    import jax

    from pytorch_connectomics_tpu.data.synthetic_jax import (
        sample_patches,
        synthetic_em_volume,
        synthetic_em_volume_v2,
    )

    return jax, synthetic_em_volume, synthetic_em_volume_v2, sample_patches


def test_generator_deterministic(gen):
    jax, v1, v2, _ = gen
    a_img, a_lbl = v2(jax.random.PRNGKey(3), (16, 32, 32))
    b_img, b_lbl = v2(jax.random.PRNGKey(3), (16, 32, 32))
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_lbl), np.asarray(b_lbl))
    c_img, _ = v2(jax.random.PRNGKey(4), (16, 32, 32))
    assert not np.array_equal(np.asarray(a_img), np.asarray(c_img))


def test_generator_shapes_and_ranges(gen):
    jax, v1, v2, _ = gen
    for fn in (v1, v2):
        img, lbl = fn(jax.random.PRNGKey(0), (16, 32, 32))
        img, lbl = np.asarray(img), np.asarray(lbl)
        assert img.shape == lbl.shape == (16, 32, 32)
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert set(np.unique(lbl)) <= {0, 1}
        frac = lbl.mean()
        assert 0.03 < frac < 0.3, frac  # near mito_fraction


def test_v2_distractors_share_intensity_distribution(gen):
    """v2's design: distractor interiors must be intensity-indistinguishable
    from mito interiors (no thresholding shortcut)."""
    jax, v1, v2, _ = gen
    img, lbl = v2(jax.random.PRNGKey(1), (32, 64, 64))
    img, lbl = np.asarray(img), np.asarray(lbl).astype(bool)
    inside = img[lbl].mean()
    # dark non-labeled structures exist (distractors), so the outside
    # distribution overlaps the inside one
    outside_dark_frac = (img[~lbl] < inside + 0.05).mean()
    assert outside_dark_frac > 0.1, "no distractors with mito-like intensity"


def test_sample_patches_shapes_and_flip_consistency(gen):
    jax, v1, v2, sample_patches = gen
    img, lbl = v2(jax.random.PRNGKey(0), (16, 32, 32))
    b_img, b_lbl = sample_patches(jax.random.PRNGKey(5), img, lbl, (8, 16, 16), 4)
    assert b_img.shape == (4, 8, 16, 16, 1)
    assert b_lbl.shape == (4, 8, 16, 16, 1)
    assert set(np.unique(np.asarray(b_lbl))) <= {0.0, 1.0}


def test_visualizer_writes_png(tmp_path):
    from pytorch_connectomics_tpu.training.visualizer import save_visualization

    batch = {
        "image": np.random.rand(2, 8, 16, 16, 1).astype(np.float32),
        "label": (np.random.rand(2, 8, 16, 16, 1) > 0.5).astype(np.float32),
    }
    out = np.random.rand(2, 8, 16, 16, 1).astype(np.float32)
    paths = save_visualization(tmp_path, step=7, batch=batch, outputs=out)
    assert len(paths) == 1
    p = paths[0]
    assert p.exists() and p.suffix == ".png" and p.stat().st_size > 0


def test_visualizer_multihead_grids(tmp_path):
    """Reference callback semantics on a multi-head batch (callbacks.py:306):
    head='all' renders one grid per task head; ds_* heads are excluded; a
    named head renders only itself; dict labels route per head."""
    from pytorch_connectomics_tpu.training.visualizer import (
        head_grids,
        save_visualization,
    )

    batch = {
        "image": np.random.rand(2, 8, 16, 16, 1).astype(np.float32),
        "label": {
            "mask": (np.random.rand(2, 8, 16, 16, 1) > 0.5).astype(np.float32),
            "aff": (np.random.rand(2, 8, 16, 16, 3) > 0.5).astype(np.float32),
        },
    }
    outputs = {
        "mask": np.random.randn(2, 8, 16, 16, 1).astype(np.float32),
        "aff": np.random.randn(2, 8, 16, 16, 3).astype(np.float32),
        "ds_0": np.random.randn(2, 4, 8, 8, 1).astype(np.float32),
    }
    grids = head_grids(batch, outputs, head="all")
    assert set(grids) == {"mask", "aff"}  # ds_0 excluded
    # the aff grid has 3 label + 3 pred channel columns vs mask's 1+1
    assert grids["aff"].shape[1] > grids["mask"].shape[1]
    only = head_grids(batch, outputs, head="mask")
    assert set(only) == {"mask"}
    paths = save_visualization(tmp_path, 3, batch, outputs, head="all")
    assert len(paths) == 2 and all(p.exists() for p in paths)


def test_visualizer_affinity_mask_and_crop():
    """Affinity channels are zeroed outside the valid region and the grid is
    cropped by the max offset in deepem mode (callbacks.py:65-160)."""
    from pytorch_connectomics_tpu.training.visualizer import (
        apply_affinity_visualization_mask,
        slice_grid,
    )

    offsets = [(0, 0, 1), (0, 1, 0), (1, 0, 0)]
    lbl = np.ones((1, 8, 16, 16, 3), np.float32)
    pred = np.ones((1, 8, 16, 16, 3), np.float32)
    img = np.ones((1, 8, 16, 16, 1), np.float32)
    img2, lbl2, pred2 = apply_affinity_visualization_mask(
        lbl, pred, offsets, crop=False, image=img
    )
    # deepem high-end storage: the first x-column of channel 0 is invalid
    assert lbl2[0, :, :, 0, 0].max() == 0.0 and lbl2[0, :, :, 1, 0].min() == 1.0
    assert pred2[0, :, 0, :, 1].max() == 0.0  # y offset -> first y row
    assert pred2[0, 0, :, :, 2].max() == 0.0  # z offset -> first z slice
    # crop=True trims one voxel per axis (max offset 1) from every tensor
    img3, lbl3, pred3 = apply_affinity_visualization_mask(
        lbl, pred, offsets, crop=True, image=img
    )
    assert lbl3.shape == (1, 7, 15, 15, 3) == pred3.shape
    assert img3.shape == (1, 7, 15, 15, 1)
    # grid composes after cropping
    g = slice_grid(
        {"image": img, "label": lbl}, pred, affinity_offsets=offsets
    )
    assert g.dtype == np.uint8 and g.size > 0


def test_visualizer_affinity_mask_respects_channel_groups():
    """Mixed layouts (binary + affinity) mask ONLY the affinity span: with
    label channels [binary, aff_x, aff_y, aff_z], the binary channel must
    stay untouched and the z channel (index 3) must be masked — the old
    channels-start-at-0 assumption did the opposite."""
    from pytorch_connectomics_tpu.data.targets.build import affinity_target_groups
    from pytorch_connectomics_tpu.training.visualizer import (
        apply_affinity_visualization_mask,
    )
    from pytorch_connectomics_tpu.config.schema import (
        LabelTargetConfig,
        LabelTransformConfig,
    )

    cfg = LabelTransformConfig(
        targets=[  # default affinity offsets
            LabelTargetConfig(name="binary"),
            LabelTargetConfig(name="affinity"),
        ]
    )
    groups = affinity_target_groups(cfg)
    assert groups and groups[0]["start"] == 1 and groups[0]["end"] == 4
    lbl = np.ones((1, 8, 16, 16, 4), np.float32)
    _img, lbl2, _pred = apply_affinity_visualization_mask(
        lbl, None, groups, crop=False
    )
    assert lbl2[..., 0].min() == 1.0  # binary untouched
    assert lbl2[0, :, :, 0, 1].max() == 0.0  # x-aff first column invalid
    assert lbl2[0, :, 0, :, 2].max() == 0.0  # y-aff first row invalid
    assert lbl2[0, 0, :, :, 3].max() == 0.0  # z-aff first slice invalid
    # banis (source-storage) group: invalid border at the HIGH end instead
    bgroups = [dict(groups[0], mode="banis")]
    _i, lbl3, _p = apply_affinity_visualization_mask(lbl, None, bgroups, crop=False)
    assert lbl3[0, :, :, -1, 1].max() == 0.0 and lbl3[0, :, :, 0, 1].min() == 1.0
    # banis groups don't trigger the deepem crop
    _i, lbl4, _p = apply_affinity_visualization_mask(lbl, None, bgroups, crop=True)
    assert lbl4.shape == lbl.shape


def test_visualizer_channel_and_slice_selection():
    from pytorch_connectomics_tpu.training.visualizer import (
        select_channels,
        select_slices,
        slice_grid,
    )

    assert select_channels(10, "selected", [0, 7]) == [0, 7]
    assert select_channels(10, "all", None, max_channels=4) == [0, 1, 2, 3]
    np.testing.assert_array_equal(select_slices(8, 3, "consecutive"), [2, 3, 4])
    assert len(select_slices(8, 3, "uniform")) == 3
    batch = {
        "image": np.random.rand(1, 8, 16, 16, 1).astype(np.float32),
        "label": np.random.rand(1, 8, 16, 16, 5).astype(np.float32),
    }
    g_all = slice_grid(batch, None, channel_mode="all")
    g_sel = slice_grid(batch, None, channel_mode="selected", selected_channels=[1])
    assert g_sel.shape[1] < g_all.shape[1]


def test_visualizer_data_check(tmp_path):
    from pytorch_connectomics_tpu.training.visualizer import data_check_grids

    batch = {
        "image": np.random.rand(2, 8, 16, 16, 1).astype(np.float32),
        "label": np.random.rand(2, 8, 16, 16, 2).astype(np.float32),
    }
    grids = data_check_grids(batch)
    assert set(grids) == {
        "data_check/input",
        "data_check/label_channel_0",
        "data_check/label_channel_1",
    }
    assert all(g.dtype == np.uint8 for g in grids.values())


def test_instance_volume_properties(gen):
    jax, *_ = gen
    from pytorch_connectomics_tpu.data.synthetic_jax import synthetic_instance_volume

    img, lbl = synthetic_instance_volume(jax.random.PRNGKey(0), (16, 48, 48), n_cells=12)
    img, lbl = np.asarray(img), np.asarray(lbl)
    assert img.shape == lbl.shape == (16, 48, 48)
    assert 0.0 <= img.min() and img.max() <= 1.0
    ids = np.unique(lbl)
    # space-filling cells: many instances, every voxel labeled >= 1
    assert lbl.min() >= 1 and len(ids) >= 6
    # determinism
    img2, lbl2 = synthetic_instance_volume(jax.random.PRNGKey(0), (16, 48, 48), n_cells=12)
    np.testing.assert_array_equal(lbl, np.asarray(lbl2))
    # membranes are dark relative to cytoplasm: boundary voxels darker on average
    bnd = np.zeros_like(lbl, bool)
    for ax in range(3):
        d = lbl != np.roll(lbl, 1, axis=ax)
        sl = [slice(None)] * 3
        sl[ax] = 0
        d[tuple(sl)] = False
        bnd |= d | np.roll(d, -1, axis=ax)
    assert img[bnd].mean() < img[~bnd].mean() - 0.1


def test_affinity_targets_match_seg_to_affinity(gen):
    """The on-device affinity generator must agree bit-for-bit with the host
    target engine (deepem high-end convention, x/y/z channel order)."""
    jax, *_ = gen
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.data.synthetic_jax import affinity_targets
    from pytorch_connectomics_tpu.data.targets.affinity import seg_to_affinity

    rng = np.random.RandomState(0)
    seg = rng.randint(0, 5, size=(7, 9, 11)).astype(np.int32)
    dev = np.asarray(affinity_targets(jnp.asarray(seg)))  # (Z,Y,X,3)
    host = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])  # (3,Z,Y,X)
    np.testing.assert_array_equal(dev, np.moveaxis(host, 0, -1))


def test_affinity_targets_batched(gen):
    jax, *_ = gen
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.data.synthetic_jax import affinity_targets

    seg = np.random.RandomState(1).randint(0, 4, size=(2, 5, 6, 7)).astype(np.int32)
    out = np.asarray(affinity_targets(jnp.asarray(seg)))
    assert out.shape == (2, 5, 6, 7, 3)
    from pytorch_connectomics_tpu.data.targets.affinity import seg_to_affinity

    for b in range(2):
        host = seg_to_affinity(seg[b], ["0-0-1", "0-1-0", "1-0-0"])
        np.testing.assert_array_equal(out[b], np.moveaxis(host, 0, -1))


def test_affinity_flip_align_recovers_canonical(gen):
    """Predict-on-flipped + naive flip-back + affinity_flip_align must equal
    the direct affinity target in the interior (TTA voxel alignment)."""
    jax, *_ = gen
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.data.synthetic_jax import affinity_targets
    from pytorch_connectomics_tpu.inference.tta import affinity_flip_align

    offsets = [(0, 0, 1), (0, 1, 0), (1, 0, 0)]
    seg = np.random.RandomState(2).randint(0, 6, size=(8, 10, 12)).astype(np.int32)
    ref = np.asarray(affinity_targets(jnp.asarray(seg)))
    for axes in [(0,), (1,), (2,), (0, 2), (0, 1, 2)]:
        flipped = np.flip(seg, axis=axes)
        aff_f = np.asarray(affinity_targets(jnp.asarray(flipped.copy())))
        naive = np.flip(aff_f, axis=axes)  # what image-channel TTA would do
        aligned = np.asarray(
            affinity_flip_align(jnp.asarray(naive.copy()), axes, offsets)
        )
        # interior: drop the first+last plane of every flipped axis (zero-fill
        # and flipped-space border planes differ there by construction)
        sl = [slice(None)] * 3
        for a in axes:
            sl[a] = slice(1, seg.shape[a] - 1)
        np.testing.assert_array_equal(aligned[tuple(sl)], ref[tuple(sl)])
        # and the naive flip-back is genuinely wrong without the shift
        assert not np.array_equal(naive[tuple(sl)], ref[tuple(sl)])


def test_affinity_targets_long_range_offsets(gen):
    jax, *_ = gen
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.data.synthetic_jax import affinity_targets
    from pytorch_connectomics_tpu.data.targets.affinity import seg_to_affinity

    offs = ((0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 0, 4), (0, 4, 0), (2, 0, 0))
    seg = np.random.RandomState(3).randint(0, 5, size=(6, 9, 10)).astype(np.int32)
    dev = np.asarray(affinity_targets(jnp.asarray(seg), offs))
    host = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0", "0-0-4", "0-4-0", "2-0-0"])
    np.testing.assert_array_equal(dev, np.moveaxis(host, 0, -1))


def test_blob_instance_volume_and_bc_targets(gen):
    """Blob task invariants: sparse fg, analytic distance matches labels,
    bc targets match host-derivable definitions."""
    jax, *_ = gen
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.data.synthetic_jax import (
        bc_targets,
        synthetic_blob_instance_volume,
    )

    img, lbl, dist = synthetic_blob_instance_volume(
        jax.random.PRNGKey(1), (16, 40, 40), n_blobs=8
    )
    img, lbl, dist = map(np.asarray, (img, lbl, dist))
    assert img.shape == lbl.shape == dist.shape == (16, 40, 40)
    fg = lbl > 0
    assert 0.1 < fg.mean() < 0.8  # sparse instances over background
    assert len(np.unique(lbl)) - 1 >= 4
    # analytic distance: positive exactly on foreground, peaks inside
    np.testing.assert_array_equal(dist > 0, fg)
    assert dist.max() > 0.5
    bc = np.asarray(bc_targets(jnp.asarray(lbl)))
    assert bc.shape == (16, 40, 40, 2)
    np.testing.assert_array_equal(bc[..., 0], fg.astype(np.float32))
    # contour: fg voxels adjacent (6-conn) to a different label (incl. bg)
    expect = np.zeros_like(fg)
    for ax in range(3):
        d = lbl != np.roll(lbl, 1, axis=ax)
        sl = [slice(None)] * 3
        sl[ax] = 0
        d[tuple(sl)] = False
        expect |= d | np.roll(d, -1, axis=ax)
    expect &= fg
    np.testing.assert_array_equal(bc[..., 1].astype(bool), expect)
    # distance is low on the contour shell, higher in cores
    assert dist[expect].mean() < dist[fg & ~expect].mean()
