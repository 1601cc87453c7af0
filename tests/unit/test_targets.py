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


def test_lsd_full_semantics():
    """Pearson off-diagonals 0.5-centered, variance sigma^2-normalized,
    mean offsets 0.5-centered, size = fill fraction (reference lsd.py:296)."""
    from pytorch_connectomics_tpu.data.targets.lsd import seg_to_lsd

    seg = np.zeros((16, 16, 16), np.uint32)
    seg[4:12, 4:12, 4:12] = 1  # symmetric cube
    lsd = seg_to_lsd(seg, sigma=(3.0, 3.0, 3.0))
    center = (8, 8, 8)
    # at the cube center: zero mean offset -> 0.5; zero correlation -> 0.5
    for ch in (0, 1, 2, 6, 7, 8):
        assert abs(lsd[ch][center] - 0.5) < 0.1, (ch, lsd[ch][center])
    # fill fraction at the center of an 8-cube with sigma 3: ~0.82^3
    assert 0.4 < lsd[9][center] < 0.7
    # near the +z face the center of mass is at lower z -> offset < 0.5
    assert lsd[0][11, 8, 8] < 0.45
    assert lsd[0][4, 8, 8] > 0.55  # -z face: offset toward +z


def test_lsd_anisotropic_object_correlation():
    """A diagonal plate in yx must produce strong |pearson_yx - 0.5|."""
    from pytorch_connectomics_tpu.data.targets.lsd import seg_to_lsd

    seg = np.zeros((8, 24, 24), np.uint32)
    for i in range(20):
        seg[2:6, i : i + 3, i : i + 3] = 1  # yx-diagonal bar
    lsd = seg_to_lsd(seg, sigma=(4.0, 4.0, 4.0))
    yx = lsd[8][4, 12, 12]  # pearson(y, x) channel at the bar center
    assert yx > 0.8, yx  # strong positive y-x correlation


def test_lsd_components_and_2d():
    from pytorch_connectomics_tpu.data.targets.lsd import seg_to_lsd

    seg = np.zeros((12, 12, 12), np.uint32)
    seg[3:9, 3:9, 3:9] = 2
    sub = seg_to_lsd(seg, sigma=3.0, components="0129")
    assert sub.shape == (4, 12, 12, 12)
    full = seg_to_lsd(seg, sigma=3.0)
    np.testing.assert_allclose(sub[0], full[0])
    np.testing.assert_allclose(sub[3], full[9])
    # 2-D: 6 channels
    seg2 = np.zeros((20, 20), np.uint32)
    seg2[5:15, 5:15] = 1
    lsd2 = seg_to_lsd(seg2, sigma=4.0)
    assert lsd2.shape == (6, 20, 20)
    assert abs(lsd2[4][10, 10] - 0.5) < 0.1  # pearson at center


def test_lsd_downsample_close_to_full():
    from pytorch_connectomics_tpu.data.targets.lsd import seg_to_lsd

    seg = np.zeros((16, 16, 16), np.uint32)
    seg[4:12, 4:12, 4:12] = 1
    full = seg_to_lsd(seg, sigma=4.0)
    ds = seg_to_lsd(seg, sigma=4.0, downsample=2)
    assert ds.shape == full.shape
    inside = seg > 0
    assert np.abs(full[9][inside] - ds[9][inside]).mean() < 0.15


def test_split_masks_and_padding(tmp_path):
    from pytorch_connectomics_tpu.data.split import (
        create_split_masks,
        pad_volume_to_size,
        save_split_masks_h5,
        split_and_pad_volume,
        split_slices,
    )

    tr, va = split_slices((100, 64, 64), train_ratio=0.8)
    assert tr[0] == slice(0, 80) and va[0] == slice(80, 100)
    tr, va = split_slices((100, 64, 64), train_ratio=0.95, min_val_size=30)
    assert va[0] == slice(70, 100)
    tm, vm = create_split_masks((10, 4, 4), 0.7)
    assert tm.sum() == 7 * 16 and vm.sum() == 3 * 16
    assert ((tm + vm) == 1).all()
    v = np.random.rand(18, 40, 40).astype(np.float32)
    p = pad_volume_to_size(v, (32, 40, 48))
    assert p.shape == (32, 40, 48)
    np.testing.assert_array_equal(p[7:25, :, 4:44], v)
    tr_v, va_v = split_and_pad_volume(v, 0.8, target_size=(8, 40, 40))
    assert tr_v.shape[0] == 14 and va_v.shape == (8, 40, 40)
    f1, f2 = save_split_masks_h5(tmp_path, (10, 4, 4))
    import h5py

    with h5py.File(f1) as f:
        assert f["main"][:].sum() == 8 * 16


def test_target_context_crops_back(tmp_path):
    """target_context: long-range affinity edges at the patch border see
    real context; the pipeline crops back to the configured patch size."""
    import h5py

    from pytorch_connectomics_tpu.config.schema import Config, build_dataclass
    from pytorch_connectomics_tpu.data.pipeline import build_pipelines

    rng = np.random.default_rng(0)
    img = rng.random((32, 48, 48)).astype(np.float32)
    lbl = np.zeros((32, 48, 48), np.uint32)
    lbl[4:28, 8:40, 8:40] = 1
    with h5py.File(tmp_path / "im.h5", "w") as f:
        f["main"] = img
    with h5py.File(tmp_path / "lb.h5", "w") as f:
        f["main"] = lbl
    cfg = build_dataclass(
        Config,
        {
            "data": {
                "train": {"image": str(tmp_path / "im.h5"), "label": str(tmp_path / "lb.h5")},
                "dataloader": {
                    "batch_size": 2,
                    "patch_size": [8, 16, 16],
                    "target_context": [2, 4, 4],
                },
                "label_transform": {
                    "targets": [
                        {"name": "affinity",
                         "kwargs": {"offsets": ["0-0-1", "0-1-0", "1-0-0", "0-0-4"]}}
                    ]
                },
            },
            "system": {"num_workers": 1, "num_devices": 1},
        },
    )
    train_pipe, _ = build_pipelines(cfg, process_index=0, process_count=1)
    batch = train_pipe.make_batch(0)
    # cropped back to the configured patch despite the context read
    assert batch["image"].shape == (2, 8, 16, 16, 1)
    assert batch["label"].shape == (2, 8, 16, 16, 4)


def test_seg_erosion_instance_window_semantics():
    """Kisuk-window erosion (reference processing/segment.py:25): voxels whose
    window sees two positive ids become background; interior voxels survive;
    negative (ignore) voxels pass through unchanged."""
    from pytorch_connectomics_tpu.data.targets.distance import seg_erosion_instance

    seg = np.zeros((1, 8, 8), np.int32)
    seg[0, :, :4] = 1
    seg[0, :, 4:] = 2          # instances touch at x=3|4
    seg[0, 0, 0] = -1          # ignore voxel
    out = seg_erosion_instance(seg, tsz_h=1)
    assert out[0, 4, 3] == 0 and out[0, 4, 4] == 0  # boundary eroded
    assert out[0, 4, 1] == 1 and out[0, 4, 6] == 2  # interiors survive
    assert out[0, 0, 0] == -1                        # ignore preserved
    # anisotropic: no erosion along axis 0 when its half-size is 0
    out2 = seg_erosion_instance(seg, tsz_h=(0, 0, 1))
    np.testing.assert_array_equal(out2, out)  # same window as scalar h=1 here
    with pytest.raises(ValueError):
        seg_erosion_instance(seg, tsz_h=(1, 1))


def test_decode_quantize_roundtrip():
    from pytorch_connectomics_tpu.data.targets.misc import decode_quantize

    levels = 8
    # one-hot class scores at level k decode (max mode) to k/levels
    scores = np.zeros((levels, 2, 2, 2), np.float32)
    scores[5] = 10.0
    out = decode_quantize(scores, mode="max")
    np.testing.assert_allclose(out, 5 / 8)
    # mean mode: hard one-hot softmax ~= that level's center
    out_mean = decode_quantize(scores * 10, mode="mean")
    centers = np.linspace(-1 / 8, 1 - 1 / 8, 8)
    np.testing.assert_allclose(out_mean, centers[5], atol=1e-5)
    with pytest.raises(ValueError):
        decode_quantize(scores, mode="median")


def test_energy_quantize_reference_bins():
    """Reference quantize.py:12 layout: class 0 = negative energy, classes
    1..levels over [0,1], 1.0 in the top bin; decode_quantize mean centers
    (-1/lv ... 1-1/lv over levels+1 classes) line up with this layout."""
    from pytorch_connectomics_tpu.data.targets.misc import (
        decode_quantize,
        energy_quantize,
    )

    e = np.array([-1.0, -0.2, 0.0, 0.05, 0.55, 0.95, 1.0], np.float32)
    q = energy_quantize(e, levels=10)
    assert q.dtype == np.int64
    np.testing.assert_array_equal(q, [0, 0, 1, 1, 6, 10, 10])
    # hard one-hot decode at the negative class gives the negative center
    scores = np.zeros((11, 1), np.float32)
    scores[0] = 100.0
    np.testing.assert_allclose(
        decode_quantize(scores, mode="mean", levels=10), -1.0 / 10, atol=1e-6
    )


def test_seg_to_iou_best_match_rows():
    from pytorch_connectomics_tpu.data.bbox import seg_to_iou, segs_to_iou

    s0 = np.array([[1, 1, 1, 2, 2, 0]], np.int32)
    s1 = np.array([[5, 5, 9, 9, 9, 9]], np.int32)
    rows = seg_to_iou(s0, s1)
    by_id = {int(r[0]): r for r in rows}
    assert tuple(by_id[1]) == (1, 5, 3, 2, 2)   # id1 best-matches 5 (ov 2)
    assert tuple(by_id[2]) == (2, 9, 2, 4, 2)   # id2 best-matches 9
    # thresholded mode filters rows, keeping the 5-column schema
    # (reference iou.py:120); IoUs here: 2/3 and 2/4
    pairs = seg_to_iou(s0, s1, th_iou=0.45)
    assert (pairs == [[1, 5, 3, 2, 2], [2, 9, 2, 4, 2]]).all()
    assert seg_to_iou(s0, s1, th_iou=0.6).tolist() == [[1, 5, 3, 2, 2]]
    # tracker form: one result per consecutive boundary
    stack = [s0, s1, s1]
    res = segs_to_iou(lambda i: stack[i], [0, 1, 2])
    assert len(res) == 2 and tuple(res[1][1]) == (9, 9, 4, 4, 4)


def test_build_target_mask_fn_minus1_semantics():
    """-1-aware per-channel validity over the full target layout (reference
    ``affinity.py:419-456`` edge mask + ``transforms.py:736`` per-task
    masks): affinity channels need BOTH endpoints labeled; every other
    channel needs the voxel itself labeled."""
    from pytorch_connectomics_tpu.data.targets import build_target_mask_fn

    cfg = build_dataclass(
        LabelTransformConfig,
        {"targets": [{"name": "binary"}, {"name": "affinity"}]},
    )
    fn = build_target_mask_fn(cfg)
    seg = np.zeros((4, 8, 8), np.int32)
    seg[:, :4, :] = 1
    seg[:, :, 6:] = -1  # unlabeled slab at high x
    m = fn(seg)
    assert m.shape == (4, 4, 8, 8) and m.dtype == np.float32
    # binary channel: exactly the labeled voxels
    np.testing.assert_array_equal(m[0], (seg != -1).astype(np.float32))
    # x-affinity (offset (0,0,1), deepem high-end storage at x): the edge
    # INTO the unlabeled slab (stored at x=6) and inside it are invalid;
    # the border column x=0 is invalid too (no neighbor)
    assert m[1][:, :, 0].max() == 0.0
    assert m[1][:, :, 6:].max() == 0.0
    assert m[1][:, :, 1:6].min() == 1.0
    # z-affinity: valid from z=1 outside the slab
    assert m[3][0].max() == 0.0 and m[3][1:, :, :6].min() == 1.0
    # fully-labeled seg -> all-ones except structural borders
    m2 = fn(np.abs(seg))
    assert m2[0].min() == 1.0 and m2[1][:, :, 1:].min() == 1.0


def test_pipeline_emits_target_mask_only_for_unlabeled_datasets(tmp_path):
    """Datasets carrying -1 voxels emit a per-channel batch mask (folded
    into the loss); fully-labeled datasets emit nothing (no extra traffic,
    identical batch keys to before)."""
    import h5py

    from pytorch_connectomics_tpu.data.datasets import VolumeDataset
    from pytorch_connectomics_tpu.data.pipeline import PatchPipeline

    rng = np.random.default_rng(0)
    img = rng.random((6, 10, 10)).astype(np.float32)
    lbl = np.ones((6, 10, 10), np.int32)
    lbl[:, :, 7:] = -1
    for name, arr in [("im.h5", img), ("lb.h5", lbl), ("lb_ok.h5", np.abs(lbl))]:
        with h5py.File(tmp_path / name, "w") as f:
            f["main"] = arr
    tcfg = build_dataclass(
        LabelTransformConfig,
        {"targets": [{"name": "binary"}, {"name": "affinity"}]},
    )
    ds = VolumeDataset(str(tmp_path / "im.h5"), str(tmp_path / "lb.h5"),
                       patch_size=(6, 10, 10))
    assert ds.has_unlabeled
    pipe = PatchPipeline(ds, 1, target_cfg=tcfg, train=False)
    batch = pipe.make_batch(0)
    assert "mask" in batch and batch["mask"].shape == (1, 6, 10, 10, 4)
    # binary channel of the mask mirrors labeledness; label itself is the
    # 4-channel target stack
    np.testing.assert_array_equal(
        batch["mask"][0, ..., 0], (lbl != -1).astype(np.float32)
    )
    assert batch["label"].shape[-1] == 4
    # x-affinity mask column entering the unlabeled slab is zero
    assert batch["mask"][0, :, :, 7:, 1].max() == 0.0
    ds_ok = VolumeDataset(str(tmp_path / "im.h5"), str(tmp_path / "lb_ok.h5"),
                          patch_size=(6, 10, 10))
    assert not ds_ok.has_unlabeled
    batch2 = PatchPipeline(ds_ok, 1, target_cfg=tcfg, train=False).make_batch(0)
    assert "mask" not in batch2


def test_pipeline_target_mask_covers_label_aux_channels(tmp_path):
    """label_aux channels concatenate onto the label AFTER the -1-validity
    mask is built; the mask must be padded so its channel layout tracks the
    FINAL label layout (advisor round-4 finding: loss terms slicing into the
    aux span otherwise got a silently-clamped, misaligned mask)."""
    import h5py

    from pytorch_connectomics_tpu.data.datasets import VolumeDataset
    from pytorch_connectomics_tpu.data.pipeline import PatchPipeline

    rng = np.random.default_rng(0)
    img = rng.random((6, 10, 10)).astype(np.float32)
    lbl = np.ones((6, 10, 10), np.int32)
    lbl[:, :, 7:] = -1
    aux = rng.random((6, 10, 10)).astype(np.float32)
    for name, arr in [("im.h5", img), ("lb.h5", lbl), ("aux.h5", aux)]:
        with h5py.File(tmp_path / name, "w") as f:
            f["main"] = arr
    tcfg = build_dataclass(
        LabelTransformConfig,
        {"targets": [{"name": "binary"}, {"name": "affinity"}]},
    )
    ds = VolumeDataset(
        str(tmp_path / "im.h5"), str(tmp_path / "lb.h5"),
        label_aux=str(tmp_path / "aux.h5"), patch_size=(6, 10, 10),
    )
    batch = PatchPipeline(ds, 1, target_cfg=tcfg, train=False).make_batch(0)
    # label = 4 target channels + 1 aux channel; mask tracks all 5
    assert batch["label"].shape[-1] == 5
    assert batch["mask"].shape == (1, 6, 10, 10, 5)
    # aux channel's mask is the labeled-voxel mask (aux targets are
    # label-derived, so unlabeled voxels are invalid there too)
    np.testing.assert_array_equal(
        batch["mask"][0, ..., 4], (lbl != -1).astype(np.float32)
    )
