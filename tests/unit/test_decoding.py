"""Decoding + instance metrics tests against constructed fixtures."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.config.schema import DecodingConfig, build_dataclass
from pytorch_connectomics_tpu.data.targets import seg_to_affinity
from pytorch_connectomics_tpu.decoding import (
    run_decoding_stage,
    run_steps,
    streamed_affinity_cc_decode,
)
from pytorch_connectomics_tpu.decoding.decoders import (
    decode_affinity_cc,
    decode_bcd_watershed,
    decode_binary_cc,
    decode_waterz,
)
from pytorch_connectomics_tpu.metrics import (
    adapted_rand,
    average_precision,
    compute_nerl,
    instance_matching,
    voi,
)


def two_blob_gt(shape=(8, 24, 24)):
    gt = np.zeros(shape, np.uint32)
    gt[2:6, 2:10, 2:10] = 1
    gt[2:6, 14:22, 14:22] = 2
    return gt


def gt_affinities(gt):
    return seg_to_affinity(gt, ["0-0-1", "0-1-0", "1-0-0"])


def test_binary_cc_decode():
    gt = two_blob_gt()
    pred = (gt > 0).astype(np.float32)[None]
    seg = decode_binary_cc(pred, threshold=0.5)
    assert len(np.unique(seg)) == 3  # bg + 2


def test_affinity_cc_perfect_decode():
    gt = two_blob_gt()
    seg = decode_affinity_cc(gt_affinities(gt), threshold=0.5)
    assert adapted_rand(seg, gt) < 1e-6


def test_waterz_perfect_decode():
    gt = two_blob_gt()
    seg = decode_waterz(gt_affinities(gt), threshold=0.3, fragments="watershed")
    # both instances recovered separately
    m = instance_matching(seg, gt, iou_threshold=0.5)
    assert m["f1"] == pytest.approx(1.0)


def test_bcd_watershed_decode():
    from pytorch_connectomics_tpu.data.targets import (
        instance_boundary_mask,
        instance_edt,
        seg_to_binary,
    )

    gt = two_blob_gt()
    pred = np.stack([
        seg_to_binary(gt),
        instance_boundary_mask(gt).astype(np.float32),
        instance_edt(gt),
    ])
    seg = decode_bcd_watershed(pred, binary_threshold=0.8, boundary_threshold=0.8, seed_threshold=0.3)
    m = instance_matching(seg, gt, iou_threshold=0.5)
    assert m["f1"] == pytest.approx(1.0)


def test_decoding_stage_with_steps_config():
    gt = two_blob_gt()
    cfg = build_dataclass(
        DecodingConfig,
        {
            "enabled": True,
            "steps": [{"name": "affinity_cc", "kwargs": {"threshold": 0.5}}],
            "postprocessing": {"min_instance_size": 10},
        },
    )
    seg = run_decoding_stage(gt_affinities(gt), cfg)
    assert adapted_rand(seg, gt) < 1e-6


def test_decoding_stage_channel_last_input():
    gt = two_blob_gt()
    aff_cl = np.moveaxis(gt_affinities(gt), 0, -1)  # (Z,Y,X,C) as inference emits
    cfg = build_dataclass(
        DecodingConfig,
        {"enabled": True, "steps": [{"name": "affinity_cc", "kwargs": {"threshold": 0.5}}]},
    )
    seg = run_decoding_stage(aff_cl, cfg)
    assert adapted_rand(seg, gt) < 1e-6


def test_streamed_chunked_decode_matches_whole():
    gt = two_blob_gt((8, 24, 24))
    aff = gt_affinities(gt)

    def reader(slices):
        return aff[(slice(None),) + tuple(slices)]

    whole = decode_affinity_cc(aff, 0.5)
    stitched = streamed_affinity_cc_decode(reader, gt.shape, (8, 12, 12), threshold=0.5)
    # same partition
    assert adapted_rand(stitched, whole) < 1e-6


def test_streamed_chunked_decode_random_affinities_all_axes():
    """Seams along every axis with ASYMMETRIC random affinities: catches
    seam-channel mix-ups that GT-derived (channel-symmetric) affinities
    mask. Exact partition match vs the whole-volume decode."""
    rng = np.random.default_rng(7)
    shape = (12, 12, 12)
    # quantized so threshold comparisons are unambiguous across code paths
    aff = (rng.integers(0, 9, (3,) + shape) / 8.0).astype(np.float32)

    def reader(slices):
        return aff[(slice(None),) + tuple(slices)]

    whole = decode_affinity_cc(aff, 0.5)
    stitched = streamed_affinity_cc_decode(reader, shape, (6, 6, 6), threshold=0.5)
    assert adapted_rand(stitched, whole) < 1e-9


def test_streamed_waterz_matches_whole_volume_exactly():
    """Chunk-parallel waterz (CC fragments -> per-chunk RAG -> RAG-level
    agglomeration) must be BIT-EQUAL to the whole-volume decode_waterz for
    exactly-representable affinities: same fragments, same edge statistics,
    same merge sequence, same first-occurrence label order."""
    from pytorch_connectomics_tpu.decoding.decoders import decode_waterz
    from pytorch_connectomics_tpu.decoding.streamed import streamed_waterz_decode

    rng = np.random.default_rng(11)
    shape = (16, 16, 16)
    # dyadic quantization (k/256): double-precision RAG sums are exact, so
    # summation order cannot perturb means and parity is bit-exact
    aff = (rng.integers(0, 257, (3,) + shape) / 256.0).astype(np.float32)

    def reader(slices):
        return aff[(slice(None),) + tuple(slices)]

    for thr in (0.3, 0.5, 0.7):
        whole = decode_waterz(aff, threshold=thr, fragments="cc", fragment_threshold=0.9)
        chunked = streamed_waterz_decode(
            reader, shape, (8, 8, 8), threshold=thr, fragment_threshold=0.9,
        )
        assert np.array_equal(whole, chunked), f"mismatch at threshold {thr}"


def test_streamed_decoding_stage_config_path():
    """decoding.streamed=true routes through the chunked engines and matches
    the in-memory stage exactly; unsupported recipes raise."""
    from pytorch_connectomics_tpu.decoding.stage import (
        run_decoding_stage,
        run_streamed_decoding_stage,
    )

    rng = np.random.default_rng(9)
    shape = (8, 16, 16)
    aff = (rng.integers(0, 257, (3,) + shape) / 256.0).astype(np.float32)

    def reader(slices):
        return aff[(slice(None),) + tuple(slices)]

    for steps in (
        [{"name": "affinity_cc", "kwargs": {"threshold": 0.75}}],
        [{"name": "waterz", "kwargs": {"threshold": 0.4, "fragments": "cc",
                                       "fragment_threshold": 0.9}}],
    ):
        cfg = build_dataclass(
            DecodingConfig,
            {"enabled": True, "streamed": True, "streamed_chunk": [8, 8, 8],
             "steps": steps},
        )
        whole = run_decoding_stage(aff, cfg)
        chunked = run_streamed_decoding_stage(reader, shape, cfg)
        assert np.array_equal(whole, chunked), steps[0]["name"]

    bad = build_dataclass(
        DecodingConfig,
        {"enabled": True, "streamed": True,
         "steps": [{"name": "mutex_watershed", "kwargs": {}}]},
    )
    with pytest.raises(ValueError, match="streamed"):
        run_streamed_decoding_stage(reader, shape, bad)


def test_streamed_waterz_min_size_and_writer():
    from pytorch_connectomics_tpu.decoding.streamed import streamed_waterz_decode

    rng = np.random.default_rng(3)
    shape = (8, 12, 12)
    aff = (rng.integers(0, 257, (3,) + shape) / 256.0).astype(np.float32)

    def reader(slices):
        return aff[(slice(None),) + tuple(slices)]

    sink = np.zeros(shape, np.uint32)

    class W:
        def __setitem__(self, sl, v):
            sink[sl] = v

    seg = streamed_waterz_decode(
        reader, shape, (8, 6, 6), threshold=0.5, min_size=4, writer=W(),
    )
    assert np.array_equal(sink, seg)
    ids, counts = np.unique(seg[seg > 0], return_counts=True)
    assert (counts >= 4).all()


def test_adapted_rand_properties():
    gt = two_blob_gt()
    assert adapted_rand(gt, gt) == pytest.approx(0.0, abs=1e-9)
    merged = (gt > 0).astype(np.uint32)  # everything one instance
    assert adapted_rand(merged, gt) > 0.2
    # random labels are very bad
    rng = np.random.default_rng(0)
    rand = rng.integers(1, 50, gt.shape).astype(np.uint32)
    assert adapted_rand(rand, gt) > adapted_rand(merged, gt) * 0.5


def test_voi_split_merge_direction():
    gt = two_blob_gt()
    merged = (gt > 0).astype(np.uint32)
    vs, vm = voi(merged, gt)
    assert vm > 0.5 and vs == pytest.approx(0.0, abs=1e-9)
    # over-segmentation: split each gt instance in two along z
    split = gt.copy()
    split[4:][split[4:] > 0] += 10
    vs2, vm2 = voi(split, gt)
    assert vs2 > 0.5 and vm2 == pytest.approx(0.0, abs=1e-9)


def test_instance_matching_counts():
    gt = two_blob_gt()
    m = instance_matching(gt, gt)
    assert m["tp"] == 2 and m["fp"] == 0 and m["fn"] == 0
    assert m["f1"] == 1.0 and m["mean_matched_iou"] == pytest.approx(1.0)
    missing = gt.copy()
    missing[missing == 2] = 0
    m2 = instance_matching(missing, gt)
    assert m2["tp"] == 1 and m2["fn"] == 1


def test_average_precision_perfect():
    gt = two_blob_gt()
    assert average_precision(gt, gt) == pytest.approx(1.0)


def test_nerl_perfect_vs_split():
    # a long tube along x
    gt = np.zeros((4, 8, 64), np.uint32)
    gt[1:3, 2:6, 4:60] = 1
    perfect = compute_nerl(gt, gt)
    assert perfect["nerl"] == pytest.approx(1.0, abs=0.05)
    # split in the middle -> NERL drops roughly to half
    split = gt.copy()
    split[..., 32:][split[..., 32:] > 0] = 2
    halved = compute_nerl(split, gt)
    assert 0.2 < halved["nerl"] < 0.75


def test_postprocess_split_disconnected():
    """postprocessing.split_disconnected relabels per-id connected
    components separately (cc3d relabel parity)."""
    import numpy as np

    from pytorch_connectomics_tpu.config.schema import (
        DecodingPostprocessConfig,
        build_dataclass,
    )
    from pytorch_connectomics_tpu.decoding.postprocess import apply_postprocessing

    lab = np.zeros((4, 8, 16), np.uint32)
    lab[:, 2:6, 2:6] = 5   # two disjoint blobs share id 5
    lab[:, 2:6, 10:14] = 5
    cfg = build_dataclass(
        DecodingPostprocessConfig, {"split_disconnected": True, "connectivity": 6}
    )
    out = apply_postprocessing(lab, cfg)
    ids = set(np.unique(out)) - {0}
    assert len(ids) == 2
    # without the flag the merged id survives
    cfg_off = build_dataclass(DecodingPostprocessConfig, {})
    out_off = apply_postprocessing(lab, cfg_off)
    assert len(set(np.unique(out_off)) - {0}) == 1


def test_grow_labels_bounded():
    """Bounded geodesic growth: labels expand <= max_steps rings into
    foreground, never across background walls or other labels."""
    import numpy as np

    from pytorch_connectomics_tpu.decoding.decoders import grow_labels_bounded

    lab = np.zeros((1, 5, 21), np.uint32)
    lab[0, 2, 2] = 1
    lab[0, 2, 18] = 2
    fg = np.ones_like(lab, bool)
    fg[0, :, 10] = False  # wall between the two seeds

    out1 = grow_labels_bounded(lab, fg, max_steps=3)
    assert out1[0, 2, 5] == 1  # 3 steps away
    assert out1[0, 2, 6] == 0  # 4 steps away: beyond the bound
    out_many = grow_labels_bounded(lab, fg, max_steps=50)
    # growth halts at the wall; the two labels never mix
    assert out_many[0, 2, 10] == 0
    assert (out_many[0, :, :10][fg[0, :, :10]] == 1).all()
    assert (out_many[0, :, 11:][fg[0, :, 11:]] == 2).all()


def test_grow_bounded_registered_with_prediction_gate():
    import numpy as np

    from pytorch_connectomics_tpu.decoding.registry import get_decoder

    lab = np.zeros((1, 4, 8), np.uint32)
    lab[0, 1, 1] = 7
    pred = np.zeros((3, 1, 4, 8), np.float32)
    pred[:, 0, 1, :4] = 0.9  # fg only on the left strip
    out = get_decoder("grow_bounded")(lab, prediction=pred, threshold=0.5, max_steps=8)
    assert out[0, 1, 3] == 7  # grew within fg
    assert out[0, 1, 6] == 0  # outside fg: untouched


def test_shape_smooth_bbox_sparse_ids_and_vanishing():
    """shape_smooth: bbox-cropped per-instance opening preserves sparse
    ids, keeps instances the opening would erase, removes thin filaments."""
    import numpy as np

    from pytorch_connectomics_tpu.decoding.decoders import decode_shape_smooth

    lab = np.zeros((6, 20, 20), np.uint32)
    lab[1:5, 2:10, 2:10] = 1000003  # sparse id
    lab[2, 15, 15] = 777777  # single voxel
    lab[2, 10:16, 5] = 1000003  # thin filament off the block
    out = decode_shape_smooth(lab, iterations=1)
    assert set(np.unique(out)) == {0, 1000003, 777777}
    assert out[2, 15, 15] == 777777  # keep_vanishing
    assert out[2, 13, 5] == 0  # filament opened away
    assert out[3, 5, 5] == 1000003


def test_combine_split_coarsest_common_refinement():
    """Reference decoders/combine.py:27 semantics: nonzero only where both
    labelings are nonzero; each distinct (a, b) pair is one output id."""
    from pytorch_connectomics_tpu.decoding.registry import _GRAPH_OPS

    a = np.array([[0, 1, 1, 2, 2]], np.uint32)
    b = np.array([[5, 5, 7, 7, 0]], np.uint32)
    out = _GRAPH_OPS["combine_split"](a, b)
    assert out.dtype == np.uint32
    assert out[0, 0] == 0 and out[0, 4] == 0  # background where either is 0
    # pairs (1,5), (1,7), (2,7) -> three distinct nonzero ids
    assert len({int(v) for v in out[0, 1:4]}) == 3
    assert (out[0, 1:4] > 0).all()


def test_channel_gate_multiplies_signal_by_gate():
    from pytorch_connectomics_tpu.decoding.registry import get_decoder

    pred = np.stack([
        np.full((2, 2, 2), 0.5, np.float32),
        np.full((2, 2, 2), 0.25, np.float32),
        np.full((2, 2, 2), 0.8, np.float32),
    ])
    out = get_decoder("channel_gate")(pred, signal_channels=[0, 1], gate_channel=2)
    assert out.shape == (2, 2, 2, 2)
    np.testing.assert_allclose(out[0], 0.4)
    np.testing.assert_allclose(out[1], 0.2)
    # slice-string spec resolves through parse_slice
    out2 = get_decoder("channel_gate")(pred, signal_channels="0:2", gate_channel=2)
    np.testing.assert_allclose(out, out2)
    with pytest.raises(ValueError):
        get_decoder("channel_gate")(pred, signal_channels=0, gate_channel="0:2")


def test_naive_waterz_merges_objects_across_chunk_seam():
    """A blob spanning the chunk seam must come out as ONE id; two separate
    blobs must stay distinct (reference decoders/waterz.py:354 recipe)."""
    from pytorch_connectomics_tpu.decoding.registry import get_decoder

    z, y, x = 16, 24, 24
    aff = np.zeros((3, z, y, x), np.float32)
    # blob A spans the seam (z 2..13), blob B lives entirely below it
    inside_a = np.zeros((z, y, x), bool)
    inside_a[2:14, 4:10, 4:10] = True
    inside_b = np.zeros((z, y, x), bool)
    inside_b[2:6, 16:22, 16:22] = True
    for inside in (inside_a, inside_b):
        # high-end convention: edge (v - offset, v) stored at v
        aff[0][inside & np.roll(inside, 1, 2)] = 0.9
        aff[1][inside & np.roll(inside, 1, 1)] = 0.9
        aff[2][inside & np.roll(inside, 1, 0)] = 0.9
    seg = get_decoder("naive_waterz")(
        aff, chunk_depth=8, dust_remove_size=0, one_sided_min_size=20,
    )
    assert seg.shape == (z, y, x)
    ids_a_lo = set(np.unique(seg[2:8, 5:9, 5:9])) - {0}
    ids_a_hi = set(np.unique(seg[8:13, 5:9, 5:9])) - {0}
    assert ids_a_lo and ids_a_lo == ids_a_hi, "blob A split at the seam"
    ids_b = set(np.unique(seg[3:5, 17:21, 17:21])) - {0}
    assert ids_b and not (ids_b & ids_a_lo), "blobs A and B merged"


class TestPostprocessSurface:
    """Reference postprocess.py / utils.py behavior coverage."""

    def test_cast2dtype_picks_smallest_uint(self):
        from pytorch_connectomics_tpu.decoding import cast2dtype

        assert cast2dtype(np.array([0, 200], np.int64)).dtype == np.uint8
        assert cast2dtype(np.array([0, 70000], np.int64)).dtype == np.uint32
        assert cast2dtype(np.array([0, 300], np.int64)).dtype == np.uint16

    def test_remove_add_merge_masks(self):
        from pytorch_connectomics_tpu.decoding import add_masks, merge_masks, remove_masks

        vol = np.array([[1, 2, 3, 0]], np.uint32)
        assert (remove_masks(vol.copy(), [2]) == [[1, 0, 3, 0]]).all()
        merged = merge_masks(vol.copy(), [[3, 1]])
        assert (merged == [[3, 2, 3, 0]]).all()
        base = np.array([[1, 0, 0, 0]], np.uint32)
        src = np.array([[0, 7, 7, 0]], np.uint32)
        out = add_masks(base.copy(), src, [7])
        assert (out == [[1, 2, 2, 0]]).all()  # fresh id above base max

    def test_remove_large_instances(self):
        from pytorch_connectomics_tpu.decoding import remove_large_instances

        vol = np.zeros((1, 4, 8), np.uint32)
        vol[0, :, :6] = 1   # 24 voxels
        vol[0, 0, 6:] = 2   # 2 voxels
        out = remove_large_instances(vol, max_size=10)
        assert (out[vol == 1] == 0).all() and (out[vol == 2] == 2).all()

    def test_merge_small_objects_into_contact_neighbor(self):
        from pytorch_connectomics_tpu.decoding import merge_small_objects

        seg = np.zeros((1, 6, 12), np.uint32)
        seg[0, :, :6] = 1
        seg[0, 2, 6] = 3          # 1-voxel instance touching instance 1
        out = merge_small_objects(seg.copy(), thres_small=4, do_3d=True)
        assert (out == 3).sum() == 0
        assert out[0, 2, 6] == 1

    def test_merge_small_objects_chained_and_isolated(self):
        from pytorch_connectomics_tpu.decoding import merge_small_objects

        # chained merge: 2 (small) absorbs into 3 (small, processed later);
        # 3's grown extent must then merge as one into 4 (large)
        seg = np.zeros((1, 4, 16), np.uint32)
        seg[0, 1, 2] = 2           # 1 voxel, in-plane neighbor of 3 only
        seg[0, 1, 3:6] = 3         # 3 voxels, touches 2 and 4
        seg[0, :, 6:12] = 4        # 24 voxels, above threshold
        seg[0, 3, 14] = 7          # isolated small: ring all background
        out = merge_small_objects(seg.copy(), thres_small=4, do_3d=True)
        assert (out == 2).sum() == 0 and (out == 3).sum() == 0
        assert out[0, 1, 4] == 4 and out[0, 1, 2] in (0, 4)
        # isolated instance merges into background — reference
        # decoding/utils.py:78 parity
        assert (out == 7).sum() == 0 and out[0, 3, 14] == 0

    def test_binarize_and_median(self):
        from pytorch_connectomics_tpu.decoding import binarize_and_median

        pred = np.zeros((5, 5, 5), np.float32)
        pred[2, 2, 2] = 1.0  # isolated voxel gets median-filtered away
        out = binarize_and_median(pred, size=(3, 3, 3), thres=0.5)
        assert out.sum() == 0 and out.dtype == np.uint8

    def test_watershed_split_creates_new_ids(self):
        from pytorch_connectomics_tpu.decoding import watershed_split

        # dumbbell: two 5^3 cubes joined by a thin 1x1 bridge
        vol = np.zeros((7, 7, 17), np.uint32)
        vol[1:6, 1:6, 1:6] = 1
        vol[1:6, 1:6, 11:16] = 1
        vol[3, 3, 6:11] = 1
        out = watershed_split(vol.copy(), 1, min_distance=2)
        ids = set(np.unique(out)) - {0}
        assert 1 not in ids and len(ids) >= 2  # split into fresh ids > max

    def test_intersection_over_union_matrix(self):
        from pytorch_connectomics_tpu.decoding import intersection_over_union

        a = np.array([[1, 1, 2, 0]], np.uint32)
        b = np.array([[1, 1, 1, 0]], np.uint32)
        iou = intersection_over_union(a, b)
        assert iou.shape == (3, 2)
        np.testing.assert_allclose(iou[1, 1], 2 / 3)
        np.testing.assert_allclose(iou[2, 1], 1 / 3)

    def test_stitch_3d_links_and_forks_fresh_ids(self):
        from pytorch_connectomics_tpu.decoding import stitch_3d

        masks = np.zeros((3, 4, 4), np.int64)
        masks[0, :2, :2] = 1
        masks[1, :2, :2] = 2          # overlaps slice-0 id 1 -> adopts 1
        masks[1, 2:, 2:] = 1          # no overlap below -> fresh id
        masks[2, 2:, 2:] = 5          # overlaps the fresh object -> adopts it
        out = stitch_3d(masks, stitch_threshold=0.25)
        assert out[1, 0, 0] == out[0, 0, 0]
        fresh = out[1, 3, 3]
        assert fresh not in (0, out[0, 0, 0])
        assert out[2, 3, 3] == fresh

    def test_stitch_3d_promotes_small_dtypes(self):
        """Fresh ids past the input dtype max must not wrap (a uint8 2-D CC
        stack with many unmatched objects would alias unrelated instances)."""
        from pytorch_connectomics_tpu.decoding import stitch_3d

        masks = np.zeros((3, 2, 600), np.uint8)
        # slice 0: 200 distinct single-voxel objects (ids 1..200)
        masks[0, 0, :400:2] = np.arange(1, 201, dtype=np.uint8)
        # slices 1-2: objects at non-overlapping positions -> all fresh ids
        masks[1, 1, 1:399:2] = np.arange(1, 200, dtype=np.uint8)
        masks[2, 0, 401:599:2] = np.arange(1, 100, dtype=np.uint8)
        out = stitch_3d(masks, stitch_threshold=0.25)
        assert out.dtype == np.int64
        fg = [out[z][masks[z] > 0] for z in range(3)]
        all_ids = np.concatenate(fg)
        # every object keeps a distinct positive id — nothing wrapped to 0
        # or collided across slices
        assert (all_ids > 0).all()
        assert len(np.unique(all_ids)) == sum(len(np.unique(f)) for f in fg)
        assert out.max() > 255  # fresh ids really exceeded the input dtype

    def test_binary_postprocessing_scalar_median_size(self):
        from pytorch_connectomics_tpu.decoding import apply_binary_postprocessing

        pred = np.zeros((5, 5, 5), np.float32)
        pred[2, 2, 2] = 1.0
        out = apply_binary_postprocessing(pred, {"median_filter_size": 3})
        assert out.sum() == 0  # isolated voxel filtered; scalar size accepted

    def test_apply_binary_postprocessing_pipeline(self):
        from pytorch_connectomics_tpu.decoding import apply_binary_postprocessing

        pred = np.zeros((6, 8, 8), np.float32)
        pred[1:5, 1:5, 1:5] = 0.9     # big blob
        pred[5, 7, 7] = 0.9           # speck
        out = apply_binary_postprocessing(
            pred,
            {"threshold": 0.5,
             "connected_components": {"min_size": 4, "connectivity": 6, "top_k": 1}},
        )
        assert out[2, 2, 2] == 1 and out[5, 7, 7] == 0

    def test_small_instance_neighbor_mode_via_config(self):
        from pytorch_connectomics_tpu.config.schema import (
            DecodingPostprocessConfig, build_dataclass,
        )
        from pytorch_connectomics_tpu.decoding import apply_postprocessing

        seg = np.zeros((1, 6, 12), np.uint32)
        seg[0, :, :6] = 1
        seg[0, 2, 6] = 3
        cfg = build_dataclass(DecodingPostprocessConfig, {
            "min_instance_size": 4, "small_instance_mode": "neighbor"})
        out = apply_postprocessing(seg.copy(), cfg)
        assert out[0, 2, 6] == 1
