"""Inference engine tests: window grid, blending, engine correctness with an
identity model (reference technique: ``tests/benchmarks/..._identity_forward``),
TTA variants, chunked-vs-whole equivalence oracle
(reference ``tests/unit/test_chunked_inference.py:118``)."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.chunked import ResumeManifest, build_chunk_grid
from pytorch_connectomics_tpu.config.schema import ChunkedConfig, TTAConfig, build_dataclass
from pytorch_connectomics_tpu.inference import (
    LazyVolumeAccessor,
    SlidingWindowEngine,
    TTAPredictor,
    apply_channel_activations,
    compute_window_grid,
    ensemble,
    enumerate_tta_variants,
    run_chunked_inference,
)
from pytorch_connectomics_tpu.inference.window import importance_map


def identity_apply(params, windows):
    return windows  # (B,z,y,x,C) -> same


def smooth_apply(params, windows):
    # channel-expanding deterministic function: [x, 1-x]
    import jax.numpy as jnp

    return jnp.concatenate([windows, 1.0 - windows], axis=-1)


def test_window_grid_covers_volume():
    grid = compute_window_grid((10, 20, 20), (4, 8, 8), overlap=0.5)
    assert grid.min() >= 0
    # ensure last window reaches the edge (snap-to-edge)
    assert (grid[:, 0] + 4).max() == 10
    assert (grid[:, 1] + 8).max() == 20


def test_importance_maps():
    for mode in ("constant", "bump", "distance"):
        m = importance_map((4, 8, 8), mode)
        assert m.shape == (4, 8, 8)
        assert m.min() > 0
    bump = importance_map((5, 9, 9), "bump")
    assert bump[2, 4, 4] == bump.max()  # centered peak


def test_identity_engine_reconstructs_volume():
    rng = np.random.default_rng(0)
    vol = rng.random((12, 24, 24), dtype=np.float32)
    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), overlap=0.5, sw_batch_size=2)
    out = eng(None, vol, out_channels=1)
    assert out.shape == (12, 24, 24, 1)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-5)


def test_engine_pads_small_volume():
    vol = np.random.rand(4, 8, 8).astype(np.float32)
    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), sw_batch_size=1)
    out = eng(None, vol, out_channels=1)
    assert out.shape == (4, 8, 8, 1)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-5)


def test_engine_multichannel_output():
    vol = np.random.rand(8, 16, 16).astype(np.float32)
    eng = SlidingWindowEngine(smooth_apply, (8, 16, 16), sw_batch_size=1)
    out = eng(None, vol)
    assert out.shape == (8, 16, 16, 2)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 1 - vol, atol=1e-5)


def test_sharded_engine_matches_single():
    from pytorch_connectomics_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 8})
    vol = np.random.rand(12, 24, 24).astype(np.float32)
    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), overlap=0.5, sw_batch_size=1)
    single = eng(None, vol, out_channels=1)
    sharded = eng.predict_sharded(None, vol, mesh, out_channels=1)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def window_mean_apply(params, windows):
    # placement-sensitive model: every voxel of a window predicts the window
    # mean, so overlapping windows disagree — exposes any batch-padding
    # duplicate leaking into the blend (duplicates add their importance to
    # both value and weight, biasing the weighted mean toward them)
    return windows * 0 + windows.mean(axis=(1, 2, 3, 4), keepdims=True)


def test_batch_padding_does_not_bias_blend():
    vol = np.random.default_rng(1).random((12, 40, 40), dtype=np.float32)
    # overlap 0.25 -> stride (6,12,12): irregular path (8 % 6 != 0)
    kw = dict(window=(8, 16, 16), overlap=0.25)
    grid = compute_window_grid((12, 40, 40), (8, 16, 16), 0.25)
    assert grid.shape[0] % 4 != 0  # sw_batch=4 actually pads
    ref = SlidingWindowEngine(window_mean_apply, sw_batch_size=1, **kw)(
        None, vol, out_channels=1
    )
    padded = SlidingWindowEngine(window_mean_apply, sw_batch_size=4, **kw)(
        None, vol, out_channels=1
    )
    np.testing.assert_allclose(padded, ref, atol=1e-5)


def test_sharded_engine_matches_single_nondivisible_grid():
    from pytorch_connectomics_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 8})
    vol = np.random.default_rng(2).random((12, 40, 40), dtype=np.float32)
    eng = SlidingWindowEngine(
        window_mean_apply, (8, 16, 16), overlap=0.25, sw_batch_size=1
    )
    grid = compute_window_grid((12, 40, 40), (8, 16, 16), 0.25)
    assert grid.shape[0] % 8 != 0  # sharding actually pads the grid
    single = eng(None, vol, out_channels=1)
    sharded = eng.predict_sharded(None, vol, mesh, out_channels=1)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_tta_variant_enumeration():
    vs = enumerate_tta_variants("all", rotation90=False)
    assert len(vs) == 8
    vs2 = enumerate_tta_variants(None)
    assert len(vs2) == 1
    vs3 = enumerate_tta_variants("xy")
    assert len(vs3) == 4


def test_tta_invertibility():
    from pytorch_connectomics_tpu.inference.tta import apply_variant, invert_variant

    vol = np.random.rand(4, 8, 8, 2).astype(np.float32)
    for v in enumerate_tta_variants("all", rotation90=True):
        if v["rot"] and vol.shape[1] != vol.shape[2]:
            continue
        np.testing.assert_allclose(invert_variant(apply_variant(vol, v), v), vol)


def test_tta_rotation_planes_and_dedup():
    from pytorch_connectomics_tpu.inference.tta import apply_variant, invert_variant

    # flips x rot90 in (y,x) generate dihedral-4 x z-flip = 16 distinct
    # permutations; the raw 8x4=32 grid contains each twice (reference
    # tta_combinations.py signature dedup)
    vs = enumerate_tta_variants("all", rotation90=True)
    assert len(vs) == 16
    # explicit k subset, no dedup needed
    vs_k = enumerate_tta_variants(None, rotation_planes=[[1, 2]], rotation_k=[0, 2])
    assert len(vs_k) == 2 and {v["rot"] for v in vs_k} == {0, 2}
    # a (z,y) plane rotates out of the default plane and stays invertible
    vol = np.random.rand(6, 6, 8, 2).astype(np.float32)
    vs_zy = enumerate_tta_variants(None, rotation_planes=[[0, 1]])
    assert len(vs_zy) == 4
    for v in vs_zy:
        np.testing.assert_allclose(invert_variant(apply_variant(vol, v), v), vol)
    with pytest.raises(ValueError):
        enumerate_tta_variants(None, rotation_planes=[[1, 1]])


def test_tta_predictor_identity_consistency():
    """TTA over an equivariant (identity) model must equal the plain pass."""
    vol = np.random.rand(8, 16, 16).astype(np.float32)
    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), sw_batch_size=1)
    tta_cfg = build_dataclass(TTAConfig, {"enabled": True, "flip_axes": "all"})
    pred = TTAPredictor(eng, tta_cfg).predict(None, vol, out_channels=1)
    np.testing.assert_allclose(pred[..., 0], vol, atol=1e-4)


def test_channel_activations():
    x = np.array([[[[[0.0, 0.0]]]]], dtype=np.float32)
    out = apply_channel_activations(x, [{"channels": "0:1", "activation": "sigmoid"},
                                        {"channels": "1:2", "activation": "tanh"}])
    assert out[0, 0, 0, 0, 0] == pytest.approx(0.5)
    assert out[0, 0, 0, 0, 1] == pytest.approx(0.0)


def test_ensemble_per_slice_modes():
    a = np.zeros((2, 2, 2, 3)) + 1
    b = np.zeros((2, 2, 2, 3)) + 3
    out = ensemble([a, b], [["0:1", "min"], ["1:2", "max"], ["2:3", "mean"]])
    assert out[0, 0, 0, 0] == 1 and out[0, 0, 0, 1] == 3 and out[0, 0, 0, 2] == 2


def test_lazy_accessor_padded_reads(tmp_path):
    from pytorch_connectomics_tpu.data.io import save_volume

    vol = (np.random.rand(8, 16, 16) * 255).astype(np.uint8)
    p = str(tmp_path / "v.h5")
    save_volume(p, vol)
    acc = LazyVolumeAccessor(p, pad=(2, 2, 2))
    assert acc.shape == (12, 20, 20)
    win = acc.read((slice(0, 4), slice(0, 4), slice(0, 4)))
    assert win.shape == (4, 4, 4)
    # center region matches normalized source
    np.testing.assert_allclose(win[2:, 2:, 2:], vol[:2, :2, :2] / 255.0, atol=1e-6)


def test_chunk_grid_and_manifest(tmp_path):
    chunks = build_chunk_grid((10, 20, 20), (8, 16, 16), halo=(2, 2, 2))
    assert len(chunks) == 2 * 2 * 2
    c = chunks[0]
    assert c.read_start == (0, 0, 0)
    assert c.read_stop == (10, 18, 18)
    m = ResumeManifest(tmp_path / "m.json", {"cfg": 1})
    m.mark_done(c.key)
    m2 = ResumeManifest(tmp_path / "m.json", {"cfg": 1})
    assert m2.is_done(c.key)
    m3 = ResumeManifest(tmp_path / "m.json", {"cfg": 2})  # signature change
    assert not m3.is_done(c.key)


def test_chunked_matches_whole_volume(tmp_path):
    """Equivalence oracle: chunked+halo result == whole-volume result
    (reference test_chunked_inference.py:118)."""
    from pytorch_connectomics_tpu.data.io import read_volume, save_volume

    rng = np.random.default_rng(1)
    vol = (rng.random((12, 32, 32)) * 255).astype(np.uint8)
    src = str(tmp_path / "src.h5")
    save_volume(src, vol)

    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), overlap=0.5, sw_batch_size=1)
    pred_whole = TTAPredictor(eng).predict(None, vol / 255.0, out_channels=1)

    acc = LazyVolumeAccessor(src)
    out_path = run_chunked_inference(
        TTAPredictor(eng),
        None,
        acc,
        tmp_path / "pred.h5",
        build_dataclass(ChunkedConfig, {"enabled": True, "chunk_size": [8, 16, 16], "halo": [2, 4, 4]}),
        out_channels=1,
    )
    pred_chunked = read_volume(str(out_path))
    assert pred_chunked.shape == (1, 12, 32, 32)
    np.testing.assert_allclose(pred_chunked[0], pred_whole[..., 0], atol=1e-4)


def test_chunked_resume_skips_done(tmp_path):
    from pytorch_connectomics_tpu.data.io import save_volume

    vol = (np.random.rand(8, 16, 16) * 255).astype(np.uint8)
    src = str(tmp_path / "s.h5")
    save_volume(src, vol)
    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), sw_batch_size=1)
    cfg = build_dataclass(ChunkedConfig, {"enabled": True, "chunk_size": [8, 16, 16]})
    pred = TTAPredictor(eng)
    run_chunked_inference(pred, None, LazyVolumeAccessor(src), tmp_path / "o.h5", cfg, out_channels=1)
    manifest = ResumeManifest(tmp_path / "o.h5.manifest.json", {})
    assert len(manifest.completed) == 1


def test_shard_chunk_selection():
    from pytorch_connectomics_tpu.inference import select_chunks_for_shard

    chunks = build_chunk_grid((16, 16, 16), (8, 8, 8))
    s0 = select_chunks_for_shard(chunks, 0, 2)
    s1 = select_chunks_for_shard(chunks, 1, 2)
    assert len(s0) + len(s1) == len(chunks)
    assert {c.key for c in s0} | {c.key for c in s1} == {c.key for c in chunks}


def test_regular_path_matches_scatter_path():
    """The dense parity-group engine and the scatter engine agree."""
    from pytorch_connectomics_tpu.inference.window import compute_window_grid

    rng = np.random.default_rng(3)
    vol = rng.random((12, 24, 24), dtype=np.float32)
    # regular: overlap 0.5 on (8,16,16) -> stride (4,8,8) divides window
    eng = SlidingWindowEngine(smooth_apply, (8, 16, 16), overlap=0.5, sw_batch_size=2)
    regular = eng(None, vol)
    # force scatter path via a stride that does not divide the window
    eng2 = SlidingWindowEngine(smooth_apply, (8, 16, 16), stride=(3, 6, 6), sw_batch_size=2)
    scatter = eng2(None, vol)
    # identity-like model: both reconstruct the linear functions of vol
    np.testing.assert_allclose(regular[..., 0], vol, atol=1e-4)
    np.testing.assert_allclose(scatter[..., 0], vol, atol=1e-4)
    np.testing.assert_allclose(regular[..., 1], 1 - vol, atol=1e-4)


def test_regular_weight_separable_matches_direct():
    from pytorch_connectomics_tpu.inference.window import (
        _regular_weight_host,
        importance_map,
    )

    imp = importance_map((4, 8, 8), "bump")
    fast = _regular_weight_host((12, 24, 24), (4, 8, 8), (2, 4, 4), imp)
    # direct accumulation oracle
    direct = np.zeros((12, 24, 24))
    for oz in range(0, 9, 2):
        for oy in range(0, 17, 4):
            for ox in range(0, 17, 4):
                direct[oz:oz+4, oy:oy+8, ox:ox+8] += imp
    np.testing.assert_allclose(fast, direct, rtol=1e-4)


def test_tta_variant_sharding_matches_sequential():
    """TTA variants sharded over the 8-device mesh == sequential TTA."""
    from pytorch_connectomics_tpu.parallel import make_mesh

    vol = np.random.rand(8, 16, 16).astype(np.float32)
    eng = SlidingWindowEngine(smooth_apply, (8, 16, 16), overlap=0.5, sw_batch_size=1)
    tta_cfg = build_dataclass(TTAConfig, {"enabled": True, "flip_axes": "all", "ensemble_mode": "mean"})
    seq = TTAPredictor(eng, tta_cfg).predict(None, vol)
    mesh = make_mesh({"data": 8})
    par = TTAPredictor(eng, tta_cfg, mesh=mesh).predict(None, vol)
    np.testing.assert_allclose(par, seq, atol=1e-4)


def test_tta_variant_sharding_repeated_predicts_non_dividing_stride():
    """Round-5 crash regression: the engine's cached inverse-weight map must
    stay a CONCRETE device array when device_pass runs under the TTA
    variants-sharded jit/shard_map trace — a cache entry produced from
    trace-side ops leaks a tracer and the SECOND predict on the same engine
    raises UnexpectedTracerError. Non-dividing stride forces the snap-grid
    path (the shipped ov0.125 recipe's path)."""
    from pytorch_connectomics_tpu.parallel import make_mesh

    vol = np.random.rand(10, 18, 18).astype(np.float32)
    # stride (5,7,7) does not divide window (8,16,16) -> snap-grid engine
    eng = SlidingWindowEngine(
        smooth_apply, (8, 16, 16), stride=(5, 7, 7), sw_batch_size=1
    )
    tta_cfg = build_dataclass(
        TTAConfig, {"enabled": True, "flip_axes": "all", "ensemble_mode": "mean"}
    )
    mesh = make_mesh({"data": 8})
    pred = TTAPredictor(eng, tta_cfg, mesh=mesh)
    first = pred.predict(None, vol)
    second = pred.predict(None, vol)  # crashed pre-fix (leaked tracer)
    np.testing.assert_allclose(first, second, atol=1e-6)
    seq = TTAPredictor(eng, tta_cfg).predict(None, vol)  # serial reuse too
    np.testing.assert_allclose(seq, first, atol=1e-4)


def test_device_inv_weight_matches_host_oracle():
    """_inv_weight_scatter_device (the engine's on-device weight pass) must
    equal the independent host accumulation for snap grids."""
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.inference.window import (
        _inv_weight_scatter_device,
        _snap_weight_host,
        compute_window_grid,
    )

    shape, window, stride = (14, 15, 16), (8, 8, 8), (5, 6, 7)
    imp = importance_map(window, "bump")  # clipped -> NON-separable
    grid = compute_window_grid(shape, window, stride=stride)
    inv = _inv_weight_scatter_device(
        jnp.asarray(grid), jnp.asarray(imp[..., None]), shape, window
    )
    host = _snap_weight_host(shape, window, stride, imp)
    np.testing.assert_allclose(
        np.asarray(inv)[..., 0], 1.0 / np.maximum(host, 1e-8),
        rtol=1e-4, atol=1e-5,
    )


def test_device_inv_weight_regular_grid_matches_host_oracle():
    """The regular (dividing-stride) engine paths now also compute their
    blend normalizer on device (_regular_grid_origins ->
    _inv_weight_scatter_device); it must equal the host accumulation."""
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.inference.window import (
        _inv_weight_scatter_device,
        _regular_grid_origins,
        _regular_weight_host,
    )

    cover, window, stride = (12, 20, 16), (8, 8, 8), (4, 4, 4)
    imp = importance_map(window, "bump")  # clipped -> NON-separable
    origins = _regular_grid_origins(cover, window, stride)
    inv = _inv_weight_scatter_device(
        jnp.asarray(origins), jnp.asarray(imp[..., None]), cover, window
    )
    host = _regular_weight_host(cover, window, stride, imp)
    np.testing.assert_allclose(
        np.asarray(inv)[..., 0], 1.0 / np.maximum(host, 1e-8),
        rtol=1e-4, atol=1e-5,
    )


def test_tta_explicit_transforms_list():
    """tta.transforms gives explicit variant dicts (reference
    schema/inference.py:165); identity is prepended, dupes dropped,
    unknown keys rejected."""
    from pytorch_connectomics_tpu.inference.tta import enumerate_tta_variants

    vs = enumerate_tta_variants(transforms=[
        {"flip": [2]},
        {"rot": 1, "plane": [1, 2]},
        {"flip": [2]},                       # duplicate -> dropped
        {"flip": [0], "rotation90_k": 2},    # rot alias
        {"flip": [1], "rot": 2},             # == flip x -> deduped
    ])
    assert vs[0] == {"flip": (), "rot": 0, "plane": (1, 2)}
    assert len(vs) == 4
    assert {"flip": (2,), "rot": 0, "plane": (1, 2)} in vs
    assert {"flip": (0,), "rot": 2, "plane": (1, 2)} in vs
    with pytest.raises(ValueError):
        enumerate_tta_variants(transforms=[{"flips": [2]}])
    # end-to-end: explicit flip-x list matches the enumerated xy-flip subset
    vol = np.random.rand(8, 16, 16).astype(np.float32)
    eng = SlidingWindowEngine(smooth_apply, (8, 16, 16), overlap=0.5, sw_batch_size=1)
    via_list = TTAPredictor(eng, build_dataclass(TTAConfig, {
        "enabled": True, "transforms": [{"flip": [1]}, {"flip": [2]}, {"flip": [1, 2]}],
    })).predict(None, vol)
    via_enum = TTAPredictor(eng, build_dataclass(TTAConfig, {
        "enabled": True, "flip_axes": "xy",
    })).predict(None, vol)
    np.testing.assert_allclose(via_list, via_enum, atol=1e-5)


def test_tta_anisotropic_rotation_plane_falls_back_to_serial():
    """An odd rot90 in a plane with unequal volume extents changes the volume
    shape, which the variant-sharded path cannot stack — the predictor must
    fall back to the serial loop (it used to crash in np.stack) and still
    match the single-device result."""
    from pytorch_connectomics_tpu.parallel import make_mesh

    vol = np.random.rand(8, 16, 16).astype(np.float32)  # Z != Y
    eng = SlidingWindowEngine(smooth_apply, (8, 16, 16), overlap=0.5, sw_batch_size=1)
    tta_cfg = build_dataclass(
        TTAConfig,
        {"enabled": True, "flip_axes": None, "rotation_planes": [[0, 1]],
         "ensemble_mode": "mean"},
    )
    seq = TTAPredictor(eng, tta_cfg).predict(None, vol)
    mesh = make_mesh({"data": 4})
    pred = TTAPredictor(eng, tta_cfg, mesh=mesh)
    assert pred.num_variants >= mesh.devices.size  # sharded path would engage
    assert not pred._variants_preserve_shape(vol.shape[:3])
    par = pred.predict(None, vol)
    np.testing.assert_allclose(par, seq, atol=1e-4)
    # square in the rotation plane -> sharded path stays available
    assert pred._variants_preserve_shape((16, 16, 8))


@pytest.mark.parametrize("blend", ["constant", "bump", "gaussian", "distance"])
def test_all_blend_modes_reconstruct_identity(blend):
    """With an identity model every blend mode must reconstruct the volume
    exactly (weights cancel in the normalization)."""
    rng = np.random.default_rng(1)
    vol = rng.random((10, 20, 20), dtype=np.float32)
    eng = SlidingWindowEngine(
        identity_apply, (8, 16, 16), overlap=0.5, blending=blend, sw_batch_size=3
    )
    out = eng(None, vol, out_channels=1)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-4)


@pytest.mark.parametrize("snap", [True, False])
def test_snap_to_edge_both_reconstruct(snap):
    # non-divisible extent: stride grid overshoots; both residual-window
    # strategies must still be exact for identity models
    vol = np.random.default_rng(2).random((11, 19, 23), dtype=np.float32)
    eng = SlidingWindowEngine(
        identity_apply, (8, 16, 16), overlap=0.5, snap_to_edge=snap, sw_batch_size=2
    )
    out = eng(None, vol, out_channels=1)
    np.testing.assert_allclose(out[..., 0], vol, atol=1e-4)


def test_bf16_accumulators_close_to_f32():
    """inference.window.acc_dtype=bfloat16 (compact accumulators,
    reference lazy.py:1133-1139) stays within bf16 tolerance."""
    import jax.numpy as jnp

    vol = np.random.default_rng(3).random((8, 16, 16)).astype(np.float32)
    f32 = SlidingWindowEngine(identity_apply, (8, 16, 16), sw_batch_size=1)
    bf16 = SlidingWindowEngine(
        identity_apply, (8, 16, 16), sw_batch_size=1, acc_dtype=jnp.bfloat16
    )
    a = f32(None, vol, out_channels=1)
    b = bf16(None, vol, out_channels=1)
    np.testing.assert_allclose(a, b, atol=0.02)


def _conv_apply(params, windows):
    """Non-flip-equivariant deterministic model: fixed random 3^3 conv."""
    import jax
    import jax.numpy as jnp

    w = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 3, 1, 2), jnp.float32) * 0.3
    return jax.lax.conv_general_dilated(
        windows, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_patch_first_local_tta_matches_whole_volume_mean():
    """Mean-ensemble patch-local TTA == whole-volume TTA on a flip-symmetric
    grid (blending is linear), reference tta.py:420,822."""
    vol = np.random.default_rng(0).random((16, 16, 16)).astype(np.float32)
    eng = SlidingWindowEngine(_conv_apply, (8, 8, 8), overlap=0.5, sw_batch_size=2)
    cfg_w = build_dataclass(TTAConfig, {"enabled": True, "flip_axes": "all"})
    cfg_p = build_dataclass(
        TTAConfig, {"enabled": True, "flip_axes": "all", "patch_first_local": True}
    )
    whole = TTAPredictor(eng, cfg_w).predict(None, vol, out_channels=2)
    patch = TTAPredictor(eng, cfg_p).predict(None, vol, out_channels=2)
    assert patch.shape == whole.shape
    np.testing.assert_allclose(patch, whole, atol=2e-5)


def test_patch_first_local_tta_minmax_and_rot():
    """min/max + rotation90 variants run end-to-end; rotation needs a square
    (y, x) window."""
    vol = np.random.default_rng(1).random((8, 12, 12)).astype(np.float32)
    eng = SlidingWindowEngine(_conv_apply, (4, 8, 8), overlap=0.5, sw_batch_size=2)
    cfg = build_dataclass(
        TTAConfig,
        {
            "enabled": True, "flip_axes": "xy", "rotation90": True,
            "patch_first_local": True,
            "ensemble_mode": [["0:1", "min"], ["1:", "mean"]],
        },
    )
    out = TTAPredictor(eng, cfg).predict(None, vol, out_channels=2)
    assert out.shape == (8, 12, 12, 2)
    assert np.isfinite(out).all()

    from pytorch_connectomics_tpu.inference.tta import make_patch_local_apply_fn

    with pytest.raises(ValueError):
        make_patch_local_apply_fn(
            _conv_apply, enumerate_tta_variants("all", True), "mean", (4, 8, 6)
        )


def test_regular_cover_setup_device_exact_blend():
    """The on-device separable blend must normalize EXACTLY: inv_weight is
    the reciprocal of the brute-force sum of window importances (the clipped
    stock bump breaks separability, mis-normalizing corners by up to 1e4 —
    the defect this helper exists to avoid)."""
    import numpy as np

    from pytorch_connectomics_tpu.inference.window import (
        importance_map,
        regular_cover_setup_device,
    )

    window, stride, shape = (8, 8, 8), (4, 4, 4), (12, 16, 16)
    cover, imp, inv = regular_cover_setup_device(shape, window, stride)
    imp = np.asarray(imp)[..., 0]
    inv = np.asarray(inv)[..., 0]
    # brute-force accumulate the SAME importance map over the grid
    acc = np.zeros(cover, np.float64)
    for oz in range(0, cover[0] - window[0] + 1, stride[0]):
        for oy in range(0, cover[1] - window[1] + 1, stride[1]):
            for ox in range(0, cover[2] - window[2] + 1, stride[2]):
                acc[oz:oz + window[0], oy:oy + window[1], ox:ox + window[2]] += imp
    np.testing.assert_allclose(inv, 1.0 / acc, rtol=2e-5)
    # and the clipped stock bump is NOT separable — the old hand-rolled
    # center-profile product disagrees with its true accumulation at corners
    clipped = importance_map(window, "bump")
    c = tuple(w // 2 for w in window)
    sep = (
        np.multiply.outer(
            np.multiply.outer(clipped[:, c[1], c[2]], clipped[c[0], :, c[2]]),
            clipped[c[0], c[1], :],
        )
        / float(clipped[c]) ** 2
    )
    assert (clipped / sep).max() > 10.0  # clip floor >> true corner weight


def _affinity_oracle_setup(patch_local=False, groups=True):
    """TTA predictor over an 'affinity oracle' model: the input volume IS an
    instance-label volume and the model emits its exact affinities — so the
    flip-TTA ensemble must reproduce the direct affinities in the interior
    IF (and only if) per-offset realignment is wired in."""
    import numpy as np

    from pytorch_connectomics_tpu.config.schema import SlidingWindowConfig, TTAConfig
    from pytorch_connectomics_tpu.data.synthetic_jax import affinity_targets
    from pytorch_connectomics_tpu.inference.tta import TTAPredictor
    from pytorch_connectomics_tpu.inference.window import make_engine

    offsets = [(0, 0, 1), (0, 1, 0), (1, 0, 0)]

    def apply_fn(params, batch):
        return affinity_targets(batch[..., 0].astype("int32"))

    shape = (8, 12, 12)
    cfg = SlidingWindowConfig(window_size=list(shape), blending="constant", sw_batch_size=1)
    engine = make_engine(apply_fn, cfg, list(shape))
    tta = TTAConfig(
        enabled=True, flip_axes=[[0], [1], [2]], ensemble_mode="mean",
        patch_first_local=patch_local,
    )
    g = [{"start": 0, "end": 3, "offsets": offsets}] if groups else None
    pred = TTAPredictor(engine, tta, affinity_groups=g)
    rng = np.random.RandomState(0)
    labels = rng.randint(1, 5, size=shape).astype(np.float32)
    direct = np.asarray(affinity_targets(labels.astype("int32")))
    out = pred.predict(None, labels[..., None])
    interior = (slice(1, -1),) * 3
    return out[interior], direct[interior]


def test_tta_predictor_aligns_affinity_channels():
    import numpy as np

    out, direct = _affinity_oracle_setup(groups=True)
    np.testing.assert_allclose(out, direct, atol=1e-6)
    # and WITHOUT wiring, the naive flip-back ensemble is wrong
    out_naive, direct = _affinity_oracle_setup(groups=False)
    assert np.abs(out_naive - direct).max() > 0.2


def test_patch_local_tta_aligns_affinity_channels():
    import numpy as np

    out, direct = _affinity_oracle_setup(patch_local=True, groups=True)
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_patch_local_tta_activates_per_variant():
    """Patch-local TTA must ensemble ACTIVATED variants (mean of sigmoids),
    matching the stock path's activation order. On a non-overlapping window
    grid blending is per-window identity, so both paths must agree exactly;
    ensembling raw logits then activating (the old behavior) gives
    sigmoid(mean) != mean(sigmoid) for any non-symmetric logit set."""
    from pytorch_connectomics_tpu.config.schema import SlidingWindowConfig
    from pytorch_connectomics_tpu.inference.window import make_engine

    vol = np.random.default_rng(3).random((8, 16, 16)).astype(np.float32)
    cfg = SlidingWindowConfig(
        window_size=[8, 8, 8], overlap=0.0, blending="constant", sw_batch_size=2
    )
    cfg_w = build_dataclass(TTAConfig, {"enabled": True, "flip_axes": "all", "act": "sigmoid"})
    cfg_p = build_dataclass(
        TTAConfig,
        {"enabled": True, "flip_axes": "all", "act": "sigmoid", "patch_first_local": True},
    )
    whole = TTAPredictor(
        make_engine(_conv_apply, cfg, [8, 16, 16]), cfg_w
    ).predict(None, vol, out_channels=2)
    patch = TTAPredictor(
        make_engine(_conv_apply, cfg, [8, 16, 16]), cfg_p
    ).predict(None, vol, out_channels=2)
    np.testing.assert_allclose(patch, whole, atol=2e-5)


def test_patch_local_tta_masks_realigned_affinity_planes():
    """Per-window affinity realignment shifts values in from OUTSIDE the
    window: the first |offset| planes of a flipped variant are unknown at
    EVERY window, so they must be excluded from the ensemble (weighted mean)
    rather than averaging in a spurious zero logit."""
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.inference.tta import make_patch_local_apply_fn

    offsets = [(0, 0, 1)]
    groups = [{"start": 0, "end": 1, "offsets": offsets}]
    variants = [{"flip": (), "rot": 0}, {"flip": (2,), "rot": 0}]
    rng = np.random.default_rng(5)
    win = jnp.asarray(rng.random((1, 4, 4, 6, 1)).astype(np.float32))

    calls = []

    def apply_fn(params, batch):
        calls.append(np.asarray(batch))
        return batch * 3.0 + 1.0

    wrapped = make_patch_local_apply_fn(
        apply_fn, variants, "mean", (4, 4, 6), affinity_groups=groups
    )
    out = np.asarray(wrapped(None, win))
    ident = np.asarray(win) * 3.0 + 1.0
    # flipped-variant prediction, flipped back, then realigned (shift +1 in x)
    flipped = np.flip(np.flip(np.asarray(win), axis=3) * 3.0 + 1.0, axis=3)
    realigned = np.zeros_like(flipped)
    realigned[:, :, :, 1:] = flipped[:, :, :, :-1]
    # interior planes: plain two-variant mean
    np.testing.assert_allclose(
        out[:, :, :, 1:], (ident + realigned)[:, :, :, 1:] / 2.0, atol=1e-6
    )
    # plane x=0: realigned value unavailable -> identity variant ONLY,
    # not (ident + 0)/2
    np.testing.assert_allclose(out[:, :, :, 0], ident[:, :, :, 0], atol=1e-6)


def test_rot90_tta_with_affinity_groups_rejected():
    import pytest

    from pytorch_connectomics_tpu.config.schema import SlidingWindowConfig, TTAConfig
    from pytorch_connectomics_tpu.inference.tta import TTAPredictor
    from pytorch_connectomics_tpu.inference.window import make_engine

    engine = make_engine(lambda p, b: b, SlidingWindowConfig(window_size=[8, 8, 8]), [8, 8, 8])
    with pytest.raises(ValueError, match="rotation90"):
        TTAPredictor(
            engine,
            TTAConfig(enabled=True, rotation90=True),
            affinity_groups=[{"start": 0, "end": 3, "offsets": [(0, 0, 1)]}],
        )


def test_sharded_variant_tta_aligns_affinity_channels():
    """The variant-sharded TTA path (one device per flip variant) must apply
    the same affinity realignment as the serial path."""
    import numpy as np

    from pytorch_connectomics_tpu.config.schema import SlidingWindowConfig, TTAConfig
    from pytorch_connectomics_tpu.data.synthetic_jax import affinity_targets
    from pytorch_connectomics_tpu.inference.tta import TTAPredictor
    from pytorch_connectomics_tpu.inference.window import make_engine
    from pytorch_connectomics_tpu.parallel import make_mesh

    offsets = [(0, 0, 1), (0, 1, 0), (1, 0, 0)]

    def apply_fn(params, batch):
        return affinity_targets(batch[..., 0].astype("int32"))

    shape = (8, 12, 12)
    engine = make_engine(
        apply_fn,
        SlidingWindowConfig(window_size=list(shape), blending="constant", sw_batch_size=1),
        list(shape),
    )
    tta = TTAConfig(enabled=True, flip_axes=[[0], [1], [2]], ensemble_mode="mean")
    mesh = make_mesh({"data": 4})
    pred = TTAPredictor(
        engine, tta, mesh=mesh,
        affinity_groups=[{"start": 0, "end": 3, "offsets": offsets}],
    )
    assert pred.num_variants == 4 and mesh.devices.size == 4  # sharded path
    rng = np.random.RandomState(1)
    labels = rng.randint(1, 5, size=shape).astype(np.float32)
    direct = np.asarray(affinity_targets(labels.astype("int32")))
    out = pred.predict(None, labels[..., None])
    interior = (slice(1, -1),) * 3
    np.testing.assert_allclose(out[interior], direct[interior], atol=1e-6)


class TestPredictVolumeDevice:
    """predict_volume_device: one entry point for every overlap — parity
    engine when stride divides window, HBM-accumulator fallback otherwise
    (overlap 0.25/0.125 crashed the parity engine live on the TPU with an
    out-of-range lax.slice before the fallback existed)."""

    @staticmethod
    def _naive(vol, window, stride, f):
        import numpy as np

        from pytorch_connectomics_tpu.inference.window import (
            _separable_bump_profiles,
            compute_grid_1d,
        )

        profiles = _separable_bump_profiles(window)
        imp = (
            profiles[0][:, None, None]
            * profiles[1][None, :, None]
            * profiles[2][None, None, :]
        )[..., None]
        value = np.zeros(vol.shape[:3] + (1,), np.float64)
        weight = np.zeros(vol.shape[:3] + (1,), np.float64)
        grids = [
            compute_grid_1d(s, w, st)
            for s, w, st in zip(vol.shape[:3], window, stride)
        ]
        for oz in grids[0]:
            for oy in grids[1]:
                for ox in grids[2]:
                    wz, wy, wx = window
                    win = vol[oz:oz + wz, oy:oy + wy, ox:ox + wx]
                    value[oz:oz + wz, oy:oy + wy, ox:ox + wx] += imp * f(win)
                    weight[oz:oz + wz, oy:oy + wy, ox:ox + wx] += imp
        return value / weight

    @pytest.mark.parametrize("stride", [(4, 4, 4), (6, 6, 6), (6, 4, 7)])
    def test_matches_naive_reference(self, stride):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pytorch_connectomics_tpu.inference.window import (
            predict_volume_device,
        )

        rng = np.random.default_rng(3)
        vol = rng.random((16, 16, 16, 1)).astype(np.float32)
        window = (8, 8, 8)

        def apply_fn(params, w):
            return w * 2.0 + 1.0

        out = jax.jit(
            lambda v: predict_volume_device(
                {}, v, apply_fn, window, stride, sw_batch=4, out_channels=1
            )
        )(jnp.asarray(vol))
        ref = self._naive(vol, window, stride, lambda w: w * 2.0 + 1.0)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def test_host_weight_matches_device_accumulator(self):
        """_snap_weight_host must equal the on-device weight accumulator it
        replaces (value-only scatter + closed-form normalization, r5) —
        including for snap=False grids, whose nominal overshoot origins are
        clamped by dynamic_update_slice on device."""
        import jax.numpy as jnp

        from pytorch_connectomics_tpu.inference.window import (
            _pad_grid_with_valid,
            _sliding_window_device,
            _snap_weight_host,
            compute_window_grid,
        )

        shape, window, stride = (14, 15, 16), (8, 8, 8), (5, 6, 7)
        imp = importance_map(window, "bump")  # clipped -> NON-separable
        vol = jnp.zeros(shape + (1,), jnp.float32)
        for snap in (True, False):
            grid = compute_window_grid(shape, window, stride=stride, snap=snap)
            grid, valid = _pad_grid_with_valid(grid, 4)
            _, weight = _sliding_window_device(
                None, vol, jnp.asarray(grid), jnp.asarray(imp[..., None]),
                apply_fn=identity_apply, window=window, sw_batch=4,
                out_channels=1, valid=jnp.asarray(valid),
                accumulate_weight=True,
            )
            host = _snap_weight_host(shape, window, stride, imp, snap)
            np.testing.assert_allclose(
                np.asarray(weight)[..., 0], host, rtol=1e-5, atol=1e-6,
                err_msg=f"snap={snap}",
            )

    def test_identity_engine_non_dividing_stride_snap_false(self):
        """The manager's snap-grid path (value-only scatter + host weight)
        must reconstruct under an identity model at snap=False too."""
        rng = np.random.default_rng(7)
        vol = rng.random((11, 13, 17), dtype=np.float32)
        eng = SlidingWindowEngine(
            identity_apply, (8, 8, 8), stride=(5, 6, 7), sw_batch_size=3,
            snap_to_edge=False,
        )
        out = eng(None, vol, out_channels=1)
        np.testing.assert_allclose(out[..., 0], vol, atol=1e-5)

    def test_parity_engine_rejects_non_dividing_stride(self):
        import jax.numpy as jnp

        from pytorch_connectomics_tpu.inference.window import (
            _sliding_window_regular_device,
        )

        with pytest.raises(ValueError, match="stride to divide window"):
            _sliding_window_regular_device(
                {}, jnp.zeros((16, 16, 16, 1)), jnp.zeros((8, 8, 8, 1)),
                jnp.zeros((16, 16, 16, 1)), apply_fn=lambda p, w: w,
                window=(8, 8, 8), stride=(6, 6, 6), sw_batch=4,
                out_channels=1,
            )


def test_chunked_artifact_carries_checkpoint_provenance(tmp_path):
    """The chunked-inference artifact must participate in the checkpoint
    provenance check exactly like whole-volume predictions (advisor round-4
    finding: it previously validated as a legacy cache for ANY weights)."""
    from pytorch_connectomics_tpu.data.io import save_volume
    from pytorch_connectomics_tpu.inference.output import validate_prediction_cache

    vol = (np.random.rand(8, 16, 16) * 255).astype(np.uint8)
    src = str(tmp_path / "s.h5")
    save_volume(src, vol)
    eng = SlidingWindowEngine(identity_apply, (8, 16, 16), sw_batch_size=1)
    cfg = build_dataclass(ChunkedConfig, {"enabled": True, "chunk_size": [8, 16, 16]})
    out = run_chunked_inference(
        TTAPredictor(eng), None, LazyVolumeAccessor(src), tmp_path / "o.h5",
        cfg, out_channels=1,
        signature={"config_hash": "cfg_h", "checkpoint": "ckpt_a"},
    )
    assert validate_prediction_cache(out, "cfg_h", "ckpt_a")
    assert not validate_prediction_cache(out, "cfg_h", "ckpt_b")
    assert not validate_prediction_cache(out, "cfg_h", "")  # random-init run
    assert not validate_prediction_cache(out, "other_cfg", "ckpt_a")
    # empty-checkpoint signature stamps the random-init sentinel
    out2 = run_chunked_inference(
        TTAPredictor(eng), None, LazyVolumeAccessor(src), tmp_path / "o2.h5",
        cfg, out_channels=1,
        signature={"config_hash": "cfg_h", "checkpoint": ""},
    )
    assert validate_prediction_cache(out2, "cfg_h", "")
    assert not validate_prediction_cache(out2, "cfg_h", "ckpt_a")

    # a run that CRASHES mid-write must leave an artifact that can never
    # positively validate (round-5 review: attrs used to be stamped before
    # any chunk was computed, so a half-empty file looked like a full cache)
    from pytorch_connectomics_tpu.inference import chunked as chunked_mod

    def _boom(*a, **k):
        raise RuntimeError("boom")

    real_run = chunked_mod._run_chunks
    chunked_mod._run_chunks = _boom
    out3 = tmp_path / "o3.h5"
    try:
        with pytest.raises(RuntimeError, match="boom"):
            run_chunked_inference(
                TTAPredictor(eng), None, LazyVolumeAccessor(src), out3, cfg,
                out_channels=1,
                signature={"config_hash": "cfg_h", "checkpoint": "ckpt_a"},
            )
    finally:
        chunked_mod._run_chunks = real_run
    assert out3.exists()
    assert not validate_prediction_cache(out3, "cfg_h", "ckpt_a")
    assert not validate_prediction_cache(out3, "cfg_h", "")
    assert not validate_prediction_cache(out3)  # decode-only caller too


def test_predict_volume_device_pads_small_volume_snap_grid():
    """Volumes smaller than the window must be grow-to-ROI padded in the
    snap-grid fallback too (advisor round-4 finding: the jitted
    dynamic_slice previously failed at trace time)."""
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.inference.window import predict_volume_device

    rng = np.random.default_rng(3)
    vol = rng.random((6, 12, 20), dtype=np.float32)[..., None]
    # stride does not divide window -> snap-grid fallback; z/y < window
    out = predict_volume_device(
        None, jnp.asarray(vol), identity_apply,
        window=(8, 16, 16), stride=(6, 12, 12), sw_batch=2, out_channels=1,
    )
    assert out.shape == (6, 12, 20, 1)
    np.testing.assert_allclose(np.asarray(out), vol, atol=1e-5)
