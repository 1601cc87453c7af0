"""Precomputed (neuroglancer) IO + ABISS bridge conventions."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.data.precomputed import (
    abiss_affinity_convention,
    create_precomputed,
    open_precomputed,
)


def test_precomputed_roundtrip(tmp_path):
    vol = (np.random.rand(8, 16, 32) * 255).astype(np.uint8)
    p = tmp_path / "layer"
    w = create_precomputed(p, vol.shape, np.uint8, chunk_size=(4, 8, 16))
    w.write((slice(0, 8), slice(0, 16), slice(0, 32)), vol)
    r = open_precomputed(p)
    back = r.read((slice(0, 8), slice(0, 16), slice(0, 32)))
    np.testing.assert_array_equal(back, vol)
    # partial chunk-aligned read
    np.testing.assert_array_equal(
        r.read((slice(0, 4), slice(8, 16), slice(16, 32))), vol[:4, 8:, 16:]
    )


def test_precomputed_multichannel(tmp_path):
    vol = np.random.rand(3, 4, 8, 8).astype(np.float32)
    p = tmp_path / "aff"
    w = create_precomputed(p, vol.shape[1:], np.float32, chunk_size=(4, 8, 8), num_channels=3)
    w.write((slice(0, 4), slice(0, 8), slice(0, 8)), vol)
    back = open_precomputed(p).read((slice(0, 4), slice(0, 8), slice(0, 8)))
    np.testing.assert_allclose(back, vol)


def test_abiss_convention_shift_and_reverse():
    aff = np.zeros((3, 2, 2, 4), np.float32)
    aff[0, 0, 0, 2] = 1.0  # x-edge at high end x=2 (connects x=1,2)
    out = abiss_affinity_convention(aff)
    # x channel moves to index 2 and shifts to the low end (x=1)
    assert out[2, 0, 0, 1] == 1.0
    assert out[2, 0, 0, 2] == 0.0
    assert out[0].sum() == 0  # z channel (was aff[2]) empty


def test_abiss_decoder_fallback():
    from pytorch_connectomics_tpu.runtime.abiss_bridge import decode_abiss
    from pytorch_connectomics_tpu.data.targets import seg_to_affinity

    seg = np.zeros((4, 8, 8), np.uint32)
    seg[:, :, :4] = 1
    seg[:, :, 4:] = 2
    aff = seg_to_affinity(seg, ["0-0-1", "0-1-0", "1-0-0"])
    out = decode_abiss(aff, abiss_root=None, agg_threshold=0.3)
    assert len(np.unique(out)) >= 3  # bg + 2 instances


def test_seuron_provenance_replay(tmp_path):
    import json

    from pytorch_connectomics_tpu.runtime.abiss_bridge import replay_seuron_provenance

    seg = {
        "AFF_PATH": "gs://bucket/aff",
        "AFF_MIP": 0,
        "AFF_RESOLUTION": [8, 8, 40],
        "BBOX": [0, 0, 0, 512, 512, 128],
        "CHUNK_SIZE": [256, 256, 128],
        "AGG_THRESHOLD": 0.25,
        "WS_HIGH_THRESHOLD": 0.99,
        "WS_LOW_THRESHOLD": 0.01,
        "WS_SIZE_THRESHOLD": 500,
        "WS_DUST_THRESHOLD": 500,
        "REDIS_SERVER": "ignored-infra",
    }
    rec = {"processing": [{"method": seg}, {"method": {"downsample": True}}]}
    p = tmp_path / "prov.json"
    p.write_text(json.dumps(rec))
    params = replay_seuron_provenance(p, workdir=str(tmp_path), name="run1")
    assert params["AGG_THRESHOLD"] == 0.25
    assert params["WS_SIZE_THRESHOLD"] == 500
    assert params["NAME"] == "run1"
    # fresh local namespace minted for outputs
    assert params["WS_PATH"].endswith("precomputed/ws/run1")
    assert params["SEG_PATH"].endswith("precomputed/seg/run1")
    # infra keys are dropped, not copied
    assert "REDIS_SERVER" not in params

    # fail-closed: unknown keys rejected
    bad = dict(seg)
    bad["MYSTERY_KEY"] = 1
    p2 = tmp_path / "prov2.json"
    p2.write_text(json.dumps({"processing": [{"method": bad}]}))
    import pytest

    with pytest.raises(ValueError, match="Unknown Seuron"):
        replay_seuron_provenance(p2, workdir=str(tmp_path))

    # exactly one segmentation block required
    p3 = tmp_path / "prov3.json"
    p3.write_text(json.dumps({"processing": [{"method": seg}, {"method": seg}]}))
    with pytest.raises(ValueError, match="exactly one"):
        replay_seuron_provenance(p3, workdir=str(tmp_path))


def test_chunked_inference_precomputed_output(tmp_path):
    import numpy as np

    from pytorch_connectomics_tpu.config.schema import ChunkedConfig, build_dataclass
    from pytorch_connectomics_tpu.data.io import save_volume
    from pytorch_connectomics_tpu.data.precomputed import open_precomputed
    from pytorch_connectomics_tpu.inference import (
        LazyVolumeAccessor,
        SlidingWindowEngine,
        TTAPredictor,
        run_chunked_inference,
    )

    vol = (np.random.rand(8, 16, 16) * 255).astype(np.uint8)
    src = str(tmp_path / "src.h5")
    save_volume(src, vol)
    eng = SlidingWindowEngine(lambda p, w: w, (8, 16, 16), sw_batch_size=1)
    cfg = build_dataclass(
        ChunkedConfig,
        {"enabled": True, "chunk_size": [8, 16, 16], "output_mode": "precomputed"},
    )
    out = run_chunked_inference(
        TTAPredictor(eng), None, LazyVolumeAccessor(src), tmp_path / "layer",
        cfg, out_channels=1,
    )
    back = open_precomputed(out).read((slice(0, 8), slice(0, 16), slice(0, 16)))
    np.testing.assert_allclose(back, vol / 255.0, atol=1e-4)


def test_kvstore_spec_cloudpaths():
    from pytorch_connectomics_tpu.data.precomputed import kvstore_spec

    assert kvstore_spec("gs://bkt/inner/layer") == {
        "driver": "gcs", "bucket": "bkt", "path": "inner/layer"}
    assert kvstore_spec("s3://bkt/x") == {"driver": "s3", "bucket": "bkt", "path": "x"}
    assert kvstore_spec("/local/dir")["driver"] == "file"


def test_multiscale_pyramid(tmp_path):
    """append_scale adds mips; open_precomputed selects by resolution."""
    import numpy as np

    from pytorch_connectomics_tpu.data.precomputed import (
        append_scale,
        create_precomputed,
        open_precomputed,
    )

    base = str(tmp_path / "layer")
    v0 = create_precomputed(base, (4, 16, 16), np.uint8, (4, 8, 8), (30, 6, 6))
    v0.write((slice(0, 4), slice(0, 16), slice(0, 16)),
             np.arange(4 * 16 * 16, dtype=np.uint8).reshape(4, 16, 16))
    v1 = append_scale(base, (4, 8, 8), np.uint8, (4, 8, 8), (30, 12, 12))
    v1.write((slice(0, 4), slice(0, 8), slice(0, 8)),
             np.zeros((4, 8, 8), np.uint8))
    assert open_precomputed(base, resolution=[30, 6, 6]).shape == (4, 16, 16)
    assert open_precomputed(base, resolution=[30, 12, 12]).shape == (4, 8, 8)
