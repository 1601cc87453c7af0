import numpy as np
import pytest

from pytorch_connectomics_tpu.data import (
    RejectConfig,
    VolumeDataset,
    normalize_volume,
    probe_volume,
    read_volume,
    save_volume,
    split_volume,
    synthetic_volume,
)


def test_h5_roundtrip(tmp_path):
    vol = (np.random.rand(8, 16, 16) * 255).astype(np.uint8)
    p = str(tmp_path / "v.h5")
    save_volume(p, vol)
    back = read_volume(p)
    np.testing.assert_array_equal(vol, back)
    shape, dtype = probe_volume(p)
    assert shape == vol.shape and dtype == vol.dtype


def test_h5_roi_read(tmp_path):
    vol = np.arange(4 * 8 * 8, dtype=np.uint16).reshape(4, 8, 8)
    p = str(tmp_path / "v.h5")
    save_volume(p, vol)
    roi = (slice(1, 3), slice(0, 4), slice(2, 6))
    np.testing.assert_array_equal(read_volume(p, roi=roi), vol[roi])


def test_h5_internal_path(tmp_path):
    import h5py

    p = str(tmp_path / "multi.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("vol_a", data=np.ones((2, 2, 2)))
        f.create_dataset("vol_b", data=np.zeros((2, 2, 2)))
    assert read_volume(p + ":vol_b").sum() == 0


def test_zarr_roundtrip(tmp_path):
    vol = np.random.rand(8, 16, 16).astype(np.float32)
    p = str(tmp_path / "v.zarr")
    save_volume(p, vol)
    np.testing.assert_allclose(read_volume(p), vol)
    shape, dtype = probe_volume(p)
    assert shape == vol.shape


def test_tiff_roundtrip(tmp_path):
    vol = (np.random.rand(4, 16, 16) * 255).astype(np.uint8)
    p = str(tmp_path / "v.tif")
    save_volume(p, vol)
    np.testing.assert_array_equal(read_volume(p), vol)


def test_synthetic_deterministic():
    a = synthetic_volume("foo", (8, 16, 16))
    b = synthetic_volume("foo", (8, 16, 16))
    np.testing.assert_array_equal(a, b)
    lbl = synthetic_volume("foo_label", (8, 16, 16))
    assert lbl.dtype == np.uint32


def test_normalize_methods():
    v = (np.random.rand(4, 8, 8) * 255).astype(np.uint8)
    out = normalize_volume(v, "smart")
    assert out.dtype == np.float32 and out.max() <= 1.0
    z = normalize_volume(v, "zscore")
    assert abs(float(z.mean())) < 1e-4


def test_volume_dataset_sampling():
    ds = VolumeDataset(
        "random://ds/im?shape=32x64x64",
        "random://ds/label?shape=32x64x64",
        patch_size=(16, 32, 32),
    )
    rng = np.random.default_rng(0)
    item = ds.sample(rng)
    assert item["image"].shape == (1, 16, 32, 32)
    assert item["label"].shape == (1, 16, 32, 32)
    assert item["image"].dtype == np.float32


def test_volume_dataset_pads_small_volume():
    ds = VolumeDataset("random://small/im?shape=8x16x16", patch_size=(16, 32, 32))
    item = ds.center()
    assert item["image"].shape == (1, 16, 32, 32)


def test_data_transform_resize_binarize_and_pad():
    """data.data_transform: paired resize (image linear, label nearest) +
    label binarization + border pad at volume load (reference
    DataTransformConfig, config/schema/data.py:90)."""
    from pytorch_connectomics_tpu.config.schema import (
        DataTransformConfig, build_dataclass,
    )
    from pytorch_connectomics_tpu.data.preprocess import (
        apply_data_transform, center_align, resize_volume,
    )

    dt = build_dataclass(
        DataTransformConfig,
        {"resize": [8, 16, 16], "binarize": True, "threshold": 0.5,
         "pad_size": [2, 0, 0], "pad_mode": "reflect"},
    )
    img = np.random.rand(4, 8, 8).astype(np.float32)
    lbl = (np.random.rand(4, 8, 8) > 0.4).astype(np.float32) * 3.0
    out_img = apply_data_transform(img, dt, is_label=False)
    out_lbl = apply_data_transform(lbl, dt, is_label=True)
    assert out_img.shape == (12, 16, 16)  # resized then z-padded by 2+2
    assert out_lbl.shape == (12, 16, 16)
    assert set(np.unique(out_lbl)) <= {0.0, 1.0}  # binarized (3.0 > 0.5)
    # nearest resize preserves the label value set exactly
    lbl2 = np.zeros((4, 8, 8), np.float32)
    lbl2[:, :4] = 7.0
    up = resize_volume(lbl2, (8, 16, 16), order=0)
    assert set(np.unique(up)) == {0.0, 7.0}
    # wired through the dataset: both volumes land at the target size
    ds = VolumeDataset(
        "random://dt/im?shape=4x8x8", "random://dt/label?shape=4x8x8",
        patch_size=(8, 16, 16),
        data_transform=build_dataclass(DataTransformConfig, {"resize": [8, 16, 16]}),
    )
    item = ds.center()
    assert item["image"].shape == (1, 8, 16, 16)
    assert item["label"].shape == (1, 8, 16, 16)
    # center_align reconciles minor shape mismatches symmetrically
    a = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    al = center_align(a, (5, 3, 1))
    assert al.shape == (5, 3, 1) and al[2, 1, 0] == a[1, 1, 1]


def test_rejection_sampling_prefers_foreground():
    ds = VolumeDataset(
        "random://rej/im?shape=32x64x64",
        "random://rej/label?shape=32x64x64",
        patch_size=(8, 16, 16),
        reject=RejectConfig(enabled=True, min_fg_ratio=0.01, max_attempts=50, prob=1.0),
    )
    rng = np.random.default_rng(1)
    ratios = [(ds.sample(rng)["label"] > 0).mean() for _ in range(10)]
    assert np.mean(ratios) > 0.005


def test_split_volume():
    vol = np.arange(100).reshape(100, 1, 1)
    tr, va = split_volume(vol, axis=0, train_range=[0.0, 0.8])
    assert tr.shape[0] == 80 and va.shape[0] == 20
    assert va[0, 0, 0] == 80


def test_synthetic_scheme_roundtrip():
    """synthetic:// scheme: image/label share a generator call, roles split
    by name, probe matches read, ROI slicing works, determinism holds."""
    import numpy as np

    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume

    img = read_volume("synthetic://instance/train_image?shape=8,24,24&seed=5&cells=6")
    lbl = read_volume("synthetic://instance/train_label?shape=8,24,24&seed=5&cells=6")
    assert img.shape == lbl.shape == (8, 24, 24)
    assert img.dtype == np.uint8 and lbl.dtype == np.uint32
    assert lbl.min() >= 1 and len(np.unique(lbl)) >= 3
    shape, dt = probe_volume("synthetic://instance/train_label?shape=8,24,24&seed=5")
    assert shape == (8, 24, 24) and dt == np.uint32
    roi = read_volume(
        "synthetic://instance/train_image?shape=8,24,24&seed=5&cells=6",
        roi=(slice(0, 4), slice(0, 8), slice(0, 8)),
    )
    np.testing.assert_array_equal(roi, img[:4, :8, :8])
    img2 = read_volume("synthetic://instance/other_image?shape=8,24,24&seed=5&cells=6")
    np.testing.assert_array_equal(img, img2)  # same seed -> same volume


def test_synthetic_scheme_em_tasks_and_errors():
    import numpy as np
    import pytest

    from pytorch_connectomics_tpu.data.io import read_volume

    for task in ("em", "em2"):
        lbl = read_volume(f"synthetic://{task}/x_label?shape=8,16,16")
        assert set(np.unique(lbl)) <= {0, 1}
    with pytest.raises(ValueError, match="unknown synthetic task"):
        read_volume("synthetic://nope/x_image?shape=8,16,16")
