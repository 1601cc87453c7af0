"""Lazy-engine depth: tile-grid sources, read-downscale, compact
accumulators (reference ``inference/lazy.py:43-158,422-454,1133-1139``)."""

import numpy as np
import pytest

from pytorch_connectomics_tpu.inference.lazy import (
    LazyVolumeAccessor,
    _resize_linear,
    is_tile_source,
)


def _write_tiles(tmp_path, z=3, grid=(2, 2), tile=(8, 8)):
    """Reference-style directory layout: <z>/<row>_<col>.png sections."""
    from PIL import Image

    rng = np.random.default_rng(0)
    full = rng.integers(0, 255, (z, grid[0] * tile[0], grid[1] * tile[1]), dtype=np.uint8)
    for zi in range(z):
        d = tmp_path / str(zi)
        d.mkdir()
        for r in range(grid[0]):
            for c in range(grid[1]):
                t = full[zi, r * tile[0] : (r + 1) * tile[0], c * tile[1] : (c + 1) * tile[1]]
                Image.fromarray(t).save(d / f"{r}_{c}.png")
    return full


def test_tile_directory_source(tmp_path):
    full = _write_tiles(tmp_path)
    assert is_tile_source(str(tmp_path))
    acc = LazyVolumeAccessor(str(tmp_path), normalize="none")
    assert acc.shape == full.shape
    win = acc.read((slice(1, 3), slice(3, 13), slice(5, 11)))
    np.testing.assert_allclose(win, full[1:3, 3:13, 5:11].astype(np.float32))


def test_tile_spec_json_source(tmp_path):
    from pytorch_connectomics_tpu.data.tiles import write_tile_spec

    full = _write_tiles(tmp_path)
    # our spec format: explicit sections list
    spec = {
        "tile_size": [8, 8],
        "grid": [2, 2],
        "dtype": "uint8",
        "sections": [
            [f"{z}/{r}_{c}.png" for r in range(2) for c in range(2)]
            for z in range(3)
        ],
    }
    import json

    (tmp_path / "vol.json").write_text(json.dumps(spec))
    acc = LazyVolumeAccessor(str(tmp_path / "vol.json"), normalize="none")
    np.testing.assert_allclose(
        acc.read((slice(0, 3), slice(0, 16), slice(0, 16))), full.astype(np.float32)
    )


def test_read_scale_halves_volume(tmp_path):
    import h5py

    vol = np.arange(16 * 20 * 24, dtype=np.float32).reshape(16, 20, 24)
    with h5py.File(tmp_path / "v.h5", "w") as f:
        f["main"] = vol
    acc = LazyVolumeAccessor(str(tmp_path / "v.h5"), normalize="none", scale=(0.5, 0.5, 0.5))
    assert acc.shape == (8, 10, 12)
    got = acc.read_all()
    want = _resize_linear(vol, (8, 10, 12))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # windowed read matches the corresponding window of the full resample
    win = acc.read((slice(2, 6), slice(1, 9), slice(0, 12)))
    assert win.shape == (4, 8, 12)


def test_read_scale_rejects_upscale():
    with pytest.raises(ValueError, match="read scale"):
        LazyVolumeAccessor("random://x?shape=8x8x8", scale=(2.0, 1.0, 1.0))


def test_resize_linear_identity_and_downscale():
    v = np.random.default_rng(1).random((6, 8, 10)).astype(np.float32)
    np.testing.assert_array_equal(_resize_linear(v, v.shape), v)
    half = _resize_linear(v, (3, 4, 5))
    assert half.shape == (3, 4, 5)
    # endpoints preserved by linspace sampling
    np.testing.assert_allclose(half[0, 0, 0], v[0, 0, 0], rtol=1e-6)


def test_engine_acc_dtype_bf16_close_to_f32():
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import SlidingWindowConfig, build_dataclass
    from pytorch_connectomics_tpu.inference.window import make_engine

    def apply_fn(params, x):
        return x * 2.0 + 1.0

    vol = np.random.default_rng(2).random((12, 20, 20)).astype(np.float32)
    cfg32 = build_dataclass(
        SlidingWindowConfig,
        {"window_size": [8, 8, 8], "overlap": 0.5, "sw_batch_size": 2},
    )
    cfg16 = build_dataclass(
        SlidingWindowConfig,
        {"window_size": [8, 8, 8], "overlap": 0.5, "sw_batch_size": 2,
         "acc_dtype": "bfloat16"},
    )
    out32 = make_engine(apply_fn, cfg32, [8, 8, 8])(None, vol)
    out16 = make_engine(apply_fn, cfg16, [8, 8, 8])(None, vol)
    np.testing.assert_allclose(out16, out32, atol=0.05)
    np.testing.assert_allclose(out32[..., 0], vol * 2.0 + 1.0, atol=1e-3)
