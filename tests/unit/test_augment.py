"""Augmentation tests: host numpy suite + on-device JAX suite
(reference tests/unit/test_em_augmentations.py philosophy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_connectomics_tpu.config.schema import AugmentationConfig, build_dataclass
from pytorch_connectomics_tpu.data.augment import build_augmentation_fn
from pytorch_connectomics_tpu.data.augment import ops as A
from pytorch_connectomics_tpu.ops.augment_jax import build_device_augment_fn


def sample(shape=(1, 8, 16, 16)):
    rng = np.random.default_rng(0)
    return {
        "image": rng.random(shape).astype(np.float32),
        "label": (rng.random(shape) > 0.5).astype(np.float32),
    }


def test_flip_consistency_image_label():
    s = sample()
    rng = np.random.default_rng(1)
    out = A.rand_flip(s, rng, prob=1.0, axes=(3,))
    np.testing.assert_allclose(out["image"], s["image"][:, :, :, ::-1])
    np.testing.assert_allclose(out["label"], s["label"][:, :, :, ::-1])


def test_rotate90_shapes():
    s = sample()
    out = A.rand_rotate90(s, np.random.default_rng(2), prob=1.0)
    assert out["image"].shape == s["image"].shape


def test_misalignment_shifts_upper_sections():
    s = sample()
    out = A.rand_misalignment(s, np.random.default_rng(3), prob=1.0, displacement=4)
    # first section untouched
    np.testing.assert_allclose(out["image"][:, 0], s["image"][:, 0])
    assert not np.allclose(out["image"][:, -1], s["image"][:, -1])


def test_missing_section_zeroes_image_only():
    s = sample()
    out = A.rand_missing_section(s, np.random.default_rng(4), prob=1.0, num_sections=2)
    zero_slices = [(out["image"][0, z] == 0).all() for z in range(8)]
    assert any(zero_slices)
    np.testing.assert_allclose(out["label"], s["label"])  # label untouched


def test_lost_section_keeps_shape_and_alignment():
    s = sample()
    out = A.rand_lost_section(s, np.random.default_rng(5), prob=1.0, num_sections=1)
    assert out["image"].shape == s["image"].shape
    assert out["label"].shape == s["label"].shape


def test_elastic_label_stays_binary():
    s = sample()
    out = A.rand_elastic(s, np.random.default_rng(6), prob=1.0, sigma=4.0, alpha=8.0)
    assert set(np.unique(out["label"])) <= {0.0, 1.0}  # nearest-neighbor interp


def test_cut_blur_region_changed():
    s = sample((1, 8, 32, 32))
    out = A.rand_cut_blur(s, np.random.default_rng(7), prob=1.0)
    assert not np.allclose(out["image"], s["image"])


def test_intensity_clip_range():
    s = sample()
    out = A.rand_intensity(s, np.random.default_rng(8), gaussian_noise_prob=1.0, gaussian_noise_std=0.5)
    assert out["image"].min() >= 0.0 and out["image"].max() <= 1.0


def test_builder_from_config_deterministic():
    cfg = build_dataclass(
        AugmentationConfig,
        {
            "flip": {"enabled": True, "prob": 0.5},
            "intensity": {"enabled": True, "gaussian_noise_prob": 0.5},
            "misalignment": {"enabled": True, "prob": 0.5, "displacement": 4},
        },
    )
    fn = build_augmentation_fn(cfg)
    s = sample()
    a = fn(dict(s), np.random.default_rng(42))
    b = fn(dict(s), np.random.default_rng(42))
    np.testing.assert_allclose(a["image"], b["image"])


def test_device_augment_runs_under_jit():
    cfg = build_dataclass(
        AugmentationConfig,
        {
            "on_device": True,
            "flip": {"enabled": True, "prob": 0.5},
            "intensity": {"enabled": True},
            "misalignment": {"enabled": True, "prob": 0.5, "displacement": 2},
            "missing_section": {"enabled": True, "prob": 0.5},
            "cut_noise": {"enabled": True, "prob": 0.5},
        },
    )
    fn = build_device_augment_fn(cfg)
    batch = {
        "image": jnp.asarray(np.random.rand(4, 8, 16, 16, 1), jnp.float32),
        "label": jnp.asarray((np.random.rand(4, 8, 16, 16, 1) > 0.5), jnp.float32),
    }
    out = jax.jit(fn)(batch, jax.random.PRNGKey(0))
    assert out["image"].shape == batch["image"].shape
    assert np.isfinite(np.asarray(out["image"])).all()
    # deterministic per key
    out2 = jax.jit(fn)(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(out2["image"]))
    out3 = jax.jit(fn)(batch, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out["image"]), np.asarray(out3["image"]))


def test_device_flip_moves_label_with_image():
    cfg = build_dataclass(AugmentationConfig, {"on_device": True, "flip": {"enabled": True, "prob": 1.0}})
    fn = build_device_augment_fn(cfg)
    img = np.zeros((1, 2, 4, 4, 1), np.float32)
    img[0, 0, 0, 0, 0] = 1.0
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(img.copy())}
    out = fn(batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out["image"]), np.asarray(out["label"]))


def test_misalignment_zero_fills_no_wraparound():
    """The vacated strip must be zero-filled, not wrapped from the opposite
    edge (reference shift_2d, augment_ops.py:49-58)."""
    s = sample()
    s["image"] = np.ones_like(s["image"])
    rng = np.random.default_rng(0)
    found_fill = False
    for seed in range(20):
        out = A.rand_misalignment(
            sample() | {"image": np.ones_like(s["image"])},
            np.random.default_rng(seed), prob=1.0, displacement=4, rotate_ratio=0.0,
        )
        img = out["image"]
        if not np.allclose(img, 1.0):
            # shifted sections contain an all-zero border strip; a wraparound
            # roll of an all-ones volume would have stayed all ones
            assert img.min() == 0.0
            found_fill = True
            break
    assert found_fill, "no nonzero displacement drawn in 20 seeds"
