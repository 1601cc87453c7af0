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
    p = save_visualization(tmp_path, step=7, batch=batch, outputs=out)
    assert p.exists() and p.suffix == ".png" and p.stat().st_size > 0
