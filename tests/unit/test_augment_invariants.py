"""Systematic invariants over the full EM augmentation suite
(reference ``tests/unit/test_em_augmentations.py`` behavior coverage):

- prob=0 is the identity for every op;
- determinism: the same seed produces the same output;
- shape/dtype preservation;
- geometric ops co-transform image and label identically (a label marker
  stays on the same image structure);
- intensity/artifact ops never touch the label;
- value-range sanity for intensity ops.
"""

import numpy as np
import pytest

from pytorch_connectomics_tpu.data.augment import ops

# (name, fn, kwargs forcing the op to fire, needs_other, geometric)
OPS = [
    ("flip", ops.rand_flip, {"prob": 1.0}, False, True),
    ("rotate90", ops.rand_rotate90, {"prob": 1.0}, False, True),
    ("transpose", ops.rand_transpose, {"prob": 1.0}, False, True),
    ("axis_permute", ops.rand_axis_permute, {"prob": 1.0}, False, True),
    ("elastic", ops.rand_elastic, {"prob": 1.0}, False, True),
    ("affine", ops.rand_affine,
     {"prob": 1.0, "rotate_range": (0.3, 0.3, 0.3), "scale_range": (0.1, 0.1, 0.1),
      "shear_range": (0.05, 0.05, 0.05)}, False, True),
    ("misalignment", ops.rand_misalignment, {"prob": 1.0, "displacement": 4}, False, True),
    ("missing_section", ops.rand_missing_section, {"prob": 1.0}, False, False),
    ("lost_section", ops.rand_lost_section, {"prob": 1.0}, False, True),
    ("slice_drop", ops.rand_slice_drop, {"prob": 1.0}, False, False),
    ("slice_shift", ops.rand_slice_shift, {"prob": 1.0, "max_shift": 3}, False, False),
    ("missing_parts", ops.rand_missing_parts, {"prob": 1.0, "hole_size": 6}, False, False),
    ("motion_blur", ops.rand_motion_blur, {"prob": 1.0, "kernel_size": 5}, False, False),
    ("stripe", ops.rand_stripe, {"prob": 1.0}, False, False),
    # rand_intensity has per-component probs rather than one prob knob
    ("intensity", ops.rand_intensity,
     {"gaussian_noise_prob": 1.0, "shift_intensity_prob": 1.0, "contrast_prob": 1.0},
     False, False),
    ("gamma", ops.rand_gamma, {"prob": 1.0}, False, False),
    ("mul_add", ops.rand_mul_add, {"prob": 1.0}, False, False),
    ("cut_blur", ops.rand_cut_blur, {"prob": 1.0}, False, False),
    ("cut_noise", ops.rand_cut_noise, {"prob": 1.0}, False, False),
    ("mixup", ops.rand_mixup, {"prob": 1.0}, True, False),
    ("copy_paste", ops.rand_copy_paste, {"prob": 1.0}, True, False),
]
# ops that rewrite label content by design (geometric or structural)
LABEL_CHANGING = {
    "flip", "rotate90", "transpose", "axis_permute", "elastic", "affine",
    "misalignment", "lost_section", "copy_paste",
}


def _sample(seed=0):
    # fully cubic so axis_permute/transpose preserve shape
    rng = np.random.default_rng(seed)
    shape = (1, 12, 12, 12)
    img = 0.5 * rng.random(shape, dtype=np.float32)
    lbl = np.zeros(shape, np.float32)
    lbl[0, 4:8, 3:9, 3:9] = 1.0
    # marker: bright voxel block exactly under the label (stays in [0,1])
    img[0, 4:8, 3:9, 3:9] += 0.5
    return {"image": img, "label": lbl}


@pytest.mark.parametrize("name,fn,kw,needs_other,geom", OPS, ids=[o[0] for o in OPS])
def test_prob_zero_is_identity(name, fn, kw, needs_other, geom):
    s = _sample()
    kwargs = {k: (0.0 if k == "prob" or k.endswith("_prob") else v) for k, v in kw.items()}
    kwargs.setdefault("prob", 0.0)
    args = {"other": _sample(99)} if needs_other else {}
    out = fn(dict(s), np.random.default_rng(1), **kwargs, **args)
    np.testing.assert_array_equal(out["image"], s["image"])
    np.testing.assert_array_equal(out["label"], s["label"])


@pytest.mark.parametrize("name,fn,kw,needs_other,geom", OPS, ids=[o[0] for o in OPS])
def test_deterministic_and_shape_preserving(name, fn, kw, needs_other, geom):
    s = _sample()
    args = {"other": _sample(99)} if needs_other else {}
    out1 = fn(dict(_sample()), np.random.default_rng(7), **kw, **dict(args))
    out2 = fn(dict(_sample()), np.random.default_rng(7), **kw, **dict(args))
    np.testing.assert_array_equal(out1["image"], out2["image"])
    np.testing.assert_array_equal(out1["label"], out2["label"])
    assert out1["image"].shape == s["image"].shape
    assert out1["label"].shape == s["label"].shape
    assert out1["image"].dtype == np.float32


@pytest.mark.parametrize("name,fn,kw,needs_other,geom", OPS, ids=[o[0] for o in OPS])
def test_label_untouched_by_intensity_ops(name, fn, kw, needs_other, geom):
    if name in LABEL_CHANGING:
        pytest.skip("op transforms labels by design")
    s = _sample()
    args = {"other": _sample(99)} if needs_other else {}
    out = fn(dict(s), np.random.default_rng(3), **kw, **args)
    np.testing.assert_array_equal(out["label"], s["label"])


@pytest.mark.parametrize("name,fn,kw,needs_other,geom",
                         [o for o in OPS if o[4]], ids=[o[0] for o in OPS if o[4]])
def test_geometric_ops_cotransform_image_and_label(name, fn, kw, needs_other, geom):
    """The bright image marker must move WITH the label: the mean image
    intensity inside the transformed label stays far above the outside."""
    s = _sample()
    out = fn(dict(s), np.random.default_rng(11), **kw)
    lbl = out["label"][0] > 0.5
    if not lbl.any():
        pytest.skip("label left the field of view")
    inside = float(out["image"][0][lbl].mean())
    outside = float(out["image"][0][~lbl].mean())
    assert inside > outside + 0.3, f"{name}: marker decoupled from label"


def test_flip_label_voxels_conserved():
    s = _sample()
    out = ops.rand_flip(dict(s), np.random.default_rng(5), prob=1.0)
    assert out["label"].sum() == s["label"].sum()


def test_missing_section_fills_image_only():
    s = _sample()
    out = ops.rand_missing_section(dict(s), np.random.default_rng(0), prob=1.0,
                                   num_sections=2, fill=0.0)
    zero_slices = [z for z in range(12) if (out["image"][0, z] == 0).all()]
    assert len(zero_slices) >= 1
    np.testing.assert_array_equal(out["label"], s["label"])


def test_mixup_blends_values():
    a, b = _sample(0), _sample(42)
    out = ops.rand_mixup(dict(a), np.random.default_rng(1), other=b, prob=1.0)
    assert not np.array_equal(out["image"], a["image"])
    # blend stays within the convex hull of the two inputs
    lo = np.minimum(a["image"], b["image"]) - 1e-6
    hi = np.maximum(a["image"], b["image"]) + 1e-6
    assert ((out["image"] >= lo) & (out["image"] <= hi)).all()


def test_gamma_preserves_range():
    s = _sample()
    s["image"] = np.clip(s["image"], 0, 1)
    out = ops.rand_gamma(dict(s), np.random.default_rng(2), prob=1.0)
    assert out["image"].min() >= -1e-6 and out["image"].max() <= 1.0 + 1e-6


def test_cut_blur_region_only():
    s = _sample()
    out = ops.rand_cut_blur(dict(s), np.random.default_rng(4), prob=1.0,
                            length_ratio=0.3)
    diff = (out["image"] != s["image"])[0]
    assert diff.any()
    # the cut region is a box: changed voxels fit inside their bbox tightly
    zz, yy, xx = np.where(diff)
    box = (zz.max() - zz.min() + 1) * (yy.max() - yy.min() + 1) * (xx.max() - xx.min() + 1)
    assert diff.sum() >= 0.5 * box


def test_on_device_extended_ops_match_host_semantics():
    """New on-device ops (mul_add/stripe/motion_blur/slice_shift) compile
    under jit, change only the image, and keep values finite/in-range."""
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.ops.augment_jax import (
        _motion_blur,
        _mul_add,
        _slice_shift,
        _stripe,
    )

    img = jnp.asarray(np.random.default_rng(0).random((6, 16, 16, 1), dtype=np.float32))
    lbl = jnp.ones_like(img)
    for fn, kw in [
        (_mul_add, {"prob": 1.0}),
        (_stripe, {"prob": 1.0}),
        (_motion_blur, {"prob": 1.0, "kernel_size": 5}),
        (_slice_shift, {"prob": 1.0, "max_shift": 3}),
    ]:
        out = jax.jit(lambda s, k: fn(s, k, **kw))(
            {"image": img, "label": lbl}, jax.random.PRNGKey(1)
        )
        assert out["image"].shape == img.shape
        assert not np.array_equal(np.asarray(out["image"]), np.asarray(img))
        np.testing.assert_array_equal(np.asarray(out["label"]), np.asarray(lbl))
        assert np.isfinite(np.asarray(out["image"])).all()


def test_motion_blur_box_kernel_matches_scipy():
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from pytorch_connectomics_tpu.ops.augment_jax import _motion_blur

    img = np.random.default_rng(2).random((2, 1, 24, 1), dtype=np.float32)
    ref_x = ndimage.uniform_filter1d(img, 5, axis=2, mode="nearest")
    ref_y = ndimage.uniform_filter1d(img, 5, axis=1, mode="nearest")
    matched = False
    for seed in range(8):
        out = np.asarray(
            _motion_blur(
                {"image": jnp.asarray(img)}, jax.random.PRNGKey(seed),
                prob=1.0, sections=2, kernel_size=5,
            )["image"]
        )
        per_slice_ok = all(
            np.allclose(out[z], ref_x[z], atol=1e-5)
            or np.allclose(out[z], ref_y[z], atol=1e-5)
            or np.allclose(out[z], img[z])
            for z in range(img.shape[0])
        )
        assert per_slice_ok
        if not np.array_equal(out, img):
            matched = True
    assert matched


def test_slice_shift_nowrap_zero_fills_instead_of_wrapping():
    """wrap=False bounds the shift with zero fill (reference RandSliceShiftd's
    wrap=False mode); the opposite edge must NOT leak into the shifted slice."""
    img = np.ones((1, 4, 8, 8), np.float32)
    s = {"image": img, "label": np.zeros_like(img)}
    rng = np.random.default_rng(3)
    out = ops.rand_slice_shift(
        dict(s), rng, prob=1.0, max_shift=3, num_slices=4, wrap=False
    )
    changed = np.any(out["image"] != 1.0, axis=(0, 2, 3))
    assert changed.any()  # at least one slice got a nonzero shift
    for zi in np.nonzero(changed)[0]:
        sl = out["image"][0, zi]
        # a bounded shift of an all-ones slice zero-fills the vacated band
        assert set(np.unique(sl).tolist()) <= {0.0, 1.0}
        assert (sl == 0.0).any()
    # wrap=True on an all-ones slice is the identity (roll of constant)
    out_w = ops.rand_slice_shift(
        dict(s), np.random.default_rng(3), prob=1.0, max_shift=3, num_slices=4
    )
    np.testing.assert_array_equal(out_w["image"], img)


def test_slice_shift_reference_knobs():
    """slice_prob (per-slice Bernoulli), spatial_axis sampling, and the
    shift_magnitude alias all behave per reference RandSliceShiftd."""
    rng0 = np.random.default_rng(0)
    img = rng0.random((1, 10, 10, 10), dtype=np.float32)
    s = {"image": img, "label": np.zeros_like(img)}
    # slice_prob=1 with mag 0 on every axis is the identity
    out = ops.rand_slice_shift(
        dict(s), np.random.default_rng(1), prob=1.0, slice_prob=1.0,
        shift_magnitude=0, spatial_axis=(0, 1, 2),
    )
    np.testing.assert_array_equal(out["image"], img)
    # spatial_axis=2 shifts x-slices: every yz-plane is a permutation of the
    # original plane's voxels (wrap=roll), and some plane must change
    out = ops.rand_slice_shift(
        dict(s), np.random.default_rng(2), prob=1.0, slice_prob=1.0,
        shift_magnitude=3, spatial_axis=2,
    )
    assert not np.array_equal(out["image"], img)
    for xi in range(img.shape[3]):
        np.testing.assert_allclose(
            np.sort(out["image"][0, :, :, xi], axis=None),
            np.sort(img[0, :, :, xi], axis=None),
        )
    # label is never touched (image-only op, reference keys=["image"])
    np.testing.assert_array_equal(out["label"], s["label"])


def test_affine_label_nearest_stays_binary():
    """Labels go through nearest-neighbor resampling — a binary label must
    stay binary under an arbitrary affine (reference: per-key 'nearest')."""
    s = _sample()
    out = ops.rand_affine(
        dict(s), np.random.default_rng(1), prob=1.0,
        rotate_range=(0.4, 0.2, 0.2), scale_range=(0.1, 0.1, 0.1),
    )
    assert set(np.unique(out["label"]).tolist()) <= {0.0, 1.0}
    assert not np.array_equal(out["label"], s["label"])
