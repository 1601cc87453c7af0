"""EM augmentation kernels (numpy, host-side).

Reimplements the reference's 20-transform EM augmentation suite
(``connectomics/data/augmentation/transforms.py:45-1290`` and numpy kernels
in ``augment_ops.py:61-552``): geometric (flip/rot90/transpose/elastic),
EM-artifact simulation (misalignment, missing/lost sections, missing parts,
motion blur, stripes), intensity (noise/shift/contrast/gamma), and mixing
(cutblur/cutnoise/mixup/copy-paste).

All kernels operate on dict samples ``{"image": (C,Z,Y,X) float32,
"label": (C,Z,Y,X), ...}`` and take an ``np.random.Generator``. Geometric ops
apply consistently to image+label; intensity ops touch the image only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

Sample = Dict[str, np.ndarray]

_GEOM_KEYS = ("image", "label", "mask", "label_aux", "weight")


def _img(s: Sample) -> np.ndarray:
    return s["image"]


def _geom_apply(sample: Sample, fn) -> Sample:
    out = dict(sample)
    for k in _GEOM_KEYS:
        if k in out and out[k] is not None:
            interp = k == "image"
            out[k] = fn(out[k], interp)
    return out


# -- geometric --------------------------------------------------------------


def rand_flip(sample: Sample, rng, prob=0.5, axes=(1, 2, 3)) -> Sample:
    flips = [a for a in axes if rng.random() < prob]
    if not flips:
        return sample
    return _geom_apply(sample, lambda v, _: np.flip(v, axis=[a for a in flips if a < v.ndim]).copy())


def rand_rotate90(sample: Sample, rng, prob=0.5, spatial_axes=(1, 2)) -> Sample:
    """Rotate k*90deg in the (y,x) plane (axes are spatial indices, +1 for C)."""
    if rng.random() >= prob:
        return sample
    k = int(rng.integers(1, 4))
    ax = tuple(a + 1 for a in spatial_axes)  # C-first layout
    return _geom_apply(sample, lambda v, _: np.rot90(v, k, axes=ax).copy())


def rand_transpose(sample: Sample, rng, prob=0.5) -> Sample:
    """Swap y/x axes (valid when patch is square in-plane)."""
    if rng.random() >= prob:
        return sample
    return _geom_apply(sample, lambda v, _: np.swapaxes(v, 2, 3).copy())


def rand_axis_permute(sample: Sample, rng, prob=0.5) -> Sample:
    """Permute all three spatial axes (isotropic volumes only;
    reference ``RandAxisPermuted:45``)."""
    if rng.random() >= prob:
        return sample
    perm = rng.permutation(3)
    full = (0,) + tuple(int(p) + 1 for p in perm)
    return _geom_apply(sample, lambda v, _: np.transpose(v, full).copy())


def rand_elastic(sample: Sample, rng, prob=0.3, sigma=16.0, alpha=20.0) -> Sample:
    """In-plane elastic deformation, same field for all z-slices
    (reference ``RandElasticd:1257``)."""
    if rng.random() >= prob:
        return sample
    c, z, y, x = _img(sample).shape
    dy = ndimage.gaussian_filter(rng.standard_normal((y, x)), sigma) * alpha
    dx = ndimage.gaussian_filter(rng.standard_normal((y, x)), sigma) * alpha
    yy, xx = np.meshgrid(np.arange(y), np.arange(x), indexing="ij")
    coords = [np.clip(yy + dy, 0, y - 1), np.clip(xx + dx, 0, x - 1)]

    def warp(v, interp):
        order = 1 if interp else 0
        out = np.empty_like(v)
        for ci in range(v.shape[0]):
            for zi in range(v.shape[1]):
                out[ci, zi] = ndimage.map_coordinates(
                    v[ci, zi], coords, order=order, mode="reflect"
                )
        return out

    return _geom_apply(sample, warp)


def rand_affine(
    sample: Sample,
    rng,
    prob=0.2,
    rotate_range=(0.0, 0.0, 0.0),
    scale_range=(0.0, 0.0, 0.0),
    shear_range=(0.0, 0.0, 0.0),
) -> Sample:
    """Continuous 3-D affine: per-axis rotation angles U(-r, r) in radians,
    scale jitter 1 + U(-s, s), shear coefficients U(-h, h); image bilinear,
    labels nearest, reflection padding (reference ``build.py:826-852`` /
    MONAI RandAffined semantics)."""
    if rng.random() >= prob:
        return sample
    rot = [float(rng.uniform(-r, r)) if r else 0.0 for r in rotate_range]
    scl = [1.0 + (float(rng.uniform(-s, s)) if s else 0.0) for s in scale_range]
    shr = [float(rng.uniform(-h, h)) if h else 0.0 for h in shear_range]

    def _rot(angle: float, axis: int) -> np.ndarray:
        m = np.eye(3)
        if angle:
            i, j = [a for a in range(3) if a != axis]
            c, s = np.cos(angle), np.sin(angle)
            m[i, i] = c
            m[i, j] = -s
            m[j, i] = s
            m[j, j] = c
        return m

    shear = np.eye(3)
    shear[0, 1], shear[0, 2], shear[1, 2] = shr
    mat = _rot(rot[0], 0) @ _rot(rot[1], 1) @ _rot(rot[2], 2) @ shear @ np.diag(scl)

    def apply(v, interp):
        order = 1 if interp else 0
        out = np.empty_like(v)
        center = (np.asarray(v.shape[1:], np.float64) - 1.0) / 2.0
        offset = center - mat @ center
        for ci in range(v.shape[0]):
            out[ci] = ndimage.affine_transform(
                v[ci], mat, offset=offset, order=order, mode="reflect"
            )
        return out

    return _geom_apply(sample, apply)


# -- EM artifact simulation --------------------------------------------------


def rand_misalignment(sample: Sample, rng, prob=0.3, displacement=12, rotate_ratio=0.0) -> Sample:
    """Translate (or slightly rotate) all sections above a random z
    (reference ``RandMisAlignmentd:332``)."""
    if rng.random() >= prob:
        return sample
    c, z, y, x = _img(sample).shape
    if z < 2:
        return sample
    zi = int(rng.integers(1, z))
    do_rotate = rng.random() < rotate_ratio

    if do_rotate:
        angle = float(rng.uniform(-5.0, 5.0))

        def shift(v, interp):
            out = v.copy()
            order = 1 if interp else 0
            for ci in range(v.shape[0]):
                out[ci, zi:] = ndimage.rotate(
                    v[ci, zi:], angle, axes=(1, 2), reshape=False, order=order, mode="reflect"
                )
            return out
    else:
        dy = int(rng.integers(-displacement, displacement + 1))
        dx = int(rng.integers(-displacement, displacement + 1))

        def shift(v, interp):
            # bounded shift with zero fill (reference shift_2d,
            # augment_ops.py:49-58) — np.roll would wrap the opposite edge
            # into the shifted sections, an artifact no microscope produces
            out = v.copy()
            h, w = v.shape[2], v.shape[3]
            moved = np.zeros_like(v[:, zi:])
            sy = slice(max(0, -dy), min(h, h - dy))
            sx = slice(max(0, -dx), min(w, w - dx))
            ty = slice(max(0, dy), min(h, h + dy))
            tx = slice(max(0, dx), min(w, w + dx))
            moved[:, :, ty, tx] = v[:, zi:, sy, sx]
            out[:, zi:] = moved
            return out

    return _geom_apply(sample, shift)


def rand_missing_section(sample: Sample, rng, prob=0.3, num_sections=2, fill=0.0) -> Sample:
    """Zero out random z sections — image only
    (reference ``RandMissingSectiond:410``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample)
    z = img.shape[1]
    n = int(rng.integers(1, num_sections + 1))
    out = dict(sample)
    im = img.copy()
    for zi in rng.choice(z, size=min(n, z), replace=False):
        im[:, zi] = fill
    out["image"] = im
    return out


def rand_lost_section(sample: Sample, rng, prob=0.2, num_sections=1) -> Sample:
    """Delete sections and duplicate neighbors to keep shape — applied to all
    keys so image/label stay aligned (reference ``RandLostSectiond:502``)."""
    if rng.random() >= prob:
        return sample
    z = _img(sample).shape[1]
    if z <= num_sections + 1:
        return sample
    n = int(rng.integers(1, num_sections + 1))
    drop = np.sort(rng.choice(np.arange(1, z), size=min(n, z - 1), replace=False))
    keep = np.array([i for i in range(z) if i not in set(drop.tolist())])
    idx = np.concatenate([keep, np.repeat(keep[-1], z - len(keep))])

    return _geom_apply(sample, lambda v, _: v[:, idx].copy())


def rand_slice_drop(sample: Sample, rng, prob=0.2, num_slices=2, fill="neighbor") -> Sample:
    """Replace random slices with a neighbor copy (reference ``RandSliceDropd:137``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample).copy()
    z = img.shape[1]
    for zi in rng.choice(z, size=min(num_slices, z), replace=False):
        src = max(0, zi - 1) if zi > 0 else min(z - 1, zi + 1)
        img[:, zi] = img[:, src]
    out = dict(sample)
    out["image"] = img
    return out


def rand_slice_shift(
    sample: Sample,
    rng,
    prob=0.2,
    max_shift=8,
    num_slices=2,
    wrap=True,
    slice_prob=None,
    spatial_axis=None,
    shift_magnitude=None,
) -> Sample:
    """Shift individual slices in-plane — image only
    (reference ``RandSliceShiftd:207``). Parity knobs: ``wrap`` matches its
    wrap default (``wrap=False`` = bounded shift, zero fill); ``slice_prob``
    switches slice selection from a fixed ``num_slices`` count to the
    reference's per-slice Bernoulli; ``spatial_axis`` (int or candidate
    tuple, 0=z/1=y/2=x) samples the slicing axis instead of the z default;
    ``shift_magnitude`` is the reference's name for ``max_shift``."""
    if rng.random() >= prob:
        return sample
    mag = int(max_shift if shift_magnitude is None else shift_magnitude)
    img = _img(sample).copy()
    if spatial_axis is None:
        axis = 0
    elif isinstance(spatial_axis, (int, np.integer)):
        axis = int(spatial_axis)
    else:
        axis = int(rng.choice(list(spatial_axis)))
    sa = axis + 1  # volume axis -> array axis (channel first)
    depth = img.shape[sa]
    if slice_prob is not None:
        sel = np.nonzero(rng.random(depth) < slice_prob)[0]
    else:
        sel = rng.choice(depth, size=min(num_slices, depth), replace=False)
    for zi in sel:
        idx = [slice(None)] * 4
        idx[sa] = int(zi)
        plane = img[tuple(idx)]  # (c, A, B): the two remaining spatial axes
        d0 = int(rng.integers(-mag, mag + 1))
        d1 = int(rng.integers(-mag, mag + 1))
        if wrap:
            img[tuple(idx)] = np.roll(plane, (d0, d1), axis=(1, 2))
        else:
            h, w = plane.shape[1], plane.shape[2]
            moved = np.zeros_like(plane)
            s0 = slice(max(0, -d0), min(h, h - d0))
            s1 = slice(max(0, -d1), min(w, w - d1))
            t0 = slice(max(0, d0), min(h, h + d0))
            t1 = slice(max(0, d1), min(w, w + d1))
            moved[:, t0, t1] = plane[:, s0, s1]
            img[tuple(idx)] = moved
    out = dict(sample)
    out["image"] = img
    return out


def rand_missing_parts(sample: Sample, rng, prob=0.2, hole_size=24, num_holes=1) -> Sample:
    """Zero random cuboid holes in the image (reference ``RandMissingPartsd:568``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample).copy()
    _, z, y, x = img.shape
    for _ in range(num_holes):
        zi = int(rng.integers(0, z))
        hy = int(rng.integers(hole_size // 2, hole_size + 1))
        hx = int(rng.integers(hole_size // 2, hole_size + 1))
        oy = int(rng.integers(0, max(1, y - hy)))
        ox = int(rng.integers(0, max(1, x - hx)))
        img[:, zi, oy : oy + hy, ox : ox + hx] = 0.0
    out = dict(sample)
    out["image"] = img
    return out


def rand_motion_blur(sample: Sample, rng, prob=0.2, sections=2, kernel_size=9) -> Sample:
    """1-D directional blur on random sections (reference ``RandMotionBlurd:628``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample).copy()
    z = img.shape[1]
    horizontal = rng.random() < 0.5
    k = np.ones(kernel_size, dtype=np.float32) / kernel_size
    for zi in rng.choice(z, size=min(sections, z), replace=False):
        axis = 2 if horizontal else 1  # within (C, Y, X) slice -> 1=y 2=x
        img[:, zi] = ndimage.convolve1d(img[:, zi], k, axis=axis, mode="reflect")
    out = dict(sample)
    out["image"] = img
    return out


def rand_stripe(sample: Sample, rng, prob=0.1, intensity=0.15, num_stripes=4) -> Sample:
    """Additive vertical/horizontal stripes (charging artifacts;
    reference ``RandStriped:1119``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample).copy()
    _, z, y, x = img.shape
    vertical = rng.random() < 0.5
    for _ in range(num_stripes):
        a = float(rng.uniform(-intensity, intensity))
        if vertical:
            xi = int(rng.integers(0, x))
            img[..., xi] += a
        else:
            yi = int(rng.integers(0, y))
            img[..., yi, :] += a
    out = dict(sample)
    out["image"] = np.clip(img, 0.0, 1.0)
    return out


# -- intensity ---------------------------------------------------------------


def rand_intensity(
    sample: Sample,
    rng,
    gaussian_noise_prob=0.5,
    gaussian_noise_std=0.1,
    shift_intensity_prob=0.5,
    shift_intensity_offset=0.1,
    contrast_prob=0.5,
    contrast_range=(0.8, 1.2),
    invert_prob=0.0,
    **_,
) -> Sample:
    img = _img(sample).astype(np.float32).copy()
    if rng.random() < gaussian_noise_prob:
        img = img + rng.normal(0, gaussian_noise_std, img.shape).astype(np.float32)
    if rng.random() < shift_intensity_prob:
        img = img + float(rng.uniform(-shift_intensity_offset, shift_intensity_offset))
    if rng.random() < contrast_prob:
        f = float(rng.uniform(*contrast_range))
        img = (img - img.mean()) * f + img.mean()
    if invert_prob and rng.random() < invert_prob:
        img = 1.0 - img
    out = dict(sample)
    out["image"] = np.clip(img, 0.0, 1.0)
    return out


def rand_gamma(sample: Sample, rng, prob=0.3, gamma_range=(0.7, 1.5)) -> Sample:
    if rng.random() >= prob:
        return sample
    g = float(rng.uniform(*gamma_range))
    out = dict(sample)
    out["image"] = np.clip(_img(sample), 0.0, 1.0) ** g
    return out


def rand_mul_add(sample: Sample, rng, prob=0.5, mul_range=(0.9, 1.1), add_range=(-0.1, 0.1)) -> Sample:
    """Per-patch multiplicative+additive jitter (reference ``RandMulAddIntensityd:284``)."""
    if rng.random() >= prob:
        return sample
    out = dict(sample)
    m = float(rng.uniform(*mul_range))
    a = float(rng.uniform(*add_range))
    out["image"] = np.clip(_img(sample) * m + a, 0.0, 1.0)
    return out


# -- mixing ------------------------------------------------------------------


def rand_cut_blur(sample: Sample, rng, prob=0.2, length_ratio=0.4, down_ratio=(2, 8)) -> Sample:
    """Downsample-upsample a random cuboid (reference ``RandCutBlurd:760``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample).copy()
    _, z, y, x = img.shape
    ly, lx = max(2, int(y * length_ratio)), max(2, int(x * length_ratio))
    oy, ox = int(rng.integers(0, y - ly + 1)), int(rng.integers(0, x - lx + 1))
    d = int(rng.integers(down_ratio[0], down_ratio[1] + 1))
    region = img[:, :, oy : oy + ly, ox : ox + lx]
    small = region[:, :, ::d, ::d]
    up = np.repeat(np.repeat(small, d, axis=2), d, axis=3)[:, :, :ly, :lx]
    img[:, :, oy : oy + ly, ox : ox + lx] = up
    out = dict(sample)
    out["image"] = img
    return out


def rand_cut_noise(sample: Sample, rng, prob=0.2, length_ratio=0.4, scale=0.3) -> Sample:
    """Add noise inside a random cuboid (reference ``RandCutNoised:710``)."""
    if rng.random() >= prob:
        return sample
    img = _img(sample).copy()
    _, z, y, x = img.shape
    lz = max(1, int(z * length_ratio))
    ly, lx = max(2, int(y * length_ratio)), max(2, int(x * length_ratio))
    oz = int(rng.integers(0, z - lz + 1))
    oy, ox = int(rng.integers(0, y - ly + 1)), int(rng.integers(0, x - lx + 1))
    sl = (slice(None), slice(oz, oz + lz), slice(oy, oy + ly), slice(ox, ox + lx))
    img[sl] = np.clip(img[sl] + rng.uniform(-scale, scale, img[sl].shape), 0.0, 1.0)
    out = dict(sample)
    out["image"] = img
    return out


def rand_mixup(sample: Sample, rng, other: Optional[Sample] = None, prob=0.2, alpha=0.7) -> Sample:
    """Blend image with a second sample's image; labels keep the primary
    (EM mixup convention, reference ``RandMixupd:828``)."""
    if other is None or rng.random() >= prob:
        return sample
    lam = float(rng.uniform(alpha, 1.0))
    out = dict(sample)
    out["image"] = lam * _img(sample) + (1 - lam) * _img(other)
    return out


def rand_copy_paste(sample: Sample, rng, other: Optional[Sample] = None, prob=0.2) -> Sample:
    """Paste foreground objects of another sample into this one
    (reference ``RandCopyPasted:883``)."""
    if other is None or "label" not in other or "label" not in sample:
        return sample
    if rng.random() >= prob:
        return sample
    fg = other["label"][0] > 0
    if not fg.any():
        return sample
    out = dict(sample)
    img = _img(sample).copy()
    lbl = sample["label"].copy()
    img[:, fg] = _img(other)[:, fg]
    offset = lbl.max() + 1
    lbl[:, fg] = other["label"][:, fg] + (offset if lbl.dtype != np.float32 else 0)
    out["image"], out["label"] = img, lbl
    return out
