"""On-device augmentation: the EM augmentation suite as pure JAX ops that
run INSIDE the jitted train step (batch NDHWC, per-sample keys via vmap).

This is the TPU-native answer to the reference's CPU worker-process
augmentation (SURVEY §7 design stance): geometric ops are gathers/flips with
static shapes, intensity ops are fused elementwise VPU work, and EM-artifact
simulation (missing sections, misalignment, cutout) uses masks computed from
``jax.random`` — all traceable, no host round-trips, negligible step
overhead since XLA fuses them into the input pipeline of the first conv.

Enabled via ``data.augmentation.on_device: true``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.schema import AugmentationConfig

Sample = Dict[str, jnp.ndarray]  # each (Z, Y, X, C)

_GEOM_KEYS = ("image", "label", "mask", "weight")


def _rand(key, p):
    return jax.random.uniform(key) < p


def _flip(sample: Sample, key, prob=0.5, **_) -> Sample:
    ks = jax.random.split(key, 3)
    out = dict(sample)
    for axis, k in zip((0, 1, 2), ks):
        do = _rand(k, prob)
        for name in _GEOM_KEYS:
            if name in out:
                out[name] = jnp.where(do, jnp.flip(out[name], axis=axis), out[name])
    return out


def _rot90(sample: Sample, key, prob=0.5, **_) -> Sample:
    """k*90deg rotation in (y, x); requires square in-plane patches."""
    out = dict(sample)
    do = _rand(jax.random.fold_in(key, 0), prob)
    k = jax.random.randint(jax.random.fold_in(key, 1), (), 1, 4)

    for name in _GEOM_KEYS:
        if name not in out:
            continue
        v = out[name]
        if v.shape[1] != v.shape[2]:
            continue
        rots = [v] + [jnp.rot90(v, i, axes=(1, 2)) for i in (1, 2, 3)]
        rotated = jax.lax.switch(k, [lambda x=r: x for r in rots])
        out[name] = jnp.where(do, rotated, v)
    return out


def _transpose(sample: Sample, key, prob=0.5, **_) -> Sample:
    out = dict(sample)
    do = _rand(key, prob)
    for name in _GEOM_KEYS:
        if name in out and out[name].shape[1] == out[name].shape[2]:
            out[name] = jnp.where(do, jnp.swapaxes(out[name], 1, 2), out[name])
    return out


def _intensity(
    sample: Sample,
    key,
    gaussian_noise_prob=0.5,
    gaussian_noise_std=0.1,
    shift_intensity_prob=0.5,
    shift_intensity_offset=0.1,
    contrast_prob=0.5,
    contrast_range=(0.8, 1.2),
    **_,
) -> Sample:
    out = dict(sample)
    img = out["image"]
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    noise = jax.random.normal(k1, img.shape) * gaussian_noise_std
    img = jnp.where(_rand(k2, gaussian_noise_prob), img + noise, img)
    shift = jax.random.uniform(k3, (), minval=-shift_intensity_offset, maxval=shift_intensity_offset)
    img = jnp.where(_rand(k4, shift_intensity_prob), img + shift, img)
    f = jax.random.uniform(k5, (), minval=contrast_range[0], maxval=contrast_range[1])
    mean = img.mean()
    img = jnp.where(_rand(k6, contrast_prob), (img - mean) * f + mean, img)
    out["image"] = jnp.clip(img, 0.0, 1.0)
    return out


def _gamma(sample: Sample, key, prob=0.3, gamma_range=(0.7, 1.5), **_) -> Sample:
    out = dict(sample)
    g = jax.random.uniform(jax.random.fold_in(key, 0), (), minval=gamma_range[0], maxval=gamma_range[1])
    img = jnp.clip(out["image"], 1e-6, 1.0) ** g
    out["image"] = jnp.where(_rand(jax.random.fold_in(key, 1), prob), img, out["image"])
    return out


def _missing_section(sample: Sample, key, prob=0.3, num_sections=2, **_) -> Sample:
    out = dict(sample)
    img = out["image"]
    z = img.shape[0]
    k1, k2 = jax.random.split(key)
    # choose up to num_sections random z indices to zero
    idx = jax.random.randint(k1, (max(1, num_sections),), 0, z)
    zmask = jnp.ones((z,), img.dtype).at[idx].set(0.0)
    do = _rand(k2, prob)
    out["image"] = jnp.where(do, img * zmask[:, None, None, None], img)
    return out


def _misalignment(sample: Sample, key, prob=0.3, displacement=12, **_) -> Sample:
    """Roll sections above a random z by a random in-plane shift (all keys)."""
    out = dict(sample)
    z = out["image"].shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    zi = jax.random.randint(k1, (), 1, max(2, z))
    dy = jax.random.randint(k2, (), -displacement, displacement + 1)
    dx = jax.random.randint(k3, (), -displacement, displacement + 1)
    do = _rand(k4, prob)
    sec = (jnp.arange(z) >= zi)[:, None, None, None]
    for name in _GEOM_KEYS:
        if name not in out:
            continue
        v = out[name]
        rolled = jnp.roll(v, (dy, dx), axis=(1, 2))
        out[name] = jnp.where(do & sec, rolled, v)
    return out


def _cut_noise(sample: Sample, key, prob=0.2, length_ratio=0.4, scale=0.3, **_) -> Sample:
    out = dict(sample)
    img = out["image"]
    z, y, x, _ = img.shape
    lz, ly, lx = max(1, int(z * length_ratio)), max(1, int(y * length_ratio)), max(1, int(x * length_ratio))
    ks = jax.random.split(key, 5)
    oz = jax.random.randint(ks[0], (), 0, z - lz + 1)
    oy = jax.random.randint(ks[1], (), 0, y - ly + 1)
    ox = jax.random.randint(ks[2], (), 0, x - lx + 1)
    zz = jnp.arange(z)[:, None, None, None]
    yy = jnp.arange(y)[None, :, None, None]
    xx = jnp.arange(x)[None, None, :, None]
    box = (zz >= oz) & (zz < oz + lz) & (yy >= oy) & (yy < oy + ly) & (xx >= ox) & (xx < ox + lx)
    noise = jax.random.uniform(ks[3], img.shape, minval=-scale, maxval=scale)
    do = _rand(ks[4], prob)
    out["image"] = jnp.where(do & box, jnp.clip(img + noise, 0.0, 1.0), img)
    return out


def _missing_parts(sample: Sample, key, prob=0.2, hole_size=24, **_) -> Sample:
    out = dict(sample)
    img = out["image"]
    z, y, x, _ = img.shape
    ks = jax.random.split(key, 4)
    zi = jax.random.randint(ks[0], (), 0, z)
    oy = jax.random.randint(ks[1], (), 0, max(1, y - hole_size))
    ox = jax.random.randint(ks[2], (), 0, max(1, x - hole_size))
    zz = jnp.arange(z)[:, None, None, None]
    yy = jnp.arange(y)[None, :, None, None]
    xx = jnp.arange(x)[None, None, :, None]
    box = (zz == zi) & (yy >= oy) & (yy < oy + hole_size) & (xx >= ox) & (xx < ox + hole_size)
    do = _rand(ks[3], prob)
    out["image"] = jnp.where(do & box, 0.0, img)
    return out


def _mul_add(sample: Sample, key, prob=0.5, mul_range=(0.9, 1.1),
             add_range=(-0.1, 0.1), **_) -> Sample:
    out = dict(sample)
    ks = jax.random.split(key, 3)
    m = jax.random.uniform(ks[0], (), minval=mul_range[0], maxval=mul_range[1])
    a = jax.random.uniform(ks[1], (), minval=add_range[0], maxval=add_range[1])
    do = _rand(ks[2], prob)
    out["image"] = jnp.where(do, jnp.clip(out["image"] * m + a, 0.0, 1.0),
                             out["image"])
    return out


def _stripe(sample: Sample, key, prob=0.1, intensity=0.15, num_stripes=4, **_) -> Sample:
    """Horizontal acquisition stripes: brightness deltas on random y rows."""
    out = dict(sample)
    img = out["image"]
    y = img.shape[1]
    ks = jax.random.split(key, 3)
    rows = jax.random.randint(ks[0], (int(num_stripes),), 0, y)
    deltas = jax.random.uniform(
        ks[1], (int(num_stripes),), minval=-intensity, maxval=intensity
    )
    row_delta = jnp.zeros((y,)).at[rows].add(deltas)
    do = _rand(ks[2], prob)
    out["image"] = jnp.where(
        do, jnp.clip(img + row_delta[None, :, None, None], 0.0, 1.0), img
    )
    return out


def _motion_blur(sample: Sample, key, prob=0.2, sections=2, kernel_size=9, **_) -> Sample:
    """1-D directional blur (x or y) applied to random z sections."""
    out = dict(sample)
    img = out["image"]
    z = img.shape[0]
    k = int(kernel_size)
    ks = jax.random.split(key, 4)
    # box blur via cumulative sums (edge-padded), fused cleanly by XLA
    def box1d(v, axis):
        pad = [(0, 0)] * v.ndim
        pad[axis] = (k // 2, k - 1 - k // 2)
        vp = jnp.pad(v, pad, mode="edge")
        c = jnp.cumsum(vp, axis=axis)
        lead = jax.lax.slice_in_dim(c, k - 1, vp.shape[axis], axis=axis)
        lag = jnp.pad(
            jax.lax.slice_in_dim(c, 0, vp.shape[axis] - k, axis=axis),
            [(1, 0) if d == axis else (0, 0) for d in range(v.ndim)],
        )
        return (lead - lag) / k

    blurred = jnp.where(jax.random.bernoulli(ks[0]), box1d(img, 2), box1d(img, 1))
    zsel = jax.random.randint(ks[1], (int(sections),), 0, z)
    zmask = jnp.zeros((z,), bool).at[zsel].set(True)
    do = _rand(ks[2], prob)
    out["image"] = jnp.where(do & zmask[:, None, None, None], blurred, img)
    return out


def _slice_shift(sample: Sample, key, prob=0.2, max_shift=8, num_slices=2, **_) -> Sample:
    """Roll a few random z slices in (y, x) — stage jitter (image only)."""
    out = dict(sample)
    img = out["image"]
    z = img.shape[0]
    ks = jax.random.split(key, 4)
    zsel = jax.random.randint(ks[0], (int(num_slices),), 0, z)
    zmask = jnp.zeros((z,), bool).at[zsel].set(True)
    sy = jax.random.randint(ks[1], (), -int(max_shift), int(max_shift) + 1)
    sx = jax.random.randint(ks[2], (), -int(max_shift), int(max_shift) + 1)
    rolled = jnp.roll(jnp.roll(img, sy, axis=1), sx, axis=2)
    do = _rand(ks[3], prob)
    out["image"] = jnp.where(do & zmask[:, None, None, None], rolled, img)
    return out


_DEVICE_ORDER: List[Tuple[str, Callable]] = [
    ("flip", _flip),
    ("transpose", _transpose),
    ("rotate", _rot90),
    ("misalignment", _misalignment),
    ("missing_section", _missing_section),
    ("slice_shift", _slice_shift),
    ("missing_parts", _missing_parts),
    ("motion_blur", _motion_blur),
    ("cut_noise", _cut_noise),
    ("stripe", _stripe),
    ("intensity", _intensity),
    ("mul_add", _mul_add),
    ("gamma", _gamma),
]


def build_device_augment_fn(cfg: Optional[AugmentationConfig]):
    """AugmentationConfig -> batched augment(batch NDHWC dict, key) -> batch.

    Only transforms with on-device implementations are applied; the rest
    (elastic, lost-section reindexing, copy-paste) stay in the host pipeline.
    Returns None if nothing is enabled.
    """
    if cfg is None or not cfg.enabled:
        return None
    steps = []
    for name, fn in _DEVICE_ORDER:
        block = getattr(cfg, name, None)
        if not block or not block.get("enabled", True):
            continue
        kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in block.items() if k != "enabled"}
        kwargs.pop("spatial_axes", None)
        steps.append((fn, kwargs))
    if not steps:
        return None

    def augment_one(sample: Sample, key) -> Sample:
        for i, (fn, kwargs) in enumerate(steps):
            sample = fn(sample, jax.random.fold_in(key, i), **kwargs)
        return sample

    def augment_batch(batch: Dict[str, jnp.ndarray], key) -> Dict[str, jnp.ndarray]:
        n = batch["image"].shape[0]
        keys = jax.random.split(key, n)
        return jax.vmap(augment_one)(batch, keys)

    return augment_batch
