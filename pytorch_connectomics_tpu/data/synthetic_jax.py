"""On-device synthetic EM volume generator (JAX).

Produces Lucchi++-style mitochondria segmentation tasks entirely on the
accelerator — no host<->device volume transfer (the dev TPU tunnel moves
~1 MB/s, CLAUDE.md). Used by the quality benchmark
(``scripts/train_lucchi_synthetic_tpu.py``, ``just quality``) to train and
evaluate the FULL pipeline (train -> sliding-window/TTA inference -> eval)
when the real Lucchi++ volumes cannot reach the host.

Image model (EM-like appearance):
- mitochondria: smooth random-field blobs with darker, textured interiors
  and a dark membrane rim (gradient shell), like OsO4-stained cristae;
- distractor organelles: an INDEPENDENT blob field that darkens the image
  but is NOT in the label -> the model must learn texture, not threshold;
- cytoplasm: band-passed granular texture;
- low-frequency intensity inhomogeneity (stage/beam gain) and per-slice
  brightness jitter (z-anisotropy of serial sectioning);
- Gaussian sensor noise.

Reference task: Lucchi++ binary mito segmentation (reference README.md:42,
``tutorials/mito_lucchi++``)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _smooth_field(key, shape: Tuple[int, int, int], feature_voxels: float) -> jnp.ndarray:
    """Smooth random field in [0, 1]: low-res normal noise upsampled."""
    low = tuple(max(2, int(round(s / feature_voxels))) for s in shape)
    noise = jax.random.normal(key, low, jnp.float32)
    field = jax.image.resize(noise, shape, method="cubic")
    lo = jnp.percentile(field, 2.0)
    hi = jnp.percentile(field, 98.0)
    return jnp.clip((field - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


def _band_noise(key, shape, feature_voxels: float, amp: float) -> jnp.ndarray:
    return amp * (2.0 * _smooth_field(key, shape, feature_voxels) - 1.0)


@partial(jax.jit, static_argnames=("shape", "mito_fraction"))
def synthetic_em_volume(
    key: jax.Array,
    shape: Tuple[int, int, int] = (64, 256, 256),
    mito_fraction: float = 0.12,
):
    """Returns (image float32 [0,1] (Z,Y,X), label uint8 (Z,Y,X))."""
    ks = jax.random.split(key, 8)
    # --- mitochondria blobs (the labeled class) ---
    mito_field = _smooth_field(ks[0], shape, feature_voxels=22.0)
    thr = jnp.percentile(mito_field, 100.0 * (1.0 - mito_fraction))
    mito = mito_field > thr
    # membrane rim: shell where the field is just below threshold
    rim = (mito_field > thr - 0.035) & ~mito
    # cristae texture inside mitochondria (fine anisotropic bands)
    cristae = _smooth_field(ks[1], shape, feature_voxels=4.0)
    # --- distractor organelles: near-identical appearance, NOT labeled ---
    # (interior intensity/texture overlaps the mito distribution; the main
    # discriminative cues are the rim contrast and texture scale, so a
    # thresholding shortcut cannot solve the task)
    distract_field = _smooth_field(ks[2], shape, feature_voxels=14.0)
    dthr = jnp.percentile(distract_field, 91.0)
    distract = distract_field > dthr
    drim = (distract_field > dthr - 0.030) & ~distract
    dtex = _smooth_field(ks[7], shape, feature_voxels=7.0)
    # --- compose intensity ---
    img = jnp.full(shape, 0.70, jnp.float32)
    img = img + _band_noise(ks[3], shape, feature_voxels=9.0, amp=0.08)  # cytoplasm
    img = jnp.where(mito, 0.45 + 0.16 * cristae, img)  # dark textured interior
    img = jnp.where(rim, 0.22, img)  # membrane
    img = jnp.where(distract & ~mito & ~rim, 0.47 + 0.15 * dtex, img)
    img = jnp.where(drim & ~mito & ~rim & ~distract, 0.34, img)  # weaker rim
    # low-frequency gain + per-slice jitter + sensor noise
    img = img * (1.0 + _band_noise(ks[4], shape, feature_voxels=90.0, amp=0.10))
    slice_gain = 1.0 + 0.05 * jax.random.normal(ks[5], (shape[0], 1, 1))
    img = img * slice_gain
    img = img + 0.06 * jax.random.normal(ks[6], shape)
    return jnp.clip(img, 0.0, 1.0), mito.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("shape", "mito_fraction"))
def synthetic_em_volume_v2(
    key: jax.Array,
    shape: Tuple[int, int, int] = (64, 256, 256),
    mito_fraction: float = 0.12,
):
    """Harder, non-saturating variant of the synthetic task (v2).

    v1 saturated (Jaccard 0.9966 at 800 steps, QUALITY.md) because the
    distractor organelles differ from mitochondria in feature scale AND
    interior intensity AND rim contrast. v2 removes the shortcuts:

    - distractors share the mito feature scale, interior intensity, and rim
      darkness; the ONLY reliable cue is texture frequency (mito cristae
      are fine ~3.5-voxel bands, distractor interiors are smooth ~11-voxel);
    - serial-section artifacts: per-slice (y, x) misalignment jitter and a
      blanked (missing) section, like the reference's EM defect
      augmentations (``data/augmentation/augment_ops.py`` misalignment /
      missing-section);
    - stronger sensor noise and lower rim contrast.

    Returns (image float32 [0,1] (Z,Y,X), label uint8 (Z,Y,X))."""
    ks = jax.random.split(key, 10)
    mito_field = _smooth_field(ks[0], shape, feature_voxels=22.0)
    thr = jnp.percentile(mito_field, 100.0 * (1.0 - mito_fraction))
    mito = mito_field > thr
    rim = (mito_field > thr - 0.035) & ~mito
    cristae = _smooth_field(ks[1], shape, feature_voxels=3.5)

    # distractors: same scale, same intensity model — only the interior
    # texture frequency differs
    distract_field = _smooth_field(ks[2], shape, feature_voxels=22.0)
    dthr = jnp.percentile(distract_field, 100.0 * (1.0 - mito_fraction))
    distract = (distract_field > dthr) & ~mito & ~rim
    drim = (distract_field > dthr - 0.035) & ~distract & ~mito & ~rim
    dtex = _smooth_field(ks[7], shape, feature_voxels=11.0)

    img = jnp.full(shape, 0.70, jnp.float32)
    img = img + _band_noise(ks[3], shape, feature_voxels=9.0, amp=0.08)
    img = jnp.where(mito, 0.45 + 0.16 * cristae, img)
    img = jnp.where(rim, 0.26, img)
    img = jnp.where(distract, 0.45 + 0.16 * dtex, img)  # same intensities
    img = jnp.where(drim, 0.26, img)  # same rim darkness
    img = img * (1.0 + _band_noise(ks[4], shape, feature_voxels=90.0, amp=0.10))
    slice_gain = 1.0 + 0.05 * jax.random.normal(ks[5], (shape[0], 1, 1))
    img = img * slice_gain

    # serial-section misalignment: small per-slice (y, x) roll
    shifts = jax.random.randint(ks[8], (shape[0], 2), -2, 3)

    def _shift_slice(sl, s):
        return jnp.roll(jnp.roll(sl, s[0], axis=0), s[1], axis=1)

    img = jax.vmap(_shift_slice)(img, shifts)
    lbl = jax.vmap(_shift_slice)(mito.astype(jnp.uint8), shifts)

    # one missing (blanked) section
    zmiss = jax.random.randint(ks[9], (), 1, shape[0] - 1)
    img = img.at[zmiss].set(0.5)

    img = img + 0.09 * jax.random.normal(ks[6], shape)
    return jnp.clip(img, 0.0, 1.0), lbl


@partial(jax.jit, static_argnames=("shape", "n_cells", "elongation"))
def synthetic_instance_volume(
    key: jax.Array,
    shape: Tuple[int, int, int] = (64, 128, 128),
    n_cells: int = 48,
    elongation: float = 1.0,
):
    """Dense instance-segmentation task (CREMI-style space-filling cells).

    Warped-Voronoi cells: random seed points, an elastic coordinate warp
    (three smooth displacement fields) so boundaries curve, each voxel
    assigned to its nearest seed in warped space. Image = bright cytoplasm
    with interior texture, dark membranes along label boundaries, low-freq
    gain, per-slice jitter, and sensor noise — the EM neuron-tissue analog
    of :func:`synthetic_em_volume_v2`, generated entirely on-device.

    ``elongation`` > 1 divides the z-term of the seed metric, stretching
    cells into fiber-like processes that run through the volume — makes
    skeleton metrics (NERL) meaningful, since centerlines of near-convex
    cells are degenerately short.

    Returns (image float32 [0,1] (Z,Y,X), labels int32 (Z,Y,X) in 1..K).
    """
    ks = jax.random.split(key, 9)
    Z, Y, X = shape
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(Z, dtype=jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(X, dtype=jnp.float32),
        indexing="ij",
    )
    # elastic warp: smooth displacement per axis, amplitude ~ cell-scale/3
    amp = 0.25 * (float(min(Y, X)) / max(1.0, n_cells ** (1.0 / 3.0)))
    wz = amp * 0.5 * (2.0 * _smooth_field(ks[0], shape, 24.0) - 1.0)
    wy = amp * (2.0 * _smooth_field(ks[1], shape, 24.0) - 1.0)
    wx = amp * (2.0 * _smooth_field(ks[2], shape, 24.0) - 1.0)
    pz, py, px = zz + wz, yy + wy, xx + wx
    seeds = jax.random.uniform(ks[3], (n_cells, 3)) * jnp.array(
        [Z - 1, Y - 1, X - 1], jnp.float32
    )

    # nearest seed in warped space, scanned over cells (keeps memory at one
    # distance volume instead of K)
    def nearest(carry, seed):
        best_d, best_i, i = carry
        d = (
            ((pz - seed[0]) / elongation) ** 2
            + (py - seed[1]) ** 2
            + (px - seed[2]) ** 2
        )
        take = d < best_d
        return (
            jnp.where(take, d, best_d),
            jnp.where(take, i, best_i),
            i + 1,
        ), None

    init = (jnp.full(shape, jnp.inf, jnp.float32), jnp.zeros(shape, jnp.int32), 1)
    (_, labels, _), _ = jax.lax.scan(nearest, init, seeds)

    # membranes: voxels whose 6-neighborhood crosses a label boundary
    def boundary(lbl):
        b = jnp.zeros(shape, bool)
        for ax in range(3):
            d = lbl != jnp.roll(lbl, 1, axis=ax)
            d = d.at[(slice(None),) * ax + (0,)].set(False)
            b = b | d | jnp.roll(d, -1, axis=ax)
        return b

    mem = boundary(labels)

    tex = _smooth_field(ks[4], shape, 5.0)
    img = jnp.full(shape, 0.72, jnp.float32)
    img = img + 0.10 * (2.0 * tex - 1.0)
    # intracellular organelle clutter (dark blobs that are NOT boundaries)
    org = _smooth_field(ks[5], shape, 10.0) > 0.78
    img = jnp.where(org & ~mem, 0.45, img)
    img = jnp.where(mem, 0.18, img)
    img = img * (1.0 + _band_noise(ks[6], shape, 90.0, 0.08))
    slice_gain = 1.0 + 0.04 * jax.random.normal(ks[7], (Z, 1, 1))
    img = img * slice_gain
    img = img + 0.07 * jax.random.normal(ks[8], shape)
    return jnp.clip(img, 0.0, 1.0), labels


@partial(jax.jit, static_argnames=("shape", "n_blobs"))
def synthetic_blob_instance_volume(
    key: jax.Array,
    shape: Tuple[int, int, int] = (64, 128, 128),
    n_blobs: int = 40,
):
    """Sparse blob-instance task (MitoEM-style mitochondria over cytoplasm).

    Elastically-warped ellipsoidal blobs: each seed carries a radius and
    per-axis anisotropy; a voxel belongs to the blob with the smallest
    normalized warped distance ``d/r`` if that ratio is < 1, else background.
    Because membership is analytic, the normalized inside-distance
    ``1 - min(d/r)`` is an EXACT on-device distance target (no EDT pass) —
    the training signal of the reference's binary-contour-distance recipe
    (reference ``segmentation.py:74``, MitoEM tutorials).

    Returns (image f32 [0,1] (Z,Y,X), labels int32 (Z,Y,X) 0=bg,
    dist f32 [0,1] (Z,Y,X)).
    """
    ks = jax.random.split(key, 10)
    Z, Y, X = shape
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(Z, dtype=jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(X, dtype=jnp.float32),
        indexing="ij",
    )
    r_base = 0.45 * (float(np.prod(shape)) / max(1, n_blobs)) ** (1.0 / 3.0)
    amp = 0.6 * r_base
    wz = amp * 0.5 * (2.0 * _smooth_field(ks[0], shape, 20.0) - 1.0)
    wy = amp * (2.0 * _smooth_field(ks[1], shape, 20.0) - 1.0)
    wx = amp * (2.0 * _smooth_field(ks[2], shape, 20.0) - 1.0)
    pz, py, px = zz + wz, yy + wy, xx + wx
    seeds = jax.random.uniform(ks[3], (n_blobs, 3)) * jnp.array(
        [Z - 1, Y - 1, X - 1], jnp.float32
    )
    radii = r_base * jax.random.uniform(ks[4], (n_blobs,), minval=0.6, maxval=1.5)
    # per-axis squash: blobs are flattened/elongated at random
    aniso = jax.random.uniform(ks[5], (n_blobs, 3), minval=0.6, maxval=1.7)

    def nearest(carry, blob):
        best_u, best_i, i = carry
        seed, r, a = blob
        d = jnp.sqrt(
            ((pz - seed[0]) / a[0]) ** 2
            + ((py - seed[1]) / a[1]) ** 2
            + ((px - seed[2]) / a[2]) ** 2
        )
        u = d / r  # normalized: <1 inside
        take = u < best_u
        return (
            jnp.where(take, u, best_u),
            jnp.where(take, i, best_i),
            i + 1,
        ), None

    init = (jnp.full(shape, jnp.inf, jnp.float32), jnp.zeros(shape, jnp.int32), 1)
    (best_u, owner, _), _ = jax.lax.scan(nearest, init, (seeds, radii, aniso))
    inside = best_u < 1.0
    labels = jnp.where(inside, owner, 0)
    dist = jnp.clip(1.0 - best_u, 0.0, 1.0)

    # image: bright cytoplasm, dark textured blob interiors with a darker rim
    tex = _smooth_field(ks[6], shape, 4.0)
    img = jnp.full(shape, 0.70, jnp.float32)
    img = img + 0.08 * (2.0 * _smooth_field(ks[7], shape, 30.0) - 1.0)
    rim = inside & (best_u > 0.82)
    interior = inside & ~rim
    img = jnp.where(interior, 0.42 + 0.14 * (2.0 * tex - 1.0), img)
    img = jnp.where(rim, 0.20, img)
    # distractor clutter that is NOT labeled (dark, different texture scale)
    clutter = (_smooth_field(ks[8], shape, 9.0) > 0.80) & ~inside
    img = jnp.where(clutter, 0.50, img)
    slice_gain = 1.0 + 0.04 * jax.random.normal(ks[9], (Z, 1, 1))
    img = img * slice_gain
    img = img + 0.06 * jax.random.normal(jax.random.fold_in(key, 7), shape)
    return jnp.clip(img, 0.0, 1.0), labels, dist


@jax.jit
def bc_targets(labels: jnp.ndarray):
    """Binary + contour targets from instance labels (reference
    ``seg_to_binary``/``seg_to_instance_boundary``): channel 0 = foreground,
    channel 1 = instance contour (6-neighborhood label change, dilated one
    voxel so both sides of an interface are contour, foreground only).
    (..., Z, Y, X) -> (..., Z, Y, X, 2) float32."""
    sdim = labels.ndim - 3
    fg = labels > 0
    contour = jnp.zeros(labels.shape, bool)
    for d in range(3):
        ax = sdim + d
        diff = labels != jnp.roll(labels, 1, axis=ax)
        idx = jax.lax.broadcasted_iota(jnp.int32, labels.shape, ax)
        diff = diff & (idx >= 1)
        contour = contour | diff | jnp.roll(diff, -1, axis=ax)
    contour = contour & fg
    return jnp.stack([fg.astype(jnp.float32), contour.astype(jnp.float32)], axis=-1)


@partial(jax.jit, static_argnames=("offsets",))
def affinity_targets(
    labels: jnp.ndarray,
    offsets: Tuple[Tuple[int, int, int], ...] = ((0, 0, 1), (0, 1, 0), (1, 0, 0)),
):
    """Affinities from instance labels, deepem convention: one channel per
    (dz, dy, dx) offset, stored at the HIGH-end voxel — aff[c][v] = 1 iff v
    and v-offset share a label (both > 0). labels (..., Z, Y, X) ->
    (..., Z, Y, X, C) float32. Positions whose offset neighbor falls outside
    the volume are 0 (bit-exact vs the host engine,
    ``data/targets/affinity.py::seg_to_affinity`` — tested). Default offsets
    are the standard short-range x/y/z profile; pass long-range offsets for
    mutex-watershed training."""
    sdim = labels.ndim - 3
    chans = []
    for off in offsets:
        shifted = labels
        valid = jnp.ones(labels.shape, bool)
        for d, o in enumerate(off):
            if o == 0:
                continue
            ax = sdim + d
            shifted = jnp.roll(shifted, o, axis=ax)
            idx = jax.lax.broadcasted_iota(jnp.int32, labels.shape, ax)
            valid = valid & ((idx >= o) if o > 0 else (idx < labels.shape[ax] + o))
        same = (labels == shifted) & (labels > 0) & valid
        chans.append(same.astype(jnp.float32))
    return jnp.stack(chans, axis=-1)


@partial(jax.jit, static_argnames=("patch", "batch"))
def sample_patches_multi(
    key: jax.Array,
    volumes: Tuple[jnp.ndarray, ...],
    patch: Tuple[int, int, int],
    batch: int,
):
    """Random crops + on-device flip augmentation of N aligned volumes
    (image / labels / extra targets share offsets and flips). Returns a
    tuple of (B, *patch) arrays, input dtypes preserved."""
    shape = volumes[0].shape

    def one(k):
        ko, kf = jax.random.split(k)
        maxs = jnp.array([s - p for s, p in zip(shape, patch)])
        off = (jax.random.uniform(ko, (3,)) * (maxs + 1)).astype(jnp.int32)
        crops = [jax.lax.dynamic_slice(v, off, patch) for v in volumes]
        flips = jax.random.bernoulli(kf, 0.5, (3,))
        for ax in range(3):
            crops = [jnp.where(flips[ax], jnp.flip(c, ax), c) for c in crops]
        return tuple(crops)

    return jax.vmap(one)(jax.random.split(key, batch))


@partial(jax.jit, static_argnames=("patch", "batch"))
def sample_patches(
    key: jax.Array,
    image: jnp.ndarray,
    label: jnp.ndarray,
    patch: Tuple[int, int, int],
    batch: int,
):
    """Random crops + on-device flip augmentation.
    Returns (img (B,*patch,1) float32, lbl (B,*patch,1) float32)."""
    ims, lbs = sample_patches_multi(key, (image, label.astype(jnp.float32)), patch, batch)
    return ims[..., None], lbs[..., None]
