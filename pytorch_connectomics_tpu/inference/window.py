"""Sliding-window inference engine — the TPU rewrite of the reference's
``EagerSlidingWindowEngine`` (``connectomics/inference/window.py:530-683``).

Design: the whole pass is ONE jitted XLA program per volume shape —
value+weight accumulators live in HBM, window extraction is
``dynamic_slice``, the model runs on ``sw_batch_size`` windows at a time
(vmapped batch), and blended contributions are scattered back with
read-modify-write ``dynamic_update_slice`` inside a ``lax.scan``. No
host<->device traffic until the final normalized volume is fetched.

Blending importance maps (constant / bump / gaussian / distance) follow
``window.py:137-199``; dense grid with snap-to-edge follows ``window.py:92``
and ``schema/inference.py:77``.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import SlidingWindowConfig


# ---------------------------------------------------------------------------
# window grid (host, static)
# ---------------------------------------------------------------------------


def compute_grid_1d(size: int, window: int, stride: int, snap: bool = True) -> List[int]:
    """Window origins covering [0, size) (reference dense grid + snap-to-edge)."""
    if size <= window:
        return [0]
    origins = list(range(0, size - window + 1, stride))
    last = size - window
    if origins[-1] != last:
        if snap:
            origins.append(last)
        else:
            origins.append(origins[-1] + stride)
    return origins


def compute_window_grid(
    vol_shape: Sequence[int],
    window: Sequence[int],
    overlap: float = 0.5,
    stride: Optional[Sequence[int]] = None,
    snap: bool = True,
) -> np.ndarray:
    """All (z,y,x) window origins, shape (N, 3)."""
    if stride is None:
        stride = [max(1, int(round(w * (1.0 - overlap)))) for w in window]
    axes = [
        compute_grid_1d(s, w, st, snap)
        for s, w, st in zip(vol_shape, window, stride)
    ]
    grid = np.array(
        [(z, y, x) for z in axes[0] for y in axes[1] for x in axes[2]],
        dtype=np.int32,
    )
    return grid


def importance_map(
    window: Sequence[int], blending: str = "bump", sigma_scale: float = 0.125
) -> np.ndarray:
    """Per-window blending weights (reference ``window.py:137-199``)."""
    w = tuple(int(x) for x in window)
    if blending in ("constant", "none"):
        return np.ones(w, dtype=np.float32)
    if blending in ("bump", "gaussian"):
        axes = []
        for n in w:
            x = (np.arange(n) - (n - 1) / 2.0) / max(1.0, (n - 1) / 2.0)
            sigma = max(sigma_scale * 2.0, 1e-3)
            axes.append(np.exp(-0.5 * (x / sigma) ** 2))
        m = functools.reduce(np.multiply.outer, axes).astype(np.float32)
        return np.clip(m, 1e-4, None)
    if blending == "distance":
        from scipy import ndimage

        core = np.zeros(w, dtype=np.uint8)
        core[tuple(slice(1, -1) for _ in w)] = 1
        d = ndimage.distance_transform_edt(core) + 1.0
        return (d / d.max()).astype(np.float32)
    raise ValueError(f"unknown blending '{blending}'")


def pad_volume_to_roi(
    vol: np.ndarray, window: Sequence[int], mode: str = "reflect"
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Grow volume so every axis >= window (reference ``window.py:583-601``).
    Works on (Z,Y,X) or (Z,Y,X,C)."""
    spatial = vol.shape[:3]
    pads = []
    for s, w in zip(spatial, window):
        need = max(0, w - s)
        pads.append((need // 2, need - need // 2))
    while len(pads) < vol.ndim:
        pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        np_mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant"}[mode]
        vol = np.pad(vol, pads, mode=np_mode)
    return vol, pads[:3]


# ---------------------------------------------------------------------------
# jitted engine
# ---------------------------------------------------------------------------


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_grid_with_valid(grid: np.ndarray, multiple: int):
    """Pad the (N, 3) origin grid to a multiple with duplicates of the last
    origin, returning (grid, valid) where valid is 0.0 on the padding rows."""
    n = grid.shape[0]
    n_pad = _round_up(n, multiple)
    valid = np.ones(n_pad, np.float32)
    if n_pad != n:
        grid = np.concatenate([grid, np.repeat(grid[-1:], n_pad - n, axis=0)])
        valid[n:] = 0.0
    return grid, valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "apply_fn", "window", "sw_batch", "out_channels", "acc_dtype",
        "accumulate_weight",
    ),
)
def _sliding_window_device(
    params,
    volume,  # (Z, Y, X, Cin) f32
    origins,  # (N, 3) int32, N multiple of sw_batch; duplicates allowed
    imp,  # (wz, wy, wx, 1) f32
    apply_fn: Callable,
    window: Tuple[int, int, int],
    sw_batch: int,
    out_channels: int,
    acc_dtype=jnp.float32,
    valid=None,  # (N,) f32: 1.0 real window, 0.0 batch-padding duplicate
    accumulate_weight: bool = True,
):
    """One XLA program: scan over window batches, vmapped forward, blended
    scatter-add into HBM accumulators.

    Padding duplicates must carry ``valid=0``: a duplicate adds its
    importance to BOTH value and weight, which does NOT cancel where other
    windows overlap — it biases the weighted mean toward the duplicated
    window (the bug behind sharded-vs-single prediction drift).

    ``accumulate_weight=False`` skips the on-device weight accumulator
    (returning ``(value, None)``) for callers that can normalize in closed
    form: when the origin list is a Cartesian product of per-axis grids and
    the importance map is a separable product of 1-D profiles, the summed
    weight factorizes as W(z,y,x) = Wz(z)·Wy(y)·Wx(x)
    (:func:`_snap_grid_inv_weight_1d`), so the second scatter-add stream —
    half the accumulator read-modify-write traffic — is pure waste."""
    zyx = volume.shape[:3]
    value = jnp.zeros(zyx + (out_channels,), acc_dtype)
    weight = jnp.zeros(zyx + (1,), acc_dtype) if accumulate_weight else jnp.zeros((), acc_dtype)
    wz, wy, wx = window
    n = origins.shape[0]
    n_batches = n // sw_batch
    batched_origins = origins.reshape(n_batches, sw_batch, 3)
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    batched_valid = valid.reshape(n_batches, sw_batch)

    def extract(origin):
        return jax.lax.dynamic_slice(
            volume, (origin[0], origin[1], origin[2], 0), (wz, wy, wx, volume.shape[3])
        )

    def body(carry, batch):
        value, weight = carry
        batch_orig, batch_ok = batch
        windows = jax.vmap(extract)(batch_orig)  # (B, wz, wy, wx, Cin)
        preds = apply_fn(params, windows)  # (B, wz, wy, wx, Cout) f32
        preds = preds.astype(acc_dtype) * imp.astype(acc_dtype)

        def scatter(i, vw):
            value, weight = vw
            o = batch_orig[i]
            ok = batch_ok[i].astype(acc_dtype)
            idx = (o[0], o[1], o[2], 0)
            cur_v = jax.lax.dynamic_slice(value, idx, (wz, wy, wx, out_channels))
            value = jax.lax.dynamic_update_slice(value, cur_v + ok * preds[i], idx)
            if accumulate_weight:
                cur_w = jax.lax.dynamic_slice(weight, idx, (wz, wy, wx, 1))
                weight = jax.lax.dynamic_update_slice(
                    weight, cur_w + ok * imp.astype(acc_dtype), idx
                )
            return value, weight

        value, weight = jax.lax.fori_loop(0, sw_batch, scatter, (value, weight))
        return (value, weight), None

    (value, weight), _ = jax.lax.scan(
        body, (value, weight), (batched_origins, batched_valid)
    )
    return value, (weight if accumulate_weight else None)


def _parity_group_layout(n: int, g: int) -> List[int]:
    """Window counts per parity class p: |{k in [0,n): k % g == p}|."""
    return [(n - p + g - 1) // g for p in range(g)]


@functools.partial(
    jax.jit,
    static_argnames=("apply_fn", "window", "stride", "sw_batch", "out_channels", "acc_dtype"),
)
def _sliding_window_regular_device(
    params,
    volume,  # (Z, Y, X, Cin) padded to full grid coverage
    imp,  # (wz, wy, wx, 1)
    inv_weight,  # (Z, Y, X, 1) precomputed 1/sum-of-importance
    apply_fn: Callable,
    window: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    sw_batch: int,
    out_channels: int,
    acc_dtype=jnp.float32,
):
    """Dense regular-grid engine: when ``stride`` divides ``window`` the
    overlapping windows split into ``prod(window//stride)`` parity groups,
    each of which tiles the volume contiguously — so extract and overlap-add
    become RESHAPES instead of per-window scatter. All groups' windows are
    concatenated and run through ONE scan (a single copy of the model in the
    compiled program), then split back per group for the dense adds. This is
    the TPU-shaped formulation of the reference's accumulator loop
    (``inference/window.py:275,677``)."""
    Z, Y, X, Cin = volume.shape
    wz, wy, wx = window
    sz, sy, sx = stride
    if any(w % s != 0 for w, s in zip(window, stride)):
        raise ValueError(
            f"parity-group engine requires stride to divide window, got "
            f"window={window} stride={stride}; use predict_volume_device "
            f"(falls back to the HBM-accumulator engine) for arbitrary strides"
        )
    gz, gy, gx = wz // sz, wy // sy, wx // sx
    nz = (Z - wz) // sz + 1
    ny = (Y - wy) // sy + 1
    nx = (X - wx) // sx + 1
    impc = imp.astype(acc_dtype)

    mz_counts = _parity_group_layout(nz, gz)
    my_counts = _parity_group_layout(ny, gy)
    mx_counts = _parity_group_layout(nx, gx)

    groups = []  # (pz, py, px, Mz, My, Mx)
    win_blocks = []
    for pz in range(gz):
        for py in range(gy):
            for px in range(gx):
                Mz, My, Mx = mz_counts[pz], my_counts[py], mx_counts[px]
                if Mz == 0 or My == 0 or Mx == 0:
                    continue
                oz, oy, ox = pz * sz, py * sy, px * sx
                region = jax.lax.slice(
                    volume,
                    (oz, oy, ox, 0),
                    (oz + Mz * wz, oy + My * wy, ox + Mx * wx, Cin),
                )
                wins = region.reshape(Mz, wz, My, wy, Mx, wx, Cin)
                wins = wins.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
                    Mz * My * Mx, wz, wy, wx, Cin
                )
                groups.append((oz, oy, ox, Mz, My, Mx))
                win_blocks.append(wins)

    wins_all = jnp.concatenate(win_blocks, axis=0)
    n_total = wins_all.shape[0]
    n_pad = _round_up(n_total, sw_batch)
    if n_pad != n_total:
        wins_all = jnp.concatenate(
            [wins_all, jnp.zeros((n_pad - n_total, wz, wy, wx, Cin), wins_all.dtype)]
        )
    n_chunks = n_pad // sw_batch

    # blended window predictions buffer in the volume dtype (bf16 halves HBM
    # pressure; the overlap-add below still accumulates in acc_dtype)
    buf_dtype = volume.dtype

    def body(outbuf, i):
        chunk = jax.lax.dynamic_slice(
            wins_all, (i * sw_batch, 0, 0, 0, 0), (sw_batch, wz, wy, wx, Cin)
        )
        preds = (apply_fn(params, chunk).astype(acc_dtype) * impc).astype(buf_dtype)
        outbuf = jax.lax.dynamic_update_slice(
            outbuf, preds, (i * sw_batch, 0, 0, 0, 0)
        )
        return outbuf, None

    outbuf = jnp.zeros((n_pad, wz, wy, wx, out_channels), buf_dtype)
    outbuf, _ = jax.lax.scan(body, outbuf, jnp.arange(n_chunks))

    value = jnp.zeros((Z, Y, X, out_channels), acc_dtype)
    offset = 0
    for (oz, oy, ox, Mz, My, Mx) in groups:
        M = Mz * My * Mx
        contrib = jax.lax.slice(
            outbuf, (offset, 0, 0, 0, 0), (offset + M, wz, wy, wx, out_channels)
        ).astype(acc_dtype)
        offset += M
        block = contrib.reshape(Mz, My, Mx, wz, wy, wx, out_channels)
        block = block.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            Mz * wz, My * wy, Mx * wx, out_channels
        )
        cur = jax.lax.slice(
            value,
            (oz, oy, ox, 0),
            (oz + Mz * wz, oy + My * wy, ox + Mx * wx, out_channels),
        )
        value = jax.lax.dynamic_update_slice(value, cur + block, (oz, oy, ox, 0))
    return value * inv_weight.astype(acc_dtype)


def _regular_weight_host(
    vol_shape, window, stride, imp: np.ndarray
) -> np.ndarray:
    """Host-side sum-of-importance map for the regular (dividing-stride)
    grid. Because the window origins form a product grid, a separable
    importance map gives a separable weight: W(z,y,x) = Wz(z)·Wy(y)·Wx(x)
    with Wd(t) = sum_o axis_d(t - o); non-separable maps (distance
    blending) take the direct accumulation (see :func:`_grid_weight_host`)."""
    grids = [
        list(range(0, n - w + 1, s))
        for n, w, s in zip(vol_shape, imp.shape, stride)
    ]
    return _grid_weight_host(tuple(vol_shape), grids, imp)


def _grid_weight_host(vol_shape, grids, imp: np.ndarray) -> np.ndarray:
    """Accumulated importance over an explicit per-axis origin-list grid.
    Separable maps (tested via center profiles) factorize per axis; others
    take the direct accumulation. Shared core of
    :func:`_regular_weight_host` / :func:`_snap_weight_host`."""
    c = tuple(w // 2 for w in imp.shape)
    profiles = [imp[:, c[1], c[2]], imp[c[0], :, c[2]], imp[c[0], c[1], :]]
    center = float(imp[c])
    sep = (
        np.multiply.outer(np.multiply.outer(profiles[0], profiles[1]), profiles[2])
        / max(center, 1e-12) ** 2
    )
    if center > 0 and np.allclose(sep, imp, rtol=1e-4, atol=1e-6):
        weights_1d = []
        for d, (n, w) in enumerate(zip(vol_shape, imp.shape)):
            wd = np.zeros(n, np.float64)
            for o in grids[d]:
                wd[o : o + w] += profiles[d]
            weights_1d.append(wd)
        return (
            np.multiply.outer(
                np.multiply.outer(weights_1d[0], weights_1d[1]), weights_1d[2]
            )
            / max(center, 1e-12) ** 2
        )
    weight = np.zeros(tuple(vol_shape), np.float64)
    wz, wy, wx = imp.shape
    for oz in grids[0]:
        for oy in grids[1]:
            for ox in grids[2]:
                weight[oz : oz + wz, oy : oy + wy, ox : ox + wx] += imp
    return weight


def _regular_grid_origins(cover, window, stride) -> np.ndarray:
    """(N, 3) int32 origin list of the dividing-stride product grid over the
    padded full-coverage shape — the same origins the dense parity-group
    engine visits. Feeds :func:`_inv_weight_scatter_device` so the regular
    engine paths also skip the host-built full-volume weight map (no
    full-volume host->device upload, no trace-time volume-sized constant)."""
    grids = [
        np.arange(0, c - w + 1, s, dtype=np.int32)
        for c, w, s in zip(cover, window, stride)
    ]
    return np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1).reshape(-1, 3)


def _snap_weight_host(
    vol_shape, window, stride, imp: np.ndarray, snap: bool = True
) -> np.ndarray:
    """Host-side accumulated importance over the snap-to-edge grid
    (:func:`compute_window_grid` semantics) — the independent test oracle
    for :func:`_inv_weight_scatter_device`."""
    # mirror the device engine's dynamic_update_slice clamping: a snap=False
    # grid can nominally overshoot size - window, but the device scatter
    # clamps the origin in-bounds (duplicates kept — the device adds twice)
    grids = [
        [min(o, s - w) for o in compute_grid_1d(s, w, st, snap)]
        for s, w, st in zip(vol_shape, window, stride)
    ]
    return _grid_weight_host(vol_shape, grids, imp)


@functools.partial(jax.jit, static_argnames=("vol_shape", "window"))
def _inv_weight_scatter_device(origins, imp, vol_shape, window):
    """1 / accumulated importance, computed ON DEVICE with one scatter-only
    pass over the (unpadded) origin grid. The weight is data-independent
    given shapes, so the sliding-window engines compute it once per
    (shape, grid) — eagerly, with concrete inputs, so the result is a
    concrete device array even when requested while an outer jit/shard_map
    trace is being built — and run value-only scatter afterwards (half the
    accumulator read-modify-write traffic; measured 74.4 -> 98.3 Mvox/s at
    the shipped operating point, scripts/tpu_engine_probe.py). No
    full-volume host->device upload is involved (the dev tunnel moves
    ~1 MB/s; a host-built weight map would be minutes per volume)."""
    wz, wy, wx = window
    weight = jnp.zeros(tuple(vol_shape) + (1,), jnp.float32)
    imp = imp.astype(jnp.float32)

    def body(wbuf, o):
        idx = (o[0], o[1], o[2], 0)
        cur = jax.lax.dynamic_slice(wbuf, idx, (wz, wy, wx, 1))
        return jax.lax.dynamic_update_slice(wbuf, cur + imp, idx), None

    weight, _ = jax.lax.scan(body, weight, origins)
    return 1.0 / jnp.maximum(weight, 1e-8)


def _separable_bump_profiles(window, sigma_scale: float = 0.125):
    """Per-axis UNCLIPPED Gaussian profiles (see regular_cover_setup_device
    for why the stock clipped bump is unusable for separable blends)."""
    sigma = max(sigma_scale * 2.0, 1e-3)
    profiles = []
    for n in window:
        x = (np.arange(n) - (n - 1) / 2.0) / max(1.0, (n - 1) / 2.0)
        profiles.append(np.exp(-0.5 * (x / sigma) ** 2))
    return profiles


def _snap_grid_inv_weight_1d(
    size: int, window: int, stride: int, profile: np.ndarray
) -> np.ndarray:
    """Closed-form per-axis accumulated blend weight for a snap-to-edge grid.

    The snap grid is a Cartesian product of per-axis origin lists
    (:func:`compute_window_grid`) and the separable importance map is a
    product of 1-D profiles, so the accumulated full-volume weight
    factorizes: W(z,y,x) = Wz(z)·Wy(y)·Wx(x) with
    Wa(t) = sum over grid origins o of profile[t - o]. Returns 1/Wa as
    float32 (length ``size``) — three tiny vectors replace the full-volume
    on-device weight accumulator."""
    acc = np.zeros(size, np.float64)
    for o in compute_grid_1d(size, window, stride):
        acc[o : o + window] += profile
    return (1.0 / np.maximum(acc, 1e-30)).astype(np.float32)


def predict_volume_device(
    params,
    volume,  # (Z, Y, X, Cin) — raw shape, padding handled here
    apply_fn: Callable,
    window: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    sw_batch: int,
    out_channels: int,
    acc_dtype=jnp.float32,
    sigma_scale: float = 0.125,
):
    """Whole-volume on-device sliding-window predict with exact separable
    bump blending, returning a (Z, Y, X, Cout) prediction. Jittable.

    Engine selection: when ``stride`` divides ``window`` the dense
    parity-group engine runs (overlap-adds are reshapes); otherwise — e.g.
    overlap 0.25 of a 64-window = stride 48 — it falls back to the jitted
    HBM-accumulator engine over a snap-to-edge grid (the reference's dense
    grid semantics, ``compute_grid_1d``), normalizing by the accumulated
    importance so blending stays exact at every overlap."""
    vol_shape = tuple(volume.shape[:3])
    if any(s < w for s, w in zip(vol_shape, window)):
        # grow-to-ROI pad for volumes smaller than the window (reference
        # pad_volume_to_roi semantics; shapes are static at trace time, so
        # this stays jittable) — without it the snap-grid fallback's
        # window-extent dynamic_slice fails at trace time
        volume, pads = pad_roi_jnp(volume, window)
        out = predict_volume_device(
            params, volume, apply_fn, window, stride, sw_batch,
            out_channels, acc_dtype=acc_dtype, sigma_scale=sigma_scale,
        )
        return out[
            pads[0][0] : pads[0][0] + vol_shape[0],
            pads[1][0] : pads[1][0] + vol_shape[1],
            pads[2][0] : pads[2][0] + vol_shape[2],
        ]
    if all(w % s == 0 for w, s in zip(window, stride)):
        cover, imp, inv_weight = regular_cover_setup_device(
            vol_shape, window, stride, sigma_scale
        )
        volp = jnp.pad(
            volume,
            [(0, c - s) for c, s in zip(cover, vol_shape)] + [(0, 0)],
            mode="reflect",
        )
        out = _sliding_window_regular_device(
            params, volp, imp, inv_weight, apply_fn=apply_fn, window=window,
            stride=stride, sw_batch=sw_batch, out_channels=out_channels,
            acc_dtype=acc_dtype,
        )
        return out[: vol_shape[0], : vol_shape[1], : vol_shape[2]]

    # snap-to-edge grid entirely inside the volume: no padding needed
    grids = [
        np.asarray(compute_grid_1d(s, w, st), np.int32)
        for s, w, st in zip(vol_shape, window, stride)
    ]
    origins = np.stack(
        np.meshgrid(*grids, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    n = origins.shape[0]
    n_pad = _round_up(n, sw_batch)
    valid = np.ones(n_pad, np.float32)
    valid[n:] = 0.0
    origins = np.concatenate(
        [origins, np.zeros((n_pad - n, 3), np.int32)], axis=0
    )
    profiles = _separable_bump_profiles(window, sigma_scale)
    imp = (
        jnp.asarray(profiles[0], jnp.float32)[:, None, None]
        * jnp.asarray(profiles[1], jnp.float32)[None, :, None]
        * jnp.asarray(profiles[2], jnp.float32)[None, None, :]
    )[..., None]
    # separable imp over a Cartesian origin grid: the accumulated weight
    # factorizes per axis, so skip the on-device weight accumulator (half
    # the scatter read-modify-write traffic) and normalize in closed form
    value, _ = _sliding_window_device(
        params, volume, jnp.asarray(origins), imp, apply_fn=apply_fn,
        window=window, sw_batch=sw_batch, out_channels=out_channels,
        acc_dtype=acc_dtype, valid=jnp.asarray(valid),
        accumulate_weight=False,
    )
    inv = [
        jnp.asarray(
            _snap_grid_inv_weight_1d(s, w, st, p), acc_dtype
        )
        for s, w, st, p in zip(vol_shape, window, stride, profiles)
    ]
    return (
        value
        * inv[0][:, None, None, None]
        * inv[1][None, :, None, None]
        * inv[2][None, None, :, None]
    )


def regular_cover_setup_device(
    vol_shape, window, stride, sigma_scale: float = 0.125
):
    """Exact separable bump blend built ON DEVICE from 1-D profiles.

    For hosts where uploading a full-volume weight map is impossible (the
    dev TPU tunnel moves ~1 MB/s — CLAUDE.md), the blend normalizer must be
    assembled on device from tiny per-axis vectors. The stock ``bump``
    importance map clips the separable Gaussian at 1e-4
    (``importance_map``), which breaks separability — a separable weight
    built from its center profiles mis-normalizes corner voxels by up to
    1e4. This helper instead uses the UNCLIPPED per-axis Gaussians for both
    the window importance and the summed weight, so
    ``inv_weight == 1 / sum-of-window-importances`` exactly (per-axis
    minimum exp(-8) ≈ 3e-4; the 3-axis product ≈ 4e-11 is far above f32
    underflow). Returns ``(cover, imp (*window,1), inv_weight (*cover,1))``
    as jnp arrays.
    """
    import jax.numpy as jnp

    cover = tuple(
        (max(1, -(-(s - w) // st) + 1) - 1) * st + w
        for s, w, st in zip(vol_shape, window, stride)
    )
    profiles = _separable_bump_profiles(window, sigma_scale)
    imp = (
        jnp.asarray(profiles[0], jnp.float32)[:, None, None]
        * jnp.asarray(profiles[1], jnp.float32)[None, :, None]
        * jnp.asarray(profiles[2], jnp.float32)[None, None, :]
    )[..., None]
    w1d = []
    for d, (size, w, st) in enumerate(zip(cover, window, stride)):
        wd = np.zeros(size, np.float64)
        for o in range(0, size - w + 1, st):
            wd[o : o + w] += profiles[d]
        w1d.append(jnp.asarray(wd, jnp.float32))
    inv_weight = (
        1.0
        / (w1d[0][:, None, None] * w1d[1][None, :, None] * w1d[2][None, None, :])
    )[..., None]
    return cover, imp, inv_weight


def regular_cover_setup(vol_shape, window, stride, blending: str = "bump"):
    """Inputs for driving ``_sliding_window_regular_device`` directly
    (benchmark scripts): returns ``(cover, imp, inv_weight)`` — the padded
    full-coverage shape for a regular grid, the (\\*window, 1) importance
    map, and the (\\*cover, 1) reciprocal of the summed-importance blend
    normalizer (both as jnp arrays)."""
    import jax.numpy as jnp

    cover = tuple(
        (max(1, -(-(s - w) // st) + 1) - 1) * st + w
        for s, w, st in zip(vol_shape, window, stride)
    )
    imp_np = importance_map(window, blending)
    weight = _regular_weight_host(cover, window, stride, imp_np)
    inv = (1.0 / np.maximum(weight, 1e-8))[..., None]
    return cover, jnp.asarray(imp_np[..., None]), jnp.asarray(inv, jnp.float32)


class SlidingWindowEngine:
    """Host wrapper: grid planning, padding, device pass, normalization.

    ``apply_fn(params, batch_ndhwc) -> batch_ndhwc`` is the model forward
    (already closed over architecture); out_channels probed via eval_shape
    (reference probe pass, ``window.py:611-630``).
    """

    def __init__(
        self,
        apply_fn: Callable,
        window: Sequence[int],
        overlap: float = 0.5,
        stride: Optional[Sequence[int]] = None,
        blending: str = "bump",
        sigma_scale: float = 0.125,
        sw_batch_size: int = 4,
        padding_mode: str = "reflect",
        snap_to_edge: bool = True,
        border_mask: Optional[Sequence[int]] = None,
        acc_dtype=jnp.float32,
    ):
        self.apply_fn = apply_fn
        self.window = tuple(int(w) for w in window)
        self.overlap = overlap
        self.stride = stride
        self.blending = blending
        self.sw_batch = int(sw_batch_size)
        self.padding_mode = padding_mode
        self.snap = snap_to_edge
        self.acc_dtype = acc_dtype
        imp = importance_map(self.window, blending, sigma_scale)
        if border_mask:
            # zero a border band of each window (reference window.py:297)
            bz, by, bx = border_mask
            m = np.zeros_like(imp)
            m[bz : imp.shape[0] - bz or None, by : imp.shape[1] - by or None, bx : imp.shape[2] - bx or None] = 1
            imp = np.clip(imp * m, 1e-6, None)
        self.imp = jnp.asarray(imp[..., None])

    def probe_out_channels(self, params, in_channels: int) -> int:
        x = jax.ShapeDtypeStruct((1, *self.window, in_channels), jnp.float32)
        out = jax.eval_shape(lambda p, v: self.apply_fn(p, v), params, x)
        return int(out.shape[-1])

    def __call__(
        self,
        params,
        volume: np.ndarray,
        out_channels: Optional[int] = None,
    ) -> np.ndarray:
        """volume: (Z,Y,X) or (Z,Y,X,Cin) numpy/jnp -> (Z,Y,X,Cout) np.float32."""
        vol = np.asarray(volume, dtype=np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        orig_shape = vol.shape[:3]
        vol, pads = pad_volume_to_roi(vol, self.window, self.padding_mode)
        stride = self._effective_stride()
        if all(w % s == 0 for w, s in zip(self.window, stride)):
            return self._call_regular(params, vol, stride, orig_shape, pads, out_channels)
        grid = compute_window_grid(
            vol.shape[:3], self.window, self.overlap, self.stride, self.snap
        )
        if out_channels is None:
            out_channels = self.probe_out_channels(params, vol.shape[-1])
        # pad origin list to a sw_batch multiple; padding duplicates carry
        # valid=0 so they don't bias the blend (see _sliding_window_device)
        invw = self._snap_inv_weight(vol.shape[:3], grid)
        grid, valid = _pad_grid_with_valid(grid, self.sw_batch)
        value, _ = _sliding_window_device(
            params,
            jnp.asarray(vol),
            jnp.asarray(grid),
            self.imp,
            apply_fn=self.apply_fn,
            window=self.window,
            sw_batch=self.sw_batch,
            out_channels=out_channels,
            acc_dtype=self.acc_dtype,
            valid=jnp.asarray(valid),
            accumulate_weight=False,
        )
        out = (value * invw).astype(jnp.float32)
        out_np = np.asarray(out)
        # remove grow-to-roi padding
        sl = tuple(
            slice(p[0], p[0] + s) for p, s in zip(pads, orig_shape)
        )
        return out_np[sl]

    def device_pass(self, params, vol, out_channels: int):
        """Fully-traceable device pass: ``vol`` is a jnp (Z,Y,X,C) array with
        every axis >= window (use :func:`pad_roi_jnp` first). Returns the
        normalized (Z,Y,X,Cout) prediction with the SAME spatial shape.
        Usable inside jit/vmap/shard_map (e.g. TTA-variant sharding)."""
        import jax.numpy as jnp

        Z, Y, X = vol.shape[:3]
        stride = self._effective_stride()
        if all(w % s == 0 for w, s in zip(self.window, stride)):
            cover = []
            extra = []
            for size, w, s in zip((Z, Y, X), self.window, stride):
                n = max(1, -(-(size - w) // s) + 1)
                cov = (n - 1) * s + w
                cover.append(cov)
                extra.append(cov - size)
            if any(extra):
                np_mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant"}[
                    self.padding_mode
                ]
                vol = jnp.pad(vol, [(0, e) for e in extra] + [(0, 0)], mode=np_mode)
            invw = self._snap_inv_weight(
                tuple(cover), _regular_grid_origins(cover, self.window, stride)
            )
            out = _sliding_window_regular_device(
                params, vol, self.imp, invw,
                apply_fn=self.apply_fn, window=self.window, stride=tuple(stride),
                sw_batch=self.sw_batch, out_channels=out_channels,
                acc_dtype=self.acc_dtype,
            )
            return out[:Z, :Y, :X]
        grid = compute_window_grid((Z, Y, X), self.window, self.overlap, self.stride, self.snap)
        invw = self._snap_inv_weight((Z, Y, X), grid)
        grid, valid = _pad_grid_with_valid(grid, self.sw_batch)
        value, _ = _sliding_window_device(
            params, vol, jnp.asarray(grid), self.imp,
            apply_fn=self.apply_fn, window=self.window, sw_batch=self.sw_batch,
            out_channels=out_channels, acc_dtype=self.acc_dtype,
            valid=jnp.asarray(valid), accumulate_weight=False,
        )
        return (value * invw).astype(jnp.float32)

    def _snap_inv_weight(self, vol_shape, grid: np.ndarray):
        """Cached 1/weight for the snap-grid engine, computed ON DEVICE from
        the UNPADDED (N,3) origin grid (:func:`_inv_weight_scatter_device`).
        The cache holds concrete device arrays only: the jitted scatter is
        invoked with concrete inputs, so it executes eagerly even while an
        outer jit/shard_map trace is active (caching a value produced from
        trace-side ops here would leak a tracer and crash the SECOND
        predict on the same engine — regression caught in round-5 review)."""
        cache = getattr(self, "_invw_cache", None)
        if cache is None:
            cache = self._invw_cache = {}
        key = (tuple(vol_shape), grid.tobytes())
        invw = cache.get(key)
        if invw is None:
            # ensure_compile_time_eval: execute the scatter NOW and get a
            # concrete device array even when an outer jit/shard_map trace
            # is active (a bare jitted call would be inlined into the outer
            # trace and the cache would hold a leaked tracer)
            with jax.ensure_compile_time_eval():
                invw = _inv_weight_scatter_device(
                    jnp.asarray(np.ascontiguousarray(grid)),
                    self.imp, tuple(int(s) for s in vol_shape), self.window,
                )
            if len(cache) >= 8:  # bound HBM held by cached maps
                cache.pop(next(iter(cache)))
            cache[key] = invw
        return invw

    def _effective_stride(self) -> Tuple[int, int, int]:
        if self.stride is not None:
            return tuple(int(s) for s in self.stride)
        return tuple(max(1, int(round(w * (1.0 - self.overlap)))) for w in self.window)

    def _call_regular(self, params, vol, stride, orig_shape, pads, out_channels):
        """Dense parity-group path (see ``_sliding_window_regular_device``):
        volume padded so the regular grid covers it fully (replaces
        snap-to-edge; same coverage, reflect-padded borders)."""
        if out_channels is None:
            out_channels = self.probe_out_channels(params, vol.shape[-1])
        # pad up to full coverage: smallest (n-1)*s + w >= size
        cover = []
        extra = []
        for size, w, s in zip(vol.shape[:3], self.window, stride):
            n = max(1, -(-(size - w) // s) + 1)
            cov = (n - 1) * s + w
            cover.append(cov)
            extra.append(cov - size)
        if any(extra):
            np_mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant"}[
                self.padding_mode
            ]
            vol = np.pad(
                vol,
                [(0, e) for e in extra] + [(0, 0)],
                mode=np_mode,
            )
        invw = self._snap_inv_weight(
            tuple(vol.shape[:3]),
            _regular_grid_origins(vol.shape[:3], self.window, stride),
        )
        out = _sliding_window_regular_device(
            params,
            jnp.asarray(vol),
            self.imp,
            invw,
            apply_fn=self.apply_fn,
            window=self.window,
            stride=tuple(stride),
            sw_batch=self.sw_batch,
            out_channels=out_channels,
            acc_dtype=self.acc_dtype,
        )
        out_np = np.asarray(out.astype(jnp.float32))
        sl = tuple(slice(p[0], p[0] + s) for p, s in zip(pads, orig_shape))
        return out_np[sl]

    def predict_sharded(
        self,
        params,
        volume: np.ndarray,
        mesh,
        out_channels: Optional[int] = None,
    ) -> np.ndarray:
        """Multi-device variant: shard the window grid over the ``data`` mesh
        axis; each device accumulates its windows into replica-local
        accumulators which are psum'd — the TPU equivalent of the reference's
        rank-sharded windows + reduce-to-rank-0
        (``inference/lazy.py:1104-1110``, ``lazy_distributed.py:78-160``)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        vol = np.asarray(volume, dtype=np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        orig_shape = vol.shape[:3]
        vol, pads = pad_volume_to_roi(vol, self.window, self.padding_mode)
        grid = compute_window_grid(
            vol.shape[:3], self.window, self.overlap, self.stride, self.snap
        )
        if out_channels is None:
            out_channels = self.probe_out_channels(params, vol.shape[-1])
        n_dev = mesh.devices.size
        invw = self._snap_inv_weight(vol.shape[:3], grid)
        grid, valid = _pad_grid_with_valid(grid, self.sw_batch * n_dev)

        apply_fn = self.apply_fn
        window = self.window
        sw_batch = self.sw_batch
        acc_dtype = self.acc_dtype
        imp = self.imp

        def per_device(params, volume, origins, ok):
            # weight accumulation is skipped on device: the total weight over
            # ALL shards is the data-independent host map (halves both the
            # scatter traffic and the psum payload)
            value, _ = _sliding_window_device(
                params, volume, origins, imp,
                apply_fn=apply_fn, window=window, sw_batch=sw_batch,
                out_channels=out_channels, acc_dtype=acc_dtype,
                valid=ok, accumulate_weight=False,
            )
            return jax.lax.psum(value, "data")

        from jax import shard_map

        sharded = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
        # place inputs on the mesh (params may arrive from a single device,
        # e.g. right after checkpoint restore)
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        vol_dev = jax.device_put(jnp.asarray(vol), rep)
        shard = NamedSharding(mesh, P("data"))
        grid_dev = jax.device_put(jnp.asarray(grid), shard)
        valid_dev = jax.device_put(jnp.asarray(valid), shard)
        value = jax.jit(sharded)(params, vol_dev, grid_dev, valid_dev)
        # normalize on host: invw is committed to the default device while
        # value is mesh-replicated (mixed placements can't be multiplied),
        # and the result is materialized host-side right after anyway
        out = np.asarray(value, dtype=np.float32) * np.asarray(invw, dtype=np.float32)
        sl = tuple(slice(p[0], p[0] + s) for p, s in zip(pads, orig_shape))
        return out[sl]


def make_engine(apply_fn, cfg: SlidingWindowConfig, input_size: Sequence[int]):
    window = cfg.window_size or list(input_size)
    return SlidingWindowEngine(
        apply_fn,
        window=window,
        overlap=cfg.overlap,
        stride=cfg.stride,
        blending=cfg.blending,
        sigma_scale=cfg.sigma_scale,
        sw_batch_size=cfg.sw_batch_size,
        padding_mode=cfg.padding_mode,
        snap_to_edge=cfg.snap_to_edge,
        border_mask=cfg.border_mask,
        acc_dtype=jnp.dtype(cfg.acc_dtype),
    )


def pad_roi_jnp(vol, window: Sequence[int], mode: str = "reflect"):
    """jnp grow-to-ROI pad (traceable twin of :func:`pad_volume_to_roi`)."""
    import jax.numpy as jnp

    pads = []
    for s, w in zip(vol.shape[:3], window):
        need = max(0, int(w) - int(s))
        pads.append((need // 2, need - need // 2))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        np_mode = {"reflect": "reflect", "replicate": "edge", "constant": "constant"}[mode]
        vol = jnp.pad(vol, pads, mode=np_mode)
    return vol, pads[:3]
