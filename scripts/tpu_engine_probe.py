#!/usr/bin/env python
"""Sliding-window ENGINE overhead probe (round 5).

bench.py r5 breakdown question: at the shipped operating point (aniso
patchify stem, 96^3 windows, batch 16, overlap 0.125) the model forward is
~408 Mvox/s processed but the end-to-end engine delivers only ~73 Mvox/s
output at ~1.25x window inflation — i.e. the scatter/normalize machinery
eats ~3-4x. This probe times, on the bench geometry (165,1024,768):

  fwd        chained model forward only (the compute floor)
  engine2    snap-grid engine, BOTH accumulators (value+weight) — the
             pre-r5 formulation
  engine1    snap-grid engine, value-only + closed-form separable
             normalization (_snap_grid_inv_weight_1d) — the r5 default in
             predict_volume_device

Env: EP_SMALL=1 for a (64,256,256) smoke volume; EP_REPS (default 3);
EP_OVERLAP (default 0.125); EP_BATCH (default 16).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".cache" / "jax"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.inference import window as W
    from pytorch_connectomics_tpu.models import build_model, init_model

    small = os.environ.get("EP_SMALL") == "1"
    reps = int(os.environ.get("EP_REPS", "3"))
    overlap = float(os.environ.get("EP_OVERLAP", "0.125"))
    sw_batch = int(os.environ.get("EP_BATCH", "16"))
    vol_shape = (64, 256, 256) if small else (165, 1024, 768)
    win = (64, 64, 64) if small else (96, 96, 96)
    stride = tuple(max(1, int(round(w * (1.0 - overlap)))) for w in win)

    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1, "out_channels": 1, "input_size": list(win),
            "mednext": {
                "size": "S", "kernel_size": 3, "patchify_stem": True,
                "patchify_stride": [1, 2, 2],
            },
            "loss": {"losses": [{"function": "DiceLoss"}]},
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))

    def apply_fn(p, x):
        return model.apply(p, x)

    def lat():
        ls = []
        for _ in range(3):
            t0 = time.time()
            _ = float(jnp.zeros(()) + 1.0)
            ls.append(time.time() - t0)
        return sorted(ls)[1]

    def timeit(fn, label, voxels):
        _ = float(fn())  # compile + warm
        fl = lat()
        t0 = time.time()
        acc = jnp.zeros(())
        for _ in range(reps):
            acc = acc + fn()
        _ = float(acc)
        dt = max(1e-6, time.time() - t0 - fl)
        rate = voxels * reps / dt / 1e6
        print(f"[engine_probe] {label}: {dt / reps * 1e3:.1f} ms/rep "
              f"-> {rate:.1f} Mvox/s", flush=True)
        return rate

    vol = jax.random.uniform(jax.random.PRNGKey(1), vol_shape + (1,), jnp.bfloat16)

    # --- fwd floor ---
    wins = jax.random.uniform(
        jax.random.PRNGKey(2), (sw_batch, *win, 1), jnp.bfloat16
    )
    fwd_fn = jax.jit(lambda w: apply_fn(params, w).astype(jnp.float32).mean())
    timeit(lambda: fwd_fn(wins), "fwd (one batch)", sw_batch * np.prod(win))

    # --- snap-grid origins (shared by both engine variants) ---
    grids = [
        np.asarray(W.compute_grid_1d(s, w, st), np.int32)
        for s, w, st in zip(vol_shape, win, stride)
    ]
    origins = np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1).reshape(-1, 3)
    n = origins.shape[0]
    n_pad = W._round_up(n, sw_batch)
    valid = np.ones(n_pad, np.float32)
    valid[n:] = 0.0
    origins = np.concatenate([origins, np.zeros((n_pad - n, 3), np.int32)], 0)
    profiles = W._separable_bump_profiles(win)
    imp = (
        jnp.asarray(profiles[0], jnp.float32)[:, None, None]
        * jnp.asarray(profiles[1], jnp.float32)[None, :, None]
        * jnp.asarray(profiles[2], jnp.float32)[None, None, :]
    )[..., None]
    og = jnp.asarray(origins)
    ok = jnp.asarray(valid)
    print(f"[engine_probe] {n} windows "
          f"({n * np.prod(win) / np.prod(vol_shape):.2f}x inflation), "
          f"stride {stride}", flush=True)

    out_vox = float(np.prod(vol_shape))

    # --- engine with both accumulators (pre-r5) ---
    @jax.jit
    def engine2(v):
        value, weight = W._sliding_window_device(
            params, v, og, imp, apply_fn=apply_fn, window=win,
            sw_batch=sw_batch, out_channels=1, valid=ok,
            accumulate_weight=True,
        )
        return (value / jnp.maximum(weight, 1e-30)).mean()

    timeit(lambda: engine2(vol), "engine2 (value+weight acc)", out_vox)

    # --- value-only + closed-form separable normalizer (r5) ---
    inv = [
        jnp.asarray(W._snap_grid_inv_weight_1d(s, w, st, p), jnp.float32)
        for s, w, st, p in zip(vol_shape, win, stride, profiles)
    ]

    @jax.jit
    def engine1(v):
        value, _ = W._sliding_window_device(
            params, v, og, imp, apply_fn=apply_fn, window=win,
            sw_batch=sw_batch, out_channels=1, valid=ok,
            accumulate_weight=False,
        )
        out = (
            value
            * inv[0][:, None, None, None]
            * inv[1][None, :, None, None]
            * inv[2][None, None, :, None]
        )
        return out.mean()

    timeit(lambda: engine1(vol), "engine1 (value-only + separable norm)", out_vox)

    # --- full unified entry (what bench.py times) ---
    pv = jax.jit(
        lambda v: W.predict_volume_device(
            params, v, apply_fn, win, stride, sw_batch=sw_batch, out_channels=1
        ).mean()
    )
    timeit(lambda: pv(vol), "predict_volume_device (r5 path)", out_vox)


if __name__ == "__main__":
    main()
