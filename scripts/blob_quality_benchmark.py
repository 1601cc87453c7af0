#!/usr/bin/env python
"""Blob-instance (MitoEM-style) quality benchmark: the binary-contour-
distance half of the framework, end-to-end on device.

Trains MedNeXt-S to predict [binary, contour, distance] on the on-device
sparse blob task (``data/synthetic_jax.py::synthetic_blob_instance_volume``
— warped ellipsoids over cytoplasm with unlabeled distractor clutter; the
normalized inside-distance is analytic, so the distance target needs no EDT
pass), runs sliding-window inference with flip TTA, fetches the quantized
prediction once, decodes with the native ``bcd_watershed`` (reference
``decode_binary_contour_distance_watershed``, ``segmentation.py:74`` — the
MitoEM recipe) plus ``binary_cc``, and scores COCO AP (the MitoEM headline
metric) alongside aRand/VOI.

Synthetic stand-in for MitoEM-R/H AP (reference README.md:43) the same way
scripts/quality_benchmark.py stands in for Lucchi++ and
scripts/instance_quality_benchmark.py for SNEMI/NISB (QUALITY.md — real
volumes cannot reach this host).

Env knobs: BQ_STEPS (600), BQ_PATCH (64), BQ_BATCH (8), BQ_TRAIN_SHAPE
(64,256,256), BQ_TEST_SHAPE (64,128,128), BQ_BLOBS_PER_MVOX (40),
BQ_TTA (1), BQ_PLATFORM (e.g. cpu), BQ_ARCH=patchify.
Prints one JSON line and appends to QUALITY.md's blob table.
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
# repo-local persistent cache, split by backend (CLAUDE.md)
_cache = "jax_cpu" if os.environ.get("BQ_PLATFORM") == "cpu" else "jax"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".cache" / _cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if os.environ.get("BQ_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BQ_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def _shape(env, default):
    v = os.environ.get(env)
    return tuple(int(x) for x in v.split(",")) if v else default


def main():
    from pytorch_connectomics_tpu.config.schema import (
        ModelConfig,
        OptimizationConfig,
        build_dataclass,
    )
    from pytorch_connectomics_tpu.data.synthetic_jax import (
        bc_targets,
        sample_patches_multi,
        synthetic_blob_instance_volume,
    )
    from pytorch_connectomics_tpu.decoding.decoders import (
        decode_bcd_watershed,
        decode_binary_cc,
    )
    from pytorch_connectomics_tpu.inference.window import (
        _sliding_window_regular_device,
        regular_cover_setup_device,
    )
    from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator
    from pytorch_connectomics_tpu.metrics.seg import adapted_rand, average_precision, voi
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.training.optim import build_optimizer
    from pytorch_connectomics_tpu.training.state import (
        create_train_state,
        make_train_step,
    )

    steps = int(os.environ.get("BQ_STEPS", "600"))
    patch = int(os.environ.get("BQ_PATCH", "64"))
    batch = int(os.environ.get("BQ_BATCH", "8"))
    train_shape = _shape("BQ_TRAIN_SHAPE", (64, 256, 256))
    test_shape = _shape("BQ_TEST_SHAPE", (64, 128, 128))
    per_mvox = float(os.environ.get("BQ_BLOBS_PER_MVOX", "40"))
    tta = os.environ.get("BQ_TTA", "1") == "1"

    print(f"devices: {jax.devices()}", flush=True)
    t_all = time.time()

    def _blobs(shape):
        return max(6, int(per_mvox * np.prod(shape) / 1e6))

    img_tr, lbl_tr, dist_tr = synthetic_blob_instance_volume(
        jax.random.PRNGKey(21), train_shape, n_blobs=_blobs(train_shape)
    )
    img_te, lbl_te, _ = synthetic_blob_instance_volume(
        jax.random.PRNGKey(22), test_shape, n_blobs=_blobs(test_shape)
    )

    # ---- model: [binary, contour, distance] head — BCE+Dice on the two
    # masks, MSE on the regression channel (reference bcd recipe) ----
    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 3,
            "input_size": [patch] * 3,
            "mednext": {
                "size": "S",
                "kernel_size": 3,
                "patchify_stem": os.environ.get("BQ_ARCH") == "patchify",
            },
            "loss": {
                "losses": [
                    {"function": "BCEWithLogitsLoss", "weight": 1.0,
                     "pred_slice": "0:2", "target_slice": "0:2"},
                    {"function": "DiceLoss", "weight": 1.0,
                     "pred_slice": "0:2", "target_slice": "0:2"},
                    {"function": "MSELoss", "weight": 2.0,
                     "pred_slice": "2:3", "target_slice": "2:3",
                     "kwargs": {"tanh": True}},
                ]
            },
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    opt_cfg = build_dataclass(
        OptimizationConfig,
        {
            "optimizer": {"name": "AdamW", "lr": 1e-3, "weight_decay": 0.01},
            "scheduler": {
                "name": "WarmupCosineLR",
                "warmup_steps": max(1, min(50, steps // 10)),
            },
            "max_epochs": 1,
            "n_steps_per_epoch": steps,
            "gradient_clip_val": 1.0,
        },
    )
    tx, _ = build_optimizer(opt_cfg, steps)
    orch = LossOrchestrator(cfg.loss)

    def apply_fn(v, x, train=False, rngs=None):
        # make_train_step passes train=True + a dropout rng stream; forward
        # both (rngs is unused by dropout-free MedNeXt but must be accepted)
        return model.apply(v, x, train=train, rngs=rngs)

    train_step = jax.jit(make_train_step(apply_fn, orch, tx))
    state = create_train_state(variables["params"], tx)

    # crops + flips of (image, labels, dist); bc targets from the flipped
    # label patch (ids commute with flips), distance flips as a scalar field
    @jax.jit
    def sample(k):
        ims, lbs, dts = sample_patches_multi(
            k, (img_tr, lbl_tr, dist_tr), (patch,) * 3, batch
        )
        target = jnp.concatenate([bc_targets(lbs), dts[..., None]], axis=-1)
        return ims[..., None], target

    # ---- train ----
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    logs = {}
    for step in range(steps):
        im, tgt = sample(jax.random.fold_in(key, step))
        state, logs = train_step(state, {"image": im, "label": tgt})
        if step % 100 == 0 or step == steps - 1:
            loss = float(logs["loss_total"])  # sync point
            print(f"step {step:5d} loss={loss:.4f} ({time.time()-t0:.0f}s)", flush=True)
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss at step {step}")
    train_s = time.time() - t0

    # ---- sliding-window inference (overlap 0.5, bump) + flip TTA ----
    window = (patch,) * 3
    stride = tuple(w // 2 for w in window)
    cover, imp, inv_weight = regular_cover_setup_device(test_shape, window, stride)
    vol = jnp.pad(
        img_te.astype(jnp.bfloat16),
        [(0, cv - s) for cv, s in zip(cover, test_shape)],
        mode="reflect",
    )[..., None]
    params = {"params": state.params["model"]}

    @jax.jit
    def infer(p, v):
        def afn(pp, windows):
            return model.apply(pp, windows)

        variants = [()]
        if tta:
            variants = [(), (0,), (1,), (2,)]
        acc = jnp.zeros(cover + (3,), jnp.float32)
        for axes in variants:
            vv = jnp.flip(v, axes) if axes else v
            out = _sliding_window_regular_device(
                p, vv, imp, inv_weight, apply_fn=afn, window=window,
                stride=stride, sw_batch=batch, out_channels=3,
                acc_dtype=jnp.float32,
            )
            if axes:
                out = jnp.flip(out, axes)
            acc = acc + out
        mean = acc / len(variants)
        # per-channel activations: sigmoid on the masks, tanh on the
        # distance regression (it was trained through tanh)
        pred = jnp.concatenate(
            [jax.nn.sigmoid(mean[..., 0:2]),
             jnp.clip(jnp.tanh(mean[..., 2:3]), 0.0, 1.0)], axis=-1)
        return jnp.round(pred * 255.0).astype(jnp.uint8)

    t0 = time.time()
    pred_q = infer(params, vol)
    pred_q = np.asarray(pred_q[: test_shape[0], : test_shape[1], : test_shape[2], :])
    gt = np.asarray(lbl_te).astype(np.int64)
    infer_s = time.time() - t0
    print(f"inference + fetch: {infer_s:.0f}s", flush=True)

    # ---- native decode + evaluate (host) ----
    bcd = np.moveaxis(pred_q.astype(np.float32) / 255.0, -1, 0)  # (3,Z,Y,X)
    t0 = time.time()

    def _score(seg):
        ar = adapted_rand(seg, gt)
        vs, vm = voi(seg, gt)
        return {
            "ap": round(float(average_precision(seg, gt)), 4),
            "arand": round(float(ar), 4),
            "voi": round(float(vs + vm), 4),
            "voi_split": round(float(vs), 4),
            "voi_merge": round(float(vm), 4),
            "n_segments": int(len(np.unique(seg)) - 1),
        }

    results = {}
    sweep = {}
    for bt, ct in [(0.8, 0.8), (0.9, 0.85), (0.9, 0.9), (0.95, 0.9)]:
        seg = decode_bcd_watershed(
            bcd, binary_threshold=bt, boundary_threshold=ct,
            seed_threshold=0.3, min_size=50,
        )
        sweep[f"{bt}/{ct}"] = _score(seg)
    best = max(sweep, key=lambda k: sweep[k]["ap"])
    results["bcd_watershed"] = {"best_params": best, "sweep": sweep, **sweep[best]}
    results["binary_cc"] = _score(decode_binary_cc(bcd, threshold=0.8, min_size=50))
    decode_s = time.time() - t0

    bw = results["bcd_watershed"]
    out = {
        "metric": "synthetic_blob_ap",
        "value": bw["ap"],
        "unit": "coco_ap (higher=better)",
        "detail": {
            "decoders": results,
            "gt_instances": int(len(np.unique(gt)) - 1),
            "steps": steps, "patch": patch, "batch": batch, "tta": tta,
            "train_s": round(train_s, 1), "infer_s": round(infer_s, 1),
            "decode_s": round(decode_s, 1),
            "final_loss": round(float(logs["loss_total"]), 4),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(out), flush=True)

    # BQ_QUALITY_FILE overrides the tracking file (tests point it at a tmp path)
    qfile = Path(os.environ.get("BQ_QUALITY_FILE") or ROOT / "QUALITY.md")
    header = "## Blob task (MitoEM-style synthetic, bcd watershed)"
    stamp = time.strftime("%Y-%m-%d %H:%M")
    tag = "pf" if os.environ.get("BQ_ARCH") == "patchify" else "base"
    line = (
        f"| {stamp} | {tag} | {bw['ap']:.4f} | {bw['voi']:.4f} | {bw['arand']:.4f} | "
        f"{bw['best_params']} | {results['binary_cc']['ap']:.4f} | "
        f"{steps} | {'on' if tta else 'off'} | {jax.devices()[0].platform} | "
        f"{train_s:.0f}s + {infer_s:.0f}s + {decode_s:.0f}s |\n"
    )
    from _qb_common import insert_table_row

    insert_table_row(
        qfile,
        "| date | arch | bcd AP | bcd VOI | bcd aRand | params | cc AP | steps | tta | platform | time |",
        f"\n{header}\n\n"
        "Sparse blob instances (warped ellipsoids + unlabeled clutter):\n"
        "train [binary, contour, distance] -> sliding window + flip TTA\n"
        "-> native bcd watershed -> COCO AP (MitoEM headline metric),\n"
        "aRand/VOI. bcd params picked by AP on this volume (oracle\n"
        "sweep, decode-health tracking).\n\n"
        "| date | arch | bcd AP | bcd VOI | bcd aRand | params | cc AP | steps | tta | platform | time |\n"
        "|---|---|---|---|---|---|---|---|---|---|---|\n",
        line,
    )
    print(f"total {time.time()-t_all:.0f}s; appended to QUALITY.md", flush=True)


if __name__ == "__main__":
    main()
