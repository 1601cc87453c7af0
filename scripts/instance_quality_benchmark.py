#!/usr/bin/env python
"""Instance-segmentation quality benchmark: the affinity -> decode half of
the framework, end-to-end on device.

Trains MedNeXt-S to predict short-range affinities on the on-device
CREMI-style synthetic neuron-tissue task (``data/synthetic_jax.py::
synthetic_instance_volume`` — warped-Voronoi cells with dark membranes),
runs sliding-window inference with affinity-aware flip TTA
(``inference/tta.py::affinity_flip_align``), fetches the quantized affinity
volume once (~3 MB uint8 through the slow tunnel), then exercises the NATIVE
decode stack (waterz agglomeration threshold sweep, affinity-CC, mutex
watershed) and scores adapted-Rand + VOI against the ground-truth instances.

This is the synthetic stand-in for the reference's instance headlines
(CREMI/SNEMI waterz pipelines, NISB affinity-CC @0.75 — reference
``tutorials/``, ``decoding/decoders/waterz.py:33``, ``segmentation.py:498``)
the same way scripts/quality_benchmark.py stands in for Lucchi++ (real data
cannot reach this host — QUALITY.md). Tracks the full
train -> infer -> decode -> evaluate instance pipeline round-over-round.

Env knobs: IQ_STEPS (600), IQ_PATCH (64), IQ_BATCH (8), IQ_TRAIN_SHAPE
(64,256,256), IQ_TEST_SHAPE (64,128,128), IQ_CELLS_PER_MVOX (180),
IQ_TTA (1), IQ_PLATFORM (e.g. cpu), IQ_ARCH=patchify,
IQ_PATCHIFY_STRIDE=1,2,2 (aniso stem — the shipped fast recipe).
Prints one JSON line and appends to QUALITY.md's instance table.
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
# repo-local persistent cache, split by backend (CLAUDE.md)
_cache = "jax_cpu" if os.environ.get("IQ_PLATFORM") == "cpu" else "jax"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".cache" / _cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if os.environ.get("IQ_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IQ_PLATFORM"])

import jax.numpy as jnp
import numpy as np

SHORT = ((0, 0, 1), (0, 1, 0), (1, 0, 0))  # x, y, z — deepem high-end
# mutex-watershed profile: short-range attractive + long-range repulsive
# (reference decoders/mutex_watershed.py convention)
LONG = SHORT + ((0, 0, 8), (0, 8, 0), (4, 0, 0))


def _shape(env, default):
    v = os.environ.get(env)
    return tuple(int(x) for x in v.split(",")) if v else default


def _cells(shape, per_mvox):
    return max(8, int(per_mvox * np.prod(shape) / 1e6))


def main():
    from pytorch_connectomics_tpu.config.schema import (
        ModelConfig,
        OptimizationConfig,
        build_dataclass,
    )
    from pytorch_connectomics_tpu.data.synthetic_jax import (
        affinity_targets,
        sample_patches,
        synthetic_instance_volume,
    )
    from pytorch_connectomics_tpu.decoding.decoders import (
        decode_affinity_cc,
        decode_mutex_watershed,
        decode_waterz,
    )
    from pytorch_connectomics_tpu.inference.tta import affinity_flip_align
    from pytorch_connectomics_tpu.inference.window import (
        predict_volume_device,
    )
    from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator
    from pytorch_connectomics_tpu.metrics.seg import adapted_rand, voi
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.training.optim import build_optimizer
    from pytorch_connectomics_tpu.training.state import (
        create_train_state,
        make_train_step,
    )

    steps = int(os.environ.get("IQ_STEPS", "600"))
    patch = int(os.environ.get("IQ_PATCH", "64"))
    batch = int(os.environ.get("IQ_BATCH", "8"))
    train_shape = _shape("IQ_TRAIN_SHAPE", (64, 256, 256))
    test_shape = _shape("IQ_TEST_SHAPE", (64, 128, 128))
    per_mvox = float(os.environ.get("IQ_CELLS_PER_MVOX", "180"))
    tta = os.environ.get("IQ_TTA", "1") == "1"
    # IQ_OFFSETS=long adds long-range repulsive channels (mutex training)
    offsets = LONG if os.environ.get("IQ_OFFSETS") == "long" else SHORT
    # IQ_ELONGATION>1: fiber-like cells stretched in z (meaningful NERL)
    elong = float(os.environ.get("IQ_ELONGATION", "1"))
    n_ch = len(offsets)

    print(f"devices: {jax.devices()}", flush=True)
    t_all = time.time()

    # ---- data (on device; instances stay there until the final fetch) ----
    img_tr, lbl_tr = synthetic_instance_volume(
        jax.random.PRNGKey(11), train_shape,
        n_cells=_cells(train_shape, per_mvox), elongation=elong,
    )
    img_te, lbl_te = synthetic_instance_volume(
        jax.random.PRNGKey(12), test_shape,
        n_cells=_cells(test_shape, per_mvox), elongation=elong,
    )

    # ---- model: affinity head, one channel per offset (BCE + Dice,
    # offset-valid masks via the orchestrator's affinity groups) ----
    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": n_ch,
            "input_size": [patch] * 3,
            "mednext": {
                "size": "S",
                "kernel_size": 3,
                "patchify_stem": os.environ.get("IQ_ARCH") == "patchify",
                # IQ_PATCHIFY_STRIDE=1,2,2: anisotropic stem (z stays
                # full-res — the shipped fast recipe), mirrors QB knob
                "patchify_stride": (
                    [int(v) for v in os.environ["IQ_PATCHIFY_STRIDE"].split(",")]
                    if os.environ.get("IQ_PATCHIFY_STRIDE") else None),
            },
            "loss": {
                "losses": [
                    {"function": "BCEWithLogitsLoss", "weight": 1.0},
                    {"function": "DiceLoss", "weight": 1.0},
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
    orch = LossOrchestrator(
        cfg.loss,
        affinity_groups=[{"start": 0, "end": n_ch, "offsets": list(offsets)}],
    )

    def apply_fn(v, x, train=False, rngs=None):
        # make_train_step passes train=True + a dropout rng stream; forward
        # both (rngs is unused by dropout-free MedNeXt but must be accepted)
        return model.apply(v, x, train=train, rngs=rngs)

    train_step = jax.jit(make_train_step(apply_fn, orch, tx))
    state = create_train_state(variables["params"], tx)

    # Crops + flips of the INSTANCE labels, then per-patch affinities on
    # device: flipping ids commutes with the target transform (unlike
    # flipping affinity channels), so augmentation stays exact.
    @jax.jit
    def sample(k):
        im, lb = sample_patches(k, img_tr, lbl_tr.astype(jnp.float32), (patch,) * 3, batch)
        aff = affinity_targets(lb[..., 0].astype(jnp.int32), offsets)
        return im, aff

    # ---- train (or IQ_LOAD_PARAMS=<msgpack>: reuse saved weights so
    # inference-only sweeps, e.g. the overlap frontier, run on IDENTICAL
    # weights and isolate the knob from training noise) ----
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    logs = {}
    if os.environ.get("IQ_LOAD_PARAMS"):
        from pytorch_connectomics_tpu.training.distill import load_teacher_params

        loaded = load_teacher_params(os.environ["IQ_LOAD_PARAMS"])
        state = state.replace(params={**state.params, "model": loaded})
        steps = 0
        logs = {"loss_total": jnp.zeros(())}
        print(f"loaded params from {os.environ['IQ_LOAD_PARAMS']}", flush=True)
    for step in range(steps):
        im, aff = sample(jax.random.fold_in(key, step))
        state, logs = train_step(state, {"image": im, "label": aff})
        if step % 100 == 0 or step == steps - 1:
            loss = float(logs["loss_total"])  # sync point
            print(f"step {step:5d} loss={loss:.4f} ({time.time()-t0:.0f}s)", flush=True)
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss at step {step}")
    train_s = time.time() - t0

    # IQ_SAVE_PARAMS=<path>: persist the trained weights (flax msgpack) so a
    # later inference-only run can reuse them (one-time ~25 MB tunnel fetch)
    if os.environ.get("IQ_SAVE_PARAMS"):
        from flax import serialization

        p = Path(os.environ["IQ_SAVE_PARAMS"])
        p.parent.mkdir(parents=True, exist_ok=True)
        host_params = jax.device_get(state.params["model"])
        p.write_bytes(serialization.to_bytes(host_params))
        print(f"saved params -> {p} ({p.stat().st_size/1e6:.1f} MB)", flush=True)

    # ---- sliding-window inference (IQ_OVERLAP, default 0.5, bump) ----
    overlap = float(os.environ.get("IQ_OVERLAP", "0.5"))
    window = (patch,) * 3
    stride = tuple(max(1, int(round(w * (1.0 - overlap)))) for w in window)
    # unified on-device engine: exact separable blend; parity engine when
    # stride divides the window, snap-grid HBM accumulator otherwise
    vol = img_te.astype(jnp.bfloat16)[..., None]

    params = {"params": state.params["model"]}

    @jax.jit
    def infer(p, v):
        def afn(pp, windows):
            return model.apply(pp, windows)

        variants = [()]
        if tta:
            variants = [(), (0,), (1,), (2,)]
        acc = jnp.zeros(test_shape + (n_ch,), jnp.float32)
        for axes in variants:
            vv = jnp.flip(v, axes) if axes else v
            out = predict_volume_device(
                p, vv, afn, window, stride, sw_batch=batch,
                out_channels=n_ch, acc_dtype=jnp.float32,
            )
            if axes:
                out = jnp.flip(out, axes)
                out = affinity_flip_align(out, axes, offsets)
            acc = acc + out
        aff = jax.nn.sigmoid(acc / len(variants))
        # quantize for the ~1 MB/s tunnel: 3 channels uint8
        return jnp.round(aff * 255.0).astype(jnp.uint8)

    t0 = time.time()
    pred_q = np.asarray(infer(params, vol))
    gt = np.asarray(lbl_te).astype(np.int64)
    infer_s = time.time() - t0
    print(f"inference + fetch: {infer_s:.0f}s", flush=True)

    # ---- native decode + evaluate (host) ----
    aff_host = np.moveaxis(pred_q.astype(np.float32) / 255.0, -1, 0)  # (C,Z,Y,X)
    t0 = time.time()
    results = {}

    sweep = {}
    wz_thresholds = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    by_thr = decode_waterz(
        aff_host[:3], fragment_threshold=0.5, thresholds=wz_thresholds,
        return_all_thresholds=True, min_size=20,
    )
    for thr, seg in by_thr.items():
        ar = adapted_rand(seg, gt)
        vs, vm = voi(seg, gt)
        sweep[thr] = {"arand": round(float(ar), 4), "voi": round(float(vs + vm), 4)}
    best_thr = min(sweep, key=lambda t: sweep[t]["voi"])
    seg_wz = by_thr[best_thr]
    results["waterz"] = {
        "best_threshold": best_thr, "sweep": {str(k): v for k, v in sweep.items()},
        **_score(seg_wz, gt),
    }

    seg_cc = decode_affinity_cc(aff_host[:3], threshold=0.75, min_size=20)
    results["affinity_cc@0.75"] = _score(seg_cc, gt)

    seg_mx = decode_mutex_watershed(
        aff_host, offsets=["-".join(str(x) for x in o) for o in offsets], min_size=20
    )
    results["mutex"] = _score(seg_mx, gt)
    decode_s = time.time() - t0

    headline = results["waterz"]["voi"]
    out = {
        "metric": "synthetic_instance_voi",
        "value": round(headline, 4),
        "unit": "voi_sum (lower=better)",
        "detail": {
            "decoders": results,
            "gt_instances": int(len(np.unique(gt))),
            "steps": steps, "patch": patch, "batch": batch, "tta": tta,
            "train_s": round(train_s, 1), "infer_s": round(infer_s, 1),
            "decode_s": round(decode_s, 1),
            "final_loss": round(float(logs["loss_total"]), 4),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(out), flush=True)

    # IQ_QUALITY_FILE overrides the tracking file (tests point it at a tmp path)
    qfile = Path(os.environ.get("IQ_QUALITY_FILE") or ROOT / "QUALITY.md")
    header = "## Instance task (CREMI-style synthetic, affinity -> decode)"
    stamp = time.strftime("%Y-%m-%d %H:%M")
    tag = "pf" if os.environ.get("IQ_ARCH") == "patchify" else "base"
    # the stride suffix only applies when the patchify stem is actually
    # built — IQ_PATCHIFY_STRIDE is a no-op for the stock arch
    if os.environ.get("IQ_PATCHIFY_STRIDE") and os.environ.get("IQ_ARCH") == "patchify":
        tag += "s" + os.environ["IQ_PATCHIFY_STRIDE"].replace(",", "")
    if os.environ.get("IQ_OFFSETS") == "long":
        tag += "/lr"
    if elong != 1:
        tag += f"/e{elong:g}"
    if overlap != 0.5:
        tag += f"/ov{overlap:g}"
    if os.environ.get("IQ_LOAD_PARAMS"):
        tag += "/ld"
    wz = results["waterz"]
    cc = results["affinity_cc@0.75"]
    line = (
        f"| {stamp} | {tag} | {wz['voi']:.4f} | {wz['arand']:.4f} | "
        f"{wz['nerl']:.4f} | {wz['ap']:.4f} | {best_thr} | "
        f"{cc['voi']:.4f} | {cc['nerl']:.4f} | {results['mutex']['voi']:.4f} | "
        f"{steps} | {'on' if tta else 'off'} | {jax.devices()[0].platform} | "
        f"{train_s:.0f}s + {infer_s:.0f}s + {decode_s:.0f}s |\n"
    )
    from _qb_common import insert_table_row

    insert_table_row(
        qfile,
        "| date | arch | wz VOI | wz aRand | wz NERL | wz AP | wz thr | cc VOI | cc NERL | mutex VOI | steps | tta | platform | time |",
        f"\n{header}\n\n"
        "Full instance pipeline: train affinities on the warped-Voronoi\n"
        "cell task -> sliding window + affinity-aligned flip TTA -> native\n"
        "waterz/CC/mutex decode -> adapted-Rand + VOI. Lower is better.\n"
        "waterz VOI is at the best sweep threshold (chosen on this volume\n"
        "-- an oracle sweep, tracking decode+tuner health, not held-out\n"
        "generalization).\n\n"
        "| date | arch | wz VOI | wz aRand | wz NERL | wz AP | wz thr | cc VOI | cc NERL | mutex VOI | steps | tta | platform | time |\n"
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|\n",
        line,
    )
    print(f"total {time.time()-t_all:.0f}s; appended to QUALITY.md", flush=True)


_GT_SKELETONS = {}


def _score(seg, gt):
    """aRand + VOI (SNEMI conventions), COCO AP (MitoEM convention), and
    NERL over native-TEASAR gt skeletons (NISB convention) — one scorer for
    every reference instance headline (reference README.md:43-45)."""
    from pytorch_connectomics_tpu.metrics.nerl import compute_nerl
    from pytorch_connectomics_tpu.metrics.seg import adapted_rand, average_precision, voi
    from pytorch_connectomics_tpu.metrics.skeleton import skeletonize_volume

    if "gt" not in _GT_SKELETONS:
        _GT_SKELETONS["gt"] = skeletonize_volume(gt)
    ar = adapted_rand(seg, gt)
    vs, vm = voi(seg, gt)
    nerl = compute_nerl(seg, skeletons=_GT_SKELETONS["gt"])
    return {
        "arand": round(float(ar), 4),
        "voi": round(float(vs + vm), 4),
        "voi_split": round(float(vs), 4),
        "voi_merge": round(float(vm), 4),
        "ap": round(float(average_precision(seg, gt)), 4),
        "nerl": round(float(nerl["nerl"]), 4),
        "n_segments": int(len(np.unique(seg))),
    }


if __name__ == "__main__":
    main()
