#!/usr/bin/env python
"""Quality benchmark: train MedNeXt-S on the on-device synthetic EM task and
evaluate through the FULL inference stack (sliding window, overlap 0.5, bump
blending, flip TTA) — the Lucchi++ recipe (tutorials/mito_lucchi.yaml;
reference headline Jaccard 0.935, README.md:42) on the highest-fidelity
synthetic stand-in we can generate, since the real volumes cannot reach this
host (zero egress) and the TPU tunnel moves ~1 MB/s (CLAUDE.md).

Everything stays on device: data generation (data/synthetic_jax.py), crop
sampling + flips, train steps, sliding-window inference, and the Jaccard
reduction; only scalars are fetched.

Env knobs: QB_STEPS (default 600), QB_PATCH (64), QB_BATCH (8),
QB_TRAIN_SHAPE / QB_TEST_SHAPE, QB_TTA (1), QB_PLATFORM (e.g. cpu).
Prints one JSON line {"metric": "synthetic_em_jaccard", ...} and appends to
QUALITY.md.
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
# repo-local persistent cache, split by backend (CLAUDE.md): CPU runs must
# not pollute the TPU cache dir
_cache = "jax_cpu" if os.environ.get("QB_PLATFORM") == "cpu" else "jax"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".cache" / _cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if os.environ.get("QB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["QB_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def _shape(env, default):
    v = os.environ.get(env)
    return tuple(int(x) for x in v.split(",")) if v else default


def main():
    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.data.synthetic_jax import (
        sample_patches,
        synthetic_em_volume,
        synthetic_em_volume_v2,
    )
    from pytorch_connectomics_tpu.inference.window import (
        predict_volume_device,
    )
    from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator
    from pytorch_connectomics_tpu.metrics.binary import jaccard_index
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.training.optim import build_optimizer
    from pytorch_connectomics_tpu.config.schema import OptimizationConfig
    from pytorch_connectomics_tpu.training.state import create_train_state, make_train_step

    steps = int(os.environ.get("QB_STEPS", "600"))
    patch = int(os.environ.get("QB_PATCH", "64"))
    batch = int(os.environ.get("QB_BATCH", "8"))
    train_shape = _shape("QB_TRAIN_SHAPE", (64, 384, 384))
    test_shape = _shape("QB_TEST_SHAPE", (64, 256, 256))
    tta = os.environ.get("QB_TTA", "1") == "1"
    # v2 (default): distractors differ only by texture frequency + section
    # defects — non-saturating (v1 reached 0.9966; QUALITY.md)
    task = int(os.environ.get("QB_TASK", "2"))

    print(f"devices: {jax.devices()}", flush=True)
    t_all = time.time()

    # ---- data (on device) ----
    gen = synthetic_em_volume_v2 if task == 2 else synthetic_em_volume
    img_tr, lbl_tr = gen(jax.random.PRNGKey(1), train_shape)
    # QB_TEST_SEED: evaluate on a different scene (e.g. the synthetic:// URL
    # scene of a CLI run — seed = crc32('em2'+<name sans image/label tags>))
    img_te, lbl_te = gen(
        jax.random.PRNGKey(int(os.environ.get("QB_TEST_SEED", "2"))), test_shape
    )

    # ---- model + loss + optimizer (the Lucchi recipe, patch-size scaled) ----
    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 1,
            "input_size": [patch] * 3,
            # QB_ARCH=patchify trains the space-to-depth stem variant
            # (throughput lever; quality must hold vs the default row);
            # QB_PATCHIFY_K=4 uses the overlapping (k=4, s=2) embed
            "mednext": {"size": "S", "kernel_size": 3,
                        "patchify_stem": os.environ.get("QB_ARCH") == "patchify",
                        "patchify_kernel": int(os.environ.get("QB_PATCHIFY_K", "2")),
                        # QB_PATCHIFY_STRIDE=1,2,2: anisotropic stem (z stays
                        # full-res; EM anisotropy argument)
                        "patchify_stride": (
                            [int(v) for v in os.environ["QB_PATCHIFY_STRIDE"].split(",")]
                            if os.environ.get("QB_PATCHIFY_STRIDE") else None),
                        # QB_PATCHIFY_HEAD=refine: raw-input-guided full-res
                        # pointwise refinement head (quality-recovery lever)
                        "patchify_head": os.environ.get("QB_PATCHIFY_HEAD", "linear"),
                        # QB_PF_W0=16: hybrid thin full-res stage of width 16
                        "patchify_full_res_width": (
                            int(os.environ["QB_PF_W0"]) if os.environ.get("QB_PF_W0") else None)},
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
    orch = LossOrchestrator(cfg.loss)

    def apply_fn(v, x, train=False, rngs=None):
        # make_train_step passes train=True + a dropout rng stream; forward
        # both (rngs is unused by dropout-free MedNeXt but must be accepted)
        return model.apply(v, x, train=train, rngs=rngs)

    # QB_DISTILL_TEACHER=<msgpack>: distill a frozen stock-arch teacher into
    # this model (QB_DISTILL_ALPHA / QB_DISTILL_TEMP / QB_DISTILL_MODE).
    # Teacher arch = the same config with the patchify stem off.
    distill_spec = None
    if os.environ.get("QB_DISTILL_TEACHER"):
        from pytorch_connectomics_tpu.training.distill import (
            DistillSpec,
            load_teacher_params,
        )

        t_cfg = build_dataclass(
            ModelConfig,
            {
                "arch": {"type": "mednext"},
                "in_channels": 1, "out_channels": 1,
                "input_size": [patch] * 3,
                "mednext": {"size": "S", "kernel_size": 3},
                "loss": {"losses": [{"function": "BCEWithLogitsLoss"}]},
                "compute_dtype": "bfloat16",
            },
        )
        teacher = build_model(t_cfg)
        t_params = load_teacher_params(os.environ["QB_DISTILL_TEACHER"])
        distill_spec = DistillSpec(
            apply_fn=lambda v, x: teacher.apply(v, x, train=False),
            params=t_params,
            alpha=float(os.environ.get("QB_DISTILL_ALPHA", "0.5")),
            temperature=float(os.environ.get("QB_DISTILL_TEMP", "2.0")),
            mode=os.environ.get("QB_DISTILL_MODE", "sigmoid"),
        )

    train_step = jax.jit(make_train_step(apply_fn, orch, tx, distill=distill_spec))
    state = create_train_state(variables["params"], tx)

    sample = jax.jit(
        lambda k: sample_patches(k, img_tr, lbl_tr, (patch,) * 3, batch)
    )

    # ---- train (or QB_LOAD_PARAMS=<msgpack>: reuse saved weights — e.g.
    # inference-only sweeps over overlap/TTA on identical weights) ----
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    logs = {}
    if os.environ.get("QB_LOAD_PARAMS"):
        from pytorch_connectomics_tpu.training.distill import load_teacher_params

        loaded = load_teacher_params(os.environ["QB_LOAD_PARAMS"])
        state = state.replace(params={**state.params, "model": loaded})
        steps = 0
        logs = {"loss_total": jnp.zeros(())}
        print(f"loaded params from {os.environ['QB_LOAD_PARAMS']}", flush=True)
    # QB_HOST_PIPE=1: replace on-device crop sampling with the PRODUCTION
    # host data path (VolumeDataset over synthetic:// URLs -> PatchPipeline
    # -> host->device transfer), keeping the QB trainer identical — a
    # bisection probe for CLI-vs-harness quality gaps (same scene family,
    # different plumbing).
    host_iter = None
    if os.environ.get("QB_HOST_PIPE") == "1" and steps > 0:
        from pytorch_connectomics_tpu.config.schema import LabelTransformConfig
        from pytorch_connectomics_tpu.data.datasets import VolumeDataset
        from pytorch_connectomics_tpu.data.pipeline import PatchPipeline

        zyx = ",".join(str(v) for v in train_shape)
        hp_ds = VolumeDataset(
            f"synthetic://em2/qbhp_image?shape={zyx}",
            f"synthetic://em2/qbhp_label?shape={zyx}",
            patch_size=(patch,) * 3,
        )
        hp_pipe = PatchPipeline(
            hp_ds, batch, seed=0,
            target_cfg=build_dataclass(
                LabelTransformConfig, {"targets": [{"name": "binary"}]}
            ),
            train=True,
        )
        host_iter = hp_pipe.iterate(0)
        print("QB_HOST_PIPE: production host pipeline feeding the QB trainer",
              flush=True)
    for step in range(steps):
        if host_iter is not None:
            b = next(host_iter)
            im, lb = jnp.asarray(b["image"]), jnp.asarray(b["label"])
        else:
            im, lb = sample(jax.random.fold_in(key, step))
        state, logs = train_step(state, {"image": im, "label": lb})
        if step % 100 == 0 or step == steps - 1:
            loss = float(logs["loss_total"])  # sync point
            print(f"step {step:5d} loss={loss:.4f} ({time.time()-t0:.0f}s)", flush=True)
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss at step {step}")
    train_s = time.time() - t0

    # QB_SAVE_PARAMS=<path>: persist the trained weights (flax msgpack) so a
    # later run can reuse them — e.g. as the distillation teacher
    # (training/distill.py) or for decode-only sweeps. One-time ~25 MB fetch
    # through the tunnel.
    if os.environ.get("QB_SAVE_PARAMS"):
        from flax import serialization

        p = Path(os.environ["QB_SAVE_PARAMS"])
        p.parent.mkdir(parents=True, exist_ok=True)
        host_params = jax.device_get(state.params["model"])
        p.write_bytes(serialization.to_bytes(host_params))
        print(f"saved params -> {p} ({p.stat().st_size/1e6:.1f} MB)", flush=True)

    # ---- full sliding-window inference (QB_OVERLAP, default 0.5, bump) ----
    # overlap is a first-class reference knob (schema/inference.py:60); the
    # window inflation it causes decides the output rate (docs/performance.md)
    overlap = float(os.environ.get("QB_OVERLAP", "0.5"))
    window = (patch,) * 3
    stride = tuple(max(1, int(round(w * (1.0 - overlap)))) for w in window)
    # unified on-device engine: exact separable blend; parity engine when
    # stride divides the window, snap-grid HBM accumulator otherwise
    # (overlap 0.25/0.125 -> strides 48/56 don't divide 64)
    vol = img_te.astype(jnp.bfloat16)[..., None]

    params = {"params": state.params["model"]}

    @jax.jit
    def infer(p, v):
        def afn(pp, windows):
            return model.apply(pp, windows)

        variants = [(v, None)]
        if tta:
            variants = [
                (v, None), (jnp.flip(v, 0), 0), (jnp.flip(v, 1), 1), (jnp.flip(v, 2), 2),
            ]
        acc = jnp.zeros(test_shape + (1,), jnp.float32)
        for vv, ax in variants:
            out = predict_volume_device(
                p, vv, afn, window, stride, sw_batch=batch, out_channels=1,
                acc_dtype=jnp.float32,
            )
            if ax is not None:
                out = jnp.flip(out, ax)
            acc = acc + out
        return acc / len(variants)

    t0 = time.time()
    pred = infer(params, vol)[..., 0]
    jac = float(jaccard_index(pred, lbl_te.astype(jnp.float32), from_logits=True))
    infer_s = time.time() - t0

    # NOTE: no "vs_baseline" here on purpose — the 0.935 Lucchi++ headline is a
    # REAL-data number; comparing a synthetic-task Jaccard against it would be
    # misleading (VERDICT r2 Weak #4). This metric tracks pipeline correctness
    # round-over-round only.
    result = {
        "metric": "synthetic_v2_jaccard",
        "value": round(jac, 4),
        "unit": "jaccard",
        "detail": {
            "task": task, "steps": steps, "patch": patch, "batch": batch,
            "train_s": round(train_s, 1), "infer_s": round(infer_s, 1),
            "tta": tta, "final_loss": round(float(logs["loss_total"]), 4),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result), flush=True)
    # QB_QUALITY_FILE overrides the tracking file (tests point it at a tmp path)
    qfile = Path(os.environ.get("QB_QUALITY_FILE") or ROOT / "QUALITY.md")
    stamp = time.strftime("%Y-%m-%d %H:%M")
    task_tag = f"v{task}"
    if os.environ.get("QB_ARCH") == "patchify":
        task_tag += "/pf" + (
            f"k{os.environ['QB_PATCHIFY_K']}" if os.environ.get("QB_PATCHIFY_K", "2") != "2" else ""
        )
        if os.environ.get("QB_PATCHIFY_HEAD") == "refine":
            task_tag += "r"
        if os.environ.get("QB_PF_W0"):
            task_tag += f"h{os.environ['QB_PF_W0']}"
        if os.environ.get("QB_PATCHIFY_STRIDE"):
            task_tag += "s" + os.environ["QB_PATCHIFY_STRIDE"].replace(",", "")
    if os.environ.get("QB_DISTILL_TEACHER"):
        task_tag += f"/ds{os.environ.get('QB_DISTILL_ALPHA', '0.5')}"
    if overlap != 0.5:
        task_tag += f"/ov{overlap:g}"
    if os.environ.get("QB_LOAD_PARAMS"):
        task_tag += "/ld"
    line = (
        f"| {stamp} | {task_tag} | {jac:.4f} | {steps} | {patch}^3 | "
        f"{'on' if tta else 'off'} | {jax.devices()[0].platform} | "
        f"{train_s:.0f}s + {infer_s:.0f}s |\n"
    )
    from _qb_common import insert_table_row

    insert_table_row(
        qfile,
        "| date | task | jaccard | steps | patch | tta | platform | time |",
        "# Quality tracking — synthetic EM mito Jaccard\n\n"
        "Full-pipeline (train -> sliding-window 0.5-overlap bump + flip-TTA ->\n"
        "Jaccard) on the on-device synthetic EM task (data/synthetic_jax.py).\n"
        "Stand-in for the Lucchi++ headline (0.935) until real data can reach\n"
        "the TPU host; tracked round-over-round.\n\n"
        "| date | task | jaccard | steps | patch | tta | platform | time |\n"
        "|---|---|---|---|---|---|---|---|\n",
        line,
    )
    print(f"total {time.time()-t_all:.0f}s; appended to QUALITY.md", flush=True)


if __name__ == "__main__":
    main()
