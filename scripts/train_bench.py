#!/usr/bin/env python
"""Training-step throughput benchmark on the attached accelerator.

Runs the REAL jitted train step (model fwd+bwd + loss orchestration +
optimizer) on on-device synthetic data and prints steps/sec and trained
Mvox/s. Complements bench.py (inference) and quality_benchmark.py
(full-pipeline quality).

Env knobs: TB_STEPS (default 200), TB_PATCH (64), TB_BATCH (8),
TB_SIZE (MedNeXt size, S), TB_PLATFORM (e.g. cpu).
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
# repo-local persistent cache, split by backend (CLAUDE.md)
_cache = "jax_cpu" if os.environ.get("TB_PLATFORM") == "cpu" else "jax"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".cache" / _cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if os.environ.get("TB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TB_PLATFORM"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from pytorch_connectomics_tpu.config.schema import (
        ModelConfig,
        OptimizationConfig,
        build_dataclass,
    )
    from pytorch_connectomics_tpu.data.synthetic_jax import (
        sample_patches,
        synthetic_em_volume_v2,
    )
    from pytorch_connectomics_tpu.losses.orchestrator import LossOrchestrator
    from pytorch_connectomics_tpu.models import build_model, init_model
    from pytorch_connectomics_tpu.training.optim import build_optimizer
    from pytorch_connectomics_tpu.training.state import (
        create_train_state,
        make_train_step,
    )

    steps = int(os.environ.get("TB_STEPS", "200"))
    patch = int(os.environ.get("TB_PATCH", "64"))
    batch = int(os.environ.get("TB_BATCH", "8"))
    size = os.environ.get("TB_SIZE", "S")
    print(f"devices: {jax.devices()}", flush=True)

    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1,
            "out_channels": 1,
            "input_size": [patch] * 3,
            "mednext": {"size": size, "kernel_size": 3},
            "loss": {"losses": [{"function": "DiceLoss", "kwargs": {"sigmoid": True}}]},
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    opt_cfg = build_dataclass(
        OptimizationConfig,
        {"optimizer": {"name": "AdamW", "lr": 1e-3}, "max_epochs": 1,
         "n_steps_per_epoch": steps},
    )
    tx, _ = build_optimizer(opt_cfg, steps)
    orch = LossOrchestrator(cfg.loss)

    def apply_fn(v, x, train=False, rngs=None):
        # make_train_step passes train=True + a dropout rng stream; forward
        # both (rngs is unused by dropout-free MedNeXt but must be accepted)
        return model.apply(v, x, train=train, rngs=rngs)

    train_step = jax.jit(make_train_step(apply_fn, orch, tx))
    state = create_train_state(variables["params"], tx)

    img, lbl = synthetic_em_volume_v2(
        jax.random.PRNGKey(1), (patch, 2 * patch, 2 * patch)
    )
    sample = jax.jit(lambda k: sample_patches(k, img, lbl, (patch,) * 3, batch))

    def one(state, s):
        b_img, b_lbl = sample(jax.random.fold_in(jax.random.PRNGKey(2), s))
        return train_step(state, {"image": b_img, "label": b_lbl})

    # warmup/compile, then measure with ONE final sync
    state, logs = one(state, 0)
    _ = float(logs["loss_total"])
    t0 = time.time()
    for s in range(1, steps + 1):
        state, logs = one(state, s)
    _ = float(logs["loss_total"])
    dt = time.time() - t0
    sps = steps / dt
    mvox = sps * batch * patch**3 / 1e6
    print(
        json.dumps(
            {
                "metric": "train_step_throughput",
                "value": round(sps, 2),
                "unit": "steps/sec",
                "detail": {
                    "patch": patch, "batch": batch, "size": size,
                    "trained_mvox_per_s": round(mvox, 1),
                    "final_loss": round(float(logs["loss_total"]), 4),
                    "platform": jax.devices()[0].platform,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
