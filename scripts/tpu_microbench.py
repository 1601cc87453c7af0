#!/usr/bin/env python
"""Op-level TPU micro-benchmarks for the MedNeXt hot path.

Times (on the real chip, scalar-fetch sync per CLAUDE.md):
  - dense matmul sanity (MXU health)
  - XLA depthwise 3^3 conv at every MedNeXt-S stage shape
  - XLA pointwise conv pair (expand+compress) at stage-0 shape
  - per-channel GroupNorm at stage-0 shape
  - full MedNeXt-S forward, batch 8
  - VPU FMA-rate probe (Pallas, 27-tap style)

Writes one JSON line per measurement to stdout and results to
outputs/microbench.jsonl. Run in background; never timeout-kill (TPU
tunnel wedges).
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(Path(__file__).resolve().parents[1] / ".cache" / "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

OUT = []


def sync_scalar(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def fetch_latency():
    t0 = time.time()
    _ = float(jnp.zeros(()) + 1.0)
    return time.time() - t0


def timeit(name, fn, *args, reps=3, flops=None, bytes_moved=None):
    """fn(*args) -> array. Compile+warm once, then time reps with one sync."""
    f = jax.jit(fn)
    out = f(*args)
    _ = sync_scalar(out)  # warm + sync
    lat = fetch_latency()
    t0 = time.time()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(reps):
        acc = acc + jnp.sum(f(*args).astype(jnp.float32))
    _ = float(acc)
    dt = max(1e-9, (time.time() - t0) - lat) / reps
    rec = {"name": name, "ms": round(dt * 1e3, 3)}
    if flops:
        rec["tflops"] = round(flops / dt / 1e12, 2)
    if bytes_moved:
        rec["GBps"] = round(bytes_moved / dt / 1e9, 1)
    print(json.dumps(rec), flush=True)
    OUT.append(rec)
    return dt


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    key = jax.random.PRNGKey(0)

    # 1. MXU sanity
    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    timeit("matmul_8192_bf16", lambda a: a @ a, a, flops=2 * 8192**3)

    # 2. depthwise 3^3 conv at MedNeXt-S stage shapes (NDHWC)
    stages = [
        (8, 112, 32),
        (8, 56, 64),
        (8, 28, 128),
        (8, 14, 256),
        (8, 7, 512),
    ]
    def dwconv(x, w):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )
    for b, s, c in stages:
        x = jax.random.normal(key, (b, s, s, s, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, 1, c), jnp.bfloat16)
        vox = b * s**3
        timeit(
            f"xla_dw3_{s}c{c}", dwconv, x, w,
            flops=vox * c * 27 * 2,
            bytes_moved=vox * c * 2 * 2,
        )

    # 3. pointwise pair at stage-0 shape
    b, s, c, r = 8, 112, 32, 2
    x = jax.random.normal(key, (b, s, s, s, c), jnp.bfloat16)
    w1 = jax.random.normal(key, (1, 1, 1, c, c * r), jnp.bfloat16)
    w2 = jax.random.normal(key, (1, 1, 1, c * r, c), jnp.bfloat16)
    def pwpair(x, w1, w2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = jax.nn.gelu(y)
        return jax.lax.conv_general_dilated(
            y, w2, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    vox = b * s**3
    timeit("xla_pw_pair_112c32", pwpair, x, w1, w2,
           flops=vox * (c * c * r * 2) * 2,
           bytes_moved=vox * c * 2 * 2)

    # 3b. same as pure matmuls on reshaped (N, C)
    def mmpair(x, w1, w2):
        n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
        y = x.reshape(n, x.shape[-1]) @ w1.reshape(c, c * r)
        y = jax.nn.gelu(y)
        return (y @ w2.reshape(c * r, c)).reshape(x.shape)
    timeit("xla_mm_pair_112c32", mmpair, x, w1, w2,
           flops=vox * (c * c * r * 2) * 2,
           bytes_moved=vox * c * 2 * 2)

    # 4. per-channel GroupNorm (InstanceNorm) stage-0
    def gn(x, g, bta):
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=(1, 2, 3), keepdims=True)
        var = xf.var(axis=(1, 2, 3), keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + bta).astype(x.dtype)
    g = jnp.ones((c,), jnp.float32)
    bta = jnp.zeros((c,), jnp.float32)
    timeit("gn_112c32", gn, x, g, bta, bytes_moved=vox * c * 2 * 2)

    # 5. full MedNeXt-S forward
    from pytorch_connectomics_tpu.config.schema import ModelConfig, build_dataclass
    from pytorch_connectomics_tpu.models import build_model, init_model

    cfg = build_dataclass(
        ModelConfig,
        {
            "arch": {"type": "mednext"},
            "in_channels": 1, "out_channels": 1,
            "input_size": [112, 112, 112],
            "mednext": {"size": "S", "kernel_size": 3},
            "loss": {"losses": [{"function": "DiceLoss"}]},
            "compute_dtype": "bfloat16",
        },
    )
    model = build_model(cfg)
    params = init_model(model, cfg, jax.random.PRNGKey(0))
    xin = jax.random.normal(key, (8, 112, 112, 112, 1), jnp.bfloat16)
    dt = timeit("mednext_s_fwd_b8", lambda p, v: model.apply(p, v), params, xin, reps=2)
    print(json.dumps({"name": "mednext_s_fwd_mvoxps", "mvox_s": round(8 * 112**3 / dt / 1e6, 1)}), flush=True)

    # 6. VPU FMA probe: 27-tap accumulate on a folded (Y, XC) block
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Y, XC = 128, 3584

    def vpu_kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros_like(x_ref[:], dtype=jnp.float32)
        xv = x_ref[:]
        for t in range(27):
            acc = acc + xv.astype(jnp.float32) * w_ref[t, 0]
        o_ref[:] = acc.astype(o_ref.dtype)

    def vpu_probe(x, w):
        return pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[0],),
            in_specs=[
                pl.BlockSpec((1, Y, XC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, Y, XC), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )(x, w)

    nblk = 8 * 112
    xb = jax.random.normal(key, (nblk, Y, XC), jnp.bfloat16)
    wts = jnp.ones((27, 1), jnp.float32)
    try:
        timeit("vpu_fma27_bf16", vpu_probe, xb, wts,
               flops=nblk * Y * XC * 27 * 2,
               bytes_moved=nblk * Y * XC * 2 * 2)
    except Exception as e:
        print(json.dumps({"name": "vpu_fma27_bf16", "error": str(e)[:300]}), flush=True)

    Path("outputs").mkdir(exist_ok=True)
    Path("outputs/microbench.jsonl").write_text(
        "\n".join(json.dumps(r) for r in OUT) + "\n"
    )


if __name__ == "__main__":
    main()
