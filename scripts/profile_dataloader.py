#!/usr/bin/env python
"""Measure host data-pipeline batch latency
(reference ``scripts/profile_dataloader.py:17``).

Usage: python scripts/profile_dataloader.py --config tutorials/minimal.yaml -n 20
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("-n", "--num-batches", type=int, default=20)
    args = p.parse_args()

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.data.pipeline import build_pipelines

    cfg = load_config(args.config, mode="train")
    train_pipe, _ = build_pipelines(cfg)
    times = []
    it = train_pipe.iterate()
    next(it)  # warm the prefetch thread
    for _ in range(args.num_batches):
        t0 = time.time()
        batch = next(it)
        times.append(time.time() - t0)
    times = np.array(times)
    voxels = np.prod(batch["image"].shape)
    print(
        f"batches: {len(times)}  mean {times.mean()*1e3:.1f} ms  p50 {np.percentile(times,50)*1e3:.1f} ms  "
        f"p95 {np.percentile(times,95)*1e3:.1f} ms  throughput {voxels/times.mean()/1e6:.1f} Mvox/s"
    )


if __name__ == "__main__":
    main()
