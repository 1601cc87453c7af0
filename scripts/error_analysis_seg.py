#!/usr/bin/env python
"""Segmentation error analysis: split/merge attribution, size stats,
oracle study, dust sweep, skeleton ownership, z-discontinuity scan
(reference scripts/error_analysis_seg_dense.py / _nerl.py).

Usage:
  python scripts/error_analysis_seg.py pred.h5 gt.h5 [--top 20]
      [--oracle] [--dust-sweep] [--z-scan] [--nerl] [--csv out_dir]
"""
import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prediction")
    p.add_argument("ground_truth")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--oracle", action="store_true", help="top-k merge-fix oracle study")
    p.add_argument("--dust-sweep", action="store_true", help="min-size removal sweep")
    p.add_argument("--z-scan", action="store_true", help="z-discontinuity scan")
    p.add_argument("--nerl", action="store_true", help="NERL + skeleton ownership")
    p.add_argument("--csv", default=None, help="also write CSV tables here")
    args = p.parse_args()

    from pytorch_connectomics_tpu.data.io import read_volume
    from pytorch_connectomics_tpu.evaluation.error_analysis import (
        analyze_segmentation,
        skeleton_ownership,
    )

    seg = read_volume(args.prediction)
    gt = read_volume(args.ground_truth)
    if seg.ndim == 4:
        seg = seg[0]
    report = analyze_segmentation(
        seg, gt, top=args.top, oracle=args.oracle, dust=args.dust_sweep, z_scan=args.z_scan
    )
    if args.nerl:
        from pytorch_connectomics_tpu.metrics import compute_nerl
        from pytorch_connectomics_tpu.metrics.skeleton import skeletonize_volume

        report["nerl"] = compute_nerl(seg, gt)
        skels = skeletonize_volume(gt)
        report["skeleton_ownership"] = skeleton_ownership(seg, skels)

    print(json.dumps(report, indent=2, default=float))

    if args.csv:
        out = Path(args.csv)
        out.mkdir(parents=True, exist_ok=True)
        for key in ("worst_splits", "worst_merges", "dust_sweep", "skeleton_ownership"):
            rows = report.get(key)
            if not rows:
                continue
            with (out / f"{key}.csv").open("w", newline="") as f:
                fields = sorted({k for r in rows for k in r})
                w = csv.DictWriter(f, fieldnames=fields)
                w.writeheader()
                for r in rows:
                    w.writerow({k: json.dumps(v) if isinstance(v, (list, dict)) else v
                                for k, v in r.items()})


if __name__ == "__main__":
    main()
