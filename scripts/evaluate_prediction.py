#!/usr/bin/env python
"""Standalone evaluation of a decoded prediction against ground truth
(reference ``scripts/evaluate_prediction.py``).

Usage: python scripts/evaluate_prediction.py pred.h5 gt.h5 --metrics adapted_rand voi nerl
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prediction")
    p.add_argument("ground_truth")
    p.add_argument("--metrics", nargs="+", default=["adapted_rand", "voi", "instance_f1"])
    p.add_argument("--binary-prediction", help="probability map for binary metrics")
    args = p.parse_args()

    from pytorch_connectomics_tpu.data.io import read_volume
    from pytorch_connectomics_tpu.evaluation.stage import compute_test_metrics

    decoded = read_volume(args.prediction)
    if decoded.ndim == 4:
        decoded = decoded[0]
    gt = read_volume(args.ground_truth)
    pred = read_volume(args.binary_prediction) if args.binary_prediction else None
    metrics = compute_test_metrics(pred, decoded, gt, args.metrics)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
