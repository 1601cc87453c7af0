#!/usr/bin/env python
"""Curvilinear (tube/fiber) segmentation evaluation: tolerance-band F1 over
prediction/GT pairs (reference scripts/tools/eval_curvilinear.py).

Usage:
  python scripts/eval_curvilinear.py --pred a_pred.h5 b_pred.h5 \
      --gt a_gt.h5 b_gt.h5 [--tolerance 2] [--json out.json]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", nargs="+", required=True)
    p.add_argument("--gt", nargs="+", required=True)
    p.add_argument("--tolerance", type=int, default=2)
    p.add_argument("--json", default=None)
    args = p.parse_args()
    if len(args.pred) != len(args.gt):
        raise SystemExit("--pred and --gt must pair up")

    from pytorch_connectomics_tpu.metrics.tube import evaluate_curvilinear_pairs

    results = evaluate_curvilinear_pairs(args.pred, args.gt, tolerance=args.tolerance)
    # cross-volume means
    if results:
        keys = next(iter(results.values())).keys()
        results["mean"] = {
            k: sum(r[k] for r in results.values()) / len(results) for k in keys
        }
    print(json.dumps(results, indent=2, default=float))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
