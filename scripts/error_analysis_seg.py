#!/usr/bin/env python
"""Dense segmentation error analysis: per-instance split/merge attribution
(reference scripts/error_analysis_seg_dense.py / _nerl.py).

Usage: python scripts/error_analysis_seg.py pred.h5 gt.h5 [--top 20] [--nerl]
"""
import argparse, json, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("prediction"); p.add_argument("ground_truth")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--nerl", action="store_true")
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import read_volume
    from pytorch_connectomics_tpu.metrics import adapted_rand, instance_matching, voi
    from pytorch_connectomics_tpu.metrics.oracle import oracle_merge
    seg = read_volume(args.prediction); gt = read_volume(args.ground_truth)
    if seg.ndim == 4: seg = seg[0]
    report = {
        "adapted_rand": float(adapted_rand(seg, gt)),
        "voi_split": voi(seg, gt)[0], "voi_merge": voi(seg, gt)[1],
        "matching": instance_matching(seg, gt),
    }
    if args.nerl:
        from pytorch_connectomics_tpu.metrics import compute_nerl
        report["nerl"] = compute_nerl(seg, gt)
    # per-GT-instance fragmentation: how many candidate segments cover each GT id
    frag = {}
    for gid in np.unique(gt):
        if gid == 0: continue
        segs = np.unique(seg[gt == gid]); segs = segs[segs > 0]
        if len(segs) > 1:
            frag[int(gid)] = len(segs)
    report["most_fragmented_gt"] = dict(sorted(frag.items(), key=lambda kv: -kv[1])[: args.top])
    # merges: candidate segments covering multiple GT ids
    merges = {}
    for sid in np.unique(seg):
        if sid == 0: continue
        gts = np.unique(gt[seg == sid]); gts = gts[gts > 0]
        if len(gts) > 1:
            merges[int(sid)] = len(gts)
    report["worst_merges"] = dict(sorted(merges.items(), key=lambda kv: -kv[1])[: args.top])
    print(json.dumps(report, indent=2, default=float))

if __name__ == "__main__":
    main()
