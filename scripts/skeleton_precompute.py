#!/usr/bin/env python
"""Precompute skeleton volumes from instance labels, chunked with resume
(reference scripts/precompute_skeleton_volumes.py / skeleton_precompute.py)."""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("labels"); p.add_argument("output")
    p.add_argument("--chunk", nargs=3, type=int, default=[64, 512, 512])
    p.add_argument("--stride", nargs=3, type=int, default=[2, 4, 4])
    p.add_argument("--anisotropy", nargs=3, type=float, default=[1.0, 1.0, 1.0])
    args = p.parse_args()
    import h5py
    from pytorch_connectomics_tpu.chunked import SkeletonVolumeProcessor
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume
    shape, _ = probe_volume(args.labels)
    with h5py.File(args.output, "a") as f:
        if "main" not in f:
            f.create_dataset("main", shape=shape, dtype=np.uint32,
                             chunks=tuple(min(c, s) for c, s in zip(args.chunk, shape)))
        proc = SkeletonVolumeProcessor(
            shape, args.chunk, halo=(4, 16, 16),
            manifest_path=args.output + ".manifest.json",
            stride=tuple(args.stride), anisotropy=tuple(args.anisotropy))
        n = proc.run(reader=lambda sl: read_volume(args.labels, roi=sl), writer=f["main"])
    print(f"done: {n} chunks")

if __name__ == "__main__":
    main()
