#!/usr/bin/env python
"""Chunked connected-components over a large prediction with seam merging
(reference scripts/cc3d_chunks.py; engine: decoding/streamed.py).

Usage: python scripts/cc3d_chunks.py aff.h5 seg.h5 --threshold 0.75 --chunk 64 512 512
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("affinities"); p.add_argument("output")
    p.add_argument("--threshold", type=float, default=0.75)
    p.add_argument("--chunk", nargs=3, type=int, default=[64, 512, 512])
    p.add_argument("--min-size", type=int, default=0)
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume, save_volume
    from pytorch_connectomics_tpu.decoding import streamed_affinity_cc_decode
    shape, _ = probe_volume(args.affinities)
    vol_shape = shape[1:] if len(shape) == 4 else shape
    def reader(slices):
        roi = (slice(0, 3),) + tuple(slices)
        return read_volume(args.affinities, roi=roi)
    seg = streamed_affinity_cc_decode(reader, vol_shape, args.chunk, args.threshold, args.min_size)
    save_volume(args.output, seg)
    print(f"instances: {len(np.unique(seg)) - 1} -> {args.output}")

if __name__ == "__main__":
    main()
