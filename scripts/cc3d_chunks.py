#!/usr/bin/env python
"""Chunked decode over a large stored prediction with seam merging
(reference scripts/cc3d_chunks.py; engine: decoding/streamed.py).

Memory-bounded: affinities are read per chunk from disk (h5/zarr/
precomputed via data.io); only the uint32 label volume is materialized.
Both modes are exactly equal to their whole-volume decoders.

Usage:
  python scripts/cc3d_chunks.py aff.h5 seg.h5 --threshold 0.75 --chunk 64 512 512
  python scripts/cc3d_chunks.py aff.h5 seg.h5 --mode waterz --threshold 0.4 \
      --fragment-threshold 0.9 --chunk 64 512 512
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("affinities"); p.add_argument("output")
    p.add_argument("--mode", choices=["cc", "waterz"], default="cc")
    p.add_argument("--threshold", type=float, default=0.75)
    p.add_argument("--fragment-threshold", type=float, default=0.9,
                   help="waterz: CC threshold for the fragment layer")
    p.add_argument("--chunk", nargs=3, type=int, default=[64, 512, 512])
    p.add_argument("--min-size", type=int, default=0)
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume, save_volume
    from pytorch_connectomics_tpu.decoding import (
        streamed_affinity_cc_decode,
        streamed_waterz_decode,
    )
    shape, _ = probe_volume(args.affinities)
    vol_shape = shape[1:] if len(shape) == 4 else shape
    def reader(slices):
        roi = (slice(0, 3),) + tuple(slices)
        return read_volume(args.affinities, roi=roi)
    if args.mode == "waterz":
        seg = streamed_waterz_decode(
            reader, vol_shape, args.chunk, threshold=args.threshold,
            fragment_threshold=args.fragment_threshold,
            min_size=args.min_size, num_workers=args.workers)
    else:
        seg = streamed_affinity_cc_decode(
            reader, vol_shape, args.chunk, args.threshold, args.min_size,
            num_workers=args.workers)
    save_volume(args.output, seg)
    print(f"instances: {len(np.unique(seg)) - 1} -> {args.output}")

if __name__ == "__main__":
    main()
