#!/usr/bin/env python
"""Convert HDF5 volumes to chunked zarr via tensorstore — the lazy/chunked
input format (reference ``scripts/tiles_to_zarr.py`` / precomputed
converters).

Usage: python scripts/h5_to_zarr.py in.h5 out.zarr --chunks 64 256 256
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--chunks", nargs=3, type=int, default=[64, 256, 256])
    p.add_argument("--block", nargs=3, type=int, default=[128, 1024, 1024],
                   help="streaming copy block (host RAM bound)")
    args = p.parse_args()

    from pytorch_connectomics_tpu.data.io import create_zarr, probe_volume, read_volume

    shape, dtype = probe_volume(args.input)
    writer = create_zarr(args.output, shape, dtype, chunks=args.chunks)
    bz, by, bx = args.block
    for z in range(0, shape[0], bz):
        for y in range(0, shape[1], by):
            for x in range(0, shape[2], bx):
                sl = (
                    slice(z, min(z + bz, shape[0])),
                    slice(y, min(y + by, shape[1])),
                    slice(x, min(x + bx, shape[2])),
                )
                writer[sl] = read_volume(args.input, roi=sl)
    print(f"wrote {args.output}: shape={shape} chunks={args.chunks}")


if __name__ == "__main__":
    main()
