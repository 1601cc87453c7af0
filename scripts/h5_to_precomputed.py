#!/usr/bin/env python
"""Convert an H5/zarr volume to neuroglancer precomputed via tensorstore
(reference scripts/h5_to_precomputed{,_cloud}.py).

Usage: python scripts/h5_to_precomputed.py in.h5 out_layer --chunk 64 64 64 --resolution 30 6 6
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--chunk", nargs=3, type=int, default=[64, 64, 64])
    p.add_argument("--resolution", nargs=3, type=float, default=[1, 1, 1])
    p.add_argument("--layer-type", default="image", choices=["image", "segmentation"])
    p.add_argument("--block", nargs=3, type=int, default=[64, 512, 512])
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume
    from pytorch_connectomics_tpu.data.precomputed import create_precomputed
    shape, dtype = probe_volume(args.input)
    spatial = shape[-3:]
    nch = 1 if len(shape) == 3 else shape[0]
    vol = create_precomputed(args.output, spatial, dtype, args.chunk,
                             args.resolution, num_channels=nch, layer_type=args.layer_type)
    bz, by, bx = args.block
    for z in range(0, spatial[0], bz):
        for y in range(0, spatial[1], by):
            for x in range(0, spatial[2], bx):
                sl = (slice(z, min(z+bz, spatial[0])), slice(y, min(y+by, spatial[1])),
                      slice(x, min(x+bx, spatial[2])))
                roi = sl if len(shape) == 3 else (slice(None),) + sl
                vol.write(sl, read_volume(args.input, roi=roi))
    print(f"wrote {args.output}: {shape} -> precomputed")

if __name__ == "__main__":
    main()
