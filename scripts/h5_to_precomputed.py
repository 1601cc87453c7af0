#!/usr/bin/env python
"""Convert an H5/zarr volume to neuroglancer precomputed via tensorstore.

Supports local paths and cloudpaths (gs://, s3://), dtype conversion, and
an in-plane downsample pyramid (reference scripts/h5_to_precomputed.py +
h5_to_precomputed_cloud.py).

Usage:
  python scripts/h5_to_precomputed.py in.h5 out_layer \
      --chunk 64 64 64 --resolution 30 6 6 [--dtype uint8] [--mips 3]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def _convert_dtype(block: np.ndarray, dtype: str | None) -> np.ndarray:
    if dtype is None or str(block.dtype) == dtype:
        return block
    if dtype == "uint8" and block.dtype.kind == "f":
        # float [0,1] (or arbitrary range) -> uint8 (reference
        # h5_to_precomputed_cloud.py _to_dtype)
        mx = float(block.max()) if block.size else 1.0
        scale = 255.0 if mx <= 1.0 else 255.0 / max(mx, 1e-8)
        return np.clip(block * scale, 0, 255).astype(np.uint8)
    return block.astype(dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output", help="local path or gs://bucket/layer")
    p.add_argument("--chunk", nargs=3, type=int, default=[64, 64, 64])
    p.add_argument("--resolution", nargs=3, type=float, default=[1, 1, 1])
    p.add_argument("--layer-type", default="image", choices=["image", "segmentation"])
    p.add_argument("--block", nargs=3, type=int, default=[64, 512, 512])
    p.add_argument("--dtype", default=None, help="convert (e.g. uint8)")
    p.add_argument("--mips", type=int, default=1,
                   help="number of scales; each downsamples y/x by 2")
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume
    from pytorch_connectomics_tpu.data.precomputed import (
        append_scale,
        create_precomputed,
    )

    shape, dtype = probe_volume(args.input)
    out_dtype = args.dtype or np.dtype(dtype).name
    spatial = tuple(shape[-3:])
    nch = 1 if len(shape) == 3 else shape[0]
    seg = args.layer_type == "segmentation"
    vol = create_precomputed(args.output, spatial, out_dtype, args.chunk,
                             args.resolution, num_channels=nch,
                             layer_type=args.layer_type)
    bz, by, bx = args.block
    for z in range(0, spatial[0], bz):
        for y in range(0, spatial[1], by):
            for x in range(0, spatial[2], bx):
                sl = (slice(z, min(z + bz, spatial[0])), slice(y, min(y + by, spatial[1])),
                      slice(x, min(x + bx, spatial[2])))
                roi = sl if len(shape) == 3 else (slice(None),) + sl
                vol.write(sl, _convert_dtype(read_volume(args.input, roi=roi), out_dtype))
    print(f"wrote {args.output} mip 0: {shape}")

    # downsample pyramid: in-plane 2x per mip (EM convention: z untouched),
    # segmentation uses striding, image uses 2x2 mean
    prev_res = list(args.resolution)
    prev_shape = list(spatial)
    for mip in range(1, args.mips):
        res = [prev_res[0], prev_res[1] * 2, prev_res[2] * 2]
        ms = [prev_shape[0], (prev_shape[1] + 1) // 2, (prev_shape[2] + 1) // 2]
        mvol = append_scale(args.output, ms, out_dtype, args.chunk, res,
                            num_channels=nch)
        from pytorch_connectomics_tpu.data.precomputed import open_precomputed

        src = open_precomputed(args.output, resolution=prev_res)
        for z in range(0, ms[0], bz):
            z1 = min(z + bz, ms[0])
            block = src.read((slice(z, z1), slice(0, prev_shape[1]), slice(0, prev_shape[2])))
            if block.ndim == 3:
                block = block[None]
            ey = block.shape[2] - block.shape[2] % 2
            ex = block.shape[3] - block.shape[3] % 2
            core = block[:, :, :ey, :ex]
            if seg:
                ds = core[:, :, ::2, ::2]
            else:
                ds = core.reshape(core.shape[0], core.shape[1], ey // 2, 2, ex // 2, 2)
                ds = ds.astype(np.float64).mean(axis=(3, 5)).astype(out_dtype)
            # pad odd edges by striding the tail row/col
            full = np.zeros((block.shape[0], z1 - z, ms[1], ms[2]), ds.dtype)
            full[:, :, : ds.shape[2], : ds.shape[3]] = ds
            if ds.shape[2] < ms[1]:
                full[:, :, -1, : ds.shape[3]] = core[:, :, -1, ::2]
            if ds.shape[3] < ms[2]:
                full[:, :, : ds.shape[2], -1] = core[:, :, ::2, -1][:, :, : ds.shape[2]]
            mvol.write((slice(z, z1), slice(0, ms[1]), slice(0, ms[2])),
                       full[0] if nch == 1 else full)
        print(f"wrote {args.output} mip {mip}: {tuple(ms)} @ {res}")
        prev_res, prev_shape = res, ms


if __name__ == "__main__":
    main()
