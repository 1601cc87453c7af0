#!/usr/bin/env python
"""Downsample a volume by integer factors
(reference scripts/downsample_data.py).

Modes (reference behavior):
  - auto (default): integer dtypes other than uint8 are treated as labels
  - image: mean-pool over (fz, fy, fx) blocks
  - label: strided (nearest) sampling, preserving ids

Large volumes stream chunkwise with --chunk (chunk sizes are snapped to
factor multiples so block pooling never crosses a chunk boundary).

Usage: python scripts/downsample.py in.h5 out.h5 --factors 1 2 2
       [--mode auto|image|label] [--chunk 64 512 512]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def detect_mode(dtype) -> str:
    dt = np.dtype(dtype)
    return "label" if (np.issubdtype(dt, np.integer) and dt != np.uint8) else "image"


def downsample_block(vol: np.ndarray, factors, mode: str) -> np.ndarray:
    fz, fy, fx = factors
    if mode == "label":
        return vol[::fz, ::fy, ::fx]
    z = (vol.shape[0] // fz) * fz
    y = (vol.shape[1] // fy) * fy
    x = (vol.shape[2] // fx) * fx
    core = vol[:z, :y, :x]
    return (
        core.reshape(z // fz, fz, y // fy, fy, x // fx, fx)
        .mean(axis=(1, 3, 5))
        .astype(vol.dtype)
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--factors", nargs=3, type=int, default=[1, 2, 2])
    p.add_argument("--mode", default="auto", choices=["auto", "image", "label"])
    p.add_argument("--chunk", nargs=3, type=int, default=None,
                   help="stream chunkwise for volumes larger than RAM")
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume, save_volume

    shape, dtype = probe_volume(args.input)
    mode = args.mode if args.mode != "auto" else detect_mode(dtype)
    f = tuple(args.factors)

    if args.chunk is None:
        vol = read_volume(args.input)
        out = downsample_block(vol, f, mode)
        save_volume(args.output, out)
        print(f"{vol.shape} -> {out.shape} ({mode})")
        return

    import h5py

    # snap chunk sizes to factor multiples so pooling stays chunk-local;
    # label mode additionally needs stride-phase alignment
    chunk = tuple((c // fi) * fi or fi for c, fi in zip(args.chunk, f))
    out_shape = tuple(-(-s // fi) if mode == "label" else s // fi
                      for s, fi in zip(shape[-3:], f))
    with h5py.File(args.output, "w") as out_f:
        ds = out_f.create_dataset("main", shape=out_shape, dtype=dtype)
        for z0 in range(0, shape[-3], chunk[0]):
            for y0 in range(0, shape[-2], chunk[1]):
                for x0 in range(0, shape[-1], chunk[2]):
                    sl = tuple(
                        slice(o, min(o + c, s))
                        for o, c, s in zip((z0, y0, x0), chunk, shape[-3:])
                    )
                    block = read_volume(args.input, roi=sl)
                    small = downsample_block(block, f, mode)
                    osl = tuple(
                        slice(s.start // fi, s.start // fi + d)
                        for s, fi, d in zip(sl, f, small.shape)
                    )
                    ds[osl] = small
    print(f"{tuple(shape)} -> {out_shape} ({mode}, chunked)")


if __name__ == "__main__":
    main()
