#!/usr/bin/env python
"""Pad a cropped prediction back to the full volume frame
(reference scripts/uncrop.py).

Usage: python scripts/uncrop.py pred.h5 out.h5 --full-shape 165 1024 768 --offset 10 0 0
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--full-shape", nargs=3, type=int, required=True)
    p.add_argument("--offset", nargs=3, type=int, default=[0, 0, 0])
    p.add_argument("--fill", type=float, default=0)
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import read_volume, save_volume
    vol = read_volume(args.input)
    spatial = vol.shape[-3:]
    full_shape = tuple(vol.shape[:-3]) + tuple(args.full_shape)
    out = np.full(full_shape, args.fill, dtype=vol.dtype)
    sl = tuple([slice(None)] * (vol.ndim - 3)) + tuple(
        slice(o, o + s) for o, s in zip(args.offset, spatial))
    out[sl] = vol
    save_volume(args.output, out)
    print(f"{vol.shape} -> {out.shape}")

if __name__ == "__main__":
    main()
