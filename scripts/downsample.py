#!/usr/bin/env python
"""Downsample a volume by integer factors (reference scripts/downsample*.py).

Usage: python scripts/downsample.py in.h5 out.h5 --factors 1 2 2 [--label]
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--factors", nargs=3, type=int, default=[1, 2, 2])
    p.add_argument("--label", action="store_true", help="stride (nearest) instead of mean-pool")
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import read_volume, save_volume
    vol = read_volume(args.input)
    fz, fy, fx = args.factors
    if args.label:
        out = vol[::fz, ::fy, ::fx]
    else:
        z, y, x = (vol.shape[0] // fz) * fz, (vol.shape[1] // fy) * fy, (vol.shape[2] // fx) * fx
        out = vol[:z, :y, :x].reshape(z // fz, fz, y // fy, fy, x // fx, fx).mean(axis=(1, 3, 5)).astype(vol.dtype)
    save_volume(args.output, out)
    print(f"{vol.shape} -> {out.shape}")

if __name__ == "__main__":
    main()
