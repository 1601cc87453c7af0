#!/usr/bin/env python
"""Rescale a float/uint16 volume to uint8 (reference scripts/convert_h5_to_uint8.py)."""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--percentiles", nargs=2, type=float, default=[0.5, 99.5])
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import read_volume, save_volume
    vol = read_volume(args.input).astype(np.float32)
    lo, hi = np.percentile(vol, args.percentiles)
    out = np.clip((vol - lo) / max(1e-8, hi - lo) * 255, 0, 255).astype(np.uint8)
    save_volume(args.output, out)
    print(f"wrote {args.output} uint8")

if __name__ == "__main__":
    main()
