#!/usr/bin/env python
"""Stack 2-D image files into one HDF5 volume
(reference ``scripts/images_to_h5.py``).

Usage: python scripts/images_to_h5.py "slices/*.png" out.h5
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pattern", help="glob of 2-D images (sorted) or a multi-page tiff")
    p.add_argument("output", help="output .h5 path")
    p.add_argument("--dataset", default="main")
    args = p.parse_args()

    from pytorch_connectomics_tpu.data.io import read_volume, save_volume

    vol = read_volume(args.pattern)
    save_volume(args.output, vol, internal_path=args.dataset)
    print(f"wrote {args.output}: shape={vol.shape} dtype={vol.dtype}")


if __name__ == "__main__":
    main()
