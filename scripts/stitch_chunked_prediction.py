#!/usr/bin/env python
"""Merge per-shard chunked prediction H5 files into one volume
(reference ``scripts/stitch_chunked_prediction.py``).

Usage: python scripts/stitch_chunked_prediction.py shard0.h5 shard1.h5 -o merged.h5
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("shards", nargs="+")
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args()

    from pytorch_connectomics_tpu.inference import stitch_shard_outputs

    out = stitch_shard_outputs(args.shards, args.output)
    print(f"stitched {len(args.shards)} shards -> {out}")


if __name__ == "__main__":
    main()
