#!/usr/bin/env python
"""Precompute (skeleton-aware) distance-transform auxiliary label volumes,
chunked with crash-safe resume (reference ``scripts/sdt_precompute_chunked.py``
and ``data/processing/distance.py:681-740`` label_aux precompute).

Usage: python scripts/sdt_precompute.py labels.h5 out_sdt.h5 --mode skeleton_aware --chunk 64 512 512
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("labels")
    p.add_argument("output")
    p.add_argument("--mode", default="sdt", choices=["sdt", "skeleton_aware", "instance_edt", "semantic_edt"])
    p.add_argument("--chunk", nargs=3, type=int, default=[64, 512, 512])
    p.add_argument("--halo", nargs=3, type=int, default=[8, 32, 32])
    p.add_argument("--alpha", type=float, default=0.8)
    # SLURM-array sharding: each task processes chunks[shard::num] (reference
    # sdt_precompute_chunked.py task decode); chunk-aligned writes are disjoint
    p.add_argument("--shard", nargs=2, type=int, default=None, metavar=("ID", "N"))
    args = p.parse_args()

    import h5py

    from pytorch_connectomics_tpu.chunked import ChunkedProcessor
    from pytorch_connectomics_tpu.data.io import probe_volume, read_volume
    from pytorch_connectomics_tpu.data.targets import (
        instance_edt,
        semantic_edt,
        signed_distance,
        skeleton_aware_edt,
    )

    fns = {
        "sdt": lambda s: signed_distance(s),
        "skeleton_aware": lambda s: skeleton_aware_edt(s, alpha=args.alpha),
        "instance_edt": lambda s: instance_edt(s),
        "semantic_edt": lambda s: semantic_edt(s),
    }
    fn = fns[args.mode]
    shape, _ = probe_volume(args.labels)

    with h5py.File(args.output, "a") as f:
        if "main" not in f:
            f.create_dataset("main", shape=shape, dtype=np.float32, chunks=tuple(args.chunk))
        ds = f["main"]
        shard_id, num_shards = args.shard if args.shard else (None, None)
        manifest = args.output + (
            f".shard{shard_id}.manifest.json" if shard_id is not None else ".manifest.json"
        )
        proc = ChunkedProcessor(
            shape,
            args.chunk,
            halo=args.halo,
            manifest_path=manifest,
            signature={"mode": args.mode, "alpha": args.alpha},
            num_workers=4,
            shard_id=shard_id,
            num_shards=num_shards,
        )
        n = proc.run(
            reader=lambda sl: read_volume(args.labels, roi=sl),
            writer=ds,
            process_fn=lambda data, chunk: fn(data).astype(np.float32),
        )
    print(f"done: {n} chunks -> {args.output}")


if __name__ == "__main__":
    main()
