#!/usr/bin/env python
"""Run the ABISS bridge on an affinity prediction
(reference scripts/run_abiss_{chunk,volume}.py).

Usage: python scripts/run_abiss.py aff.h5 --workdir abiss_work \
    [--abiss-root /path/to/abiss] [--agg-threshold 0.2] [--provenance prov.json]
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

def main():
    p = argparse.ArgumentParser()
    p.add_argument("affinities")
    p.add_argument("--workdir", default="abiss_work")
    p.add_argument("--abiss-root", default=None)
    p.add_argument("--agg-threshold", type=float, default=0.2)
    p.add_argument("--provenance", default=None, help="Seuron provenance JSON to replay")
    p.add_argument("--output", default=None, help="save segmentation H5 here")
    args = p.parse_args()
    from pytorch_connectomics_tpu.data.io import read_volume, save_volume
    from pytorch_connectomics_tpu.runtime.abiss_bridge import (
        decode_abiss, replay_seuron_provenance)
    kwargs = {"agg_threshold": args.agg_threshold, "workdir": args.workdir}
    if args.provenance:
        # recorded Seuron params drive the local run (fail-closed mapping)
        payload = replay_seuron_provenance(args.provenance, args.workdir)
        kwargs.update(
            agg_threshold=float(payload["AGG_THRESHOLD"]),
            ws_high=float(payload["WS_HIGH_THRESHOLD"]),
            ws_low=float(payload["WS_LOW_THRESHOLD"]),
            ws_size=int(payload["WS_SIZE_THRESHOLD"]),
            ws_dust=int(payload["WS_DUST_THRESHOLD"]),
            chunk_size_xyz=tuple(int(c) for c in payload["CHUNK_SIZE"]),
            resolution_xyz=tuple(float(r) for r in payload["AFF_RESOLUTION"]),
        )
    aff = read_volume(args.affinities)
    seg = decode_abiss(aff, abiss_root=args.abiss_root, **kwargs)
    if args.output:
        save_volume(args.output, seg.astype(np.uint32))
    print(f"instances: {len(np.unique(seg)) - 1}")

if __name__ == "__main__":
    main()
