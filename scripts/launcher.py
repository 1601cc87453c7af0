#!/usr/bin/env python
"""Multi-process / cluster launcher: emits per-shard commands or SLURM array
scripts with auto-resubmission (reference scripts/slurm_launcher.py:1-77).

Usage:
  python scripts/launcher.py --config cfg.yaml --mode test --checkpoint ck \
      --num-shards 8 [--slurm --partition tpu --time 12:00:00]
"""
import argparse, sys
from pathlib import Path

TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --array=0-{last}
#SBATCH --partition={partition}
#SBATCH --time={time}
#SBATCH --requeue
#SBATCH --output=logs/{name}_%a.log
mkdir -p logs
python scripts/main.py --config {config} --mode {mode} {ckpt} \\
    --shard-id $SLURM_ARRAY_TASK_ID --num-shards {num_shards} {overrides}
"""

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--mode", default="test")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num-shards", type=int, default=4)
    p.add_argument("--slurm", action="store_true")
    p.add_argument("--partition", default="tpu")
    p.add_argument("--time", default="24:00:00")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args()
    ckpt = f"--checkpoint {args.checkpoint}" if args.checkpoint else ""
    ov = " ".join(args.overrides)
    if args.slurm:
        script = TEMPLATE.format(
            name=Path(args.config).stem, last=args.num_shards - 1,
            partition=args.partition, time=args.time, config=args.config,
            mode=args.mode, ckpt=ckpt, num_shards=args.num_shards, overrides=ov)
        out = Path(f"launch_{Path(args.config).stem}.sh")
        out.write_text(script)
        print(f"wrote {out}; submit with: sbatch {out}")
    else:
        for shard in range(args.num_shards):
            print(f"python scripts/main.py --config {args.config} --mode {args.mode} "
                  f"{ckpt} --shard-id {shard} --num-shards {args.num_shards} {ov} &")
        print("wait")

if __name__ == "__main__":
    main()
