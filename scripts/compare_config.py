#!/usr/bin/env python
"""Diff two workload configs (reference scripts/tools/compare_config.py).

Unlike a text diff, this loads both YAMLs through the full config engine
(_base_ chains, profiles, stage resolution) and diffs the RESOLVED values,
so profile/base indirection can't hide a difference.

Usage: python scripts/compare_config.py a.yaml b.yaml [--mode train] [--text]
"""
import argparse
import sys
from difflib import unified_diff
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _flatten(d, prefix=""):
    out = {}
    if isinstance(d, dict):
        for k, v in d.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = d
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config1")
    p.add_argument("config2")
    p.add_argument("--mode", default="train")
    p.add_argument("--text", action="store_true", help="raw text diff instead")
    args = p.parse_args()

    if args.text:
        a = Path(args.config1).read_text().strip().splitlines()
        b = Path(args.config2).read_text().strip().splitlines()
        n = 0
        for line in unified_diff(a, b, fromfile=args.config1, tofile=args.config2,
                                 lineterm="", n=0):
            if not line.startswith("@@"):
                print(line)
                n += 1
        print(f"\nTotal number of changes: {n}")
        return

    from pytorch_connectomics_tpu.config import load_config
    from pytorch_connectomics_tpu.config.schema import to_dict

    fa = _flatten(to_dict(load_config(args.config1, mode=args.mode)))
    fb = _flatten(to_dict(load_config(args.config2, mode=args.mode)))
    n = 0
    for key in sorted(set(fa) | set(fb)):
        va, vb = fa.get(key, "<absent>"), fb.get(key, "<absent>")
        if va != vb:
            print(f"{key}: {va!r} -> {vb!r}")
            n += 1
    print(f"\nTotal number of resolved differences: {n}")


if __name__ == "__main__":
    main()
