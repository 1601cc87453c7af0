#!/usr/bin/env python
"""30-second demo: train the minimal synthetic config and run inference
(reference scripts/demo.py)."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pytorch_connectomics_tpu.runtime import dispatch_runtime, parse_args

def main():
    cfg = str(Path(__file__).resolve().parents[1] / "tutorials" / "minimal.yaml")
    print("== training minimal demo ==")
    r = dispatch_runtime(parse_args(["--config", cfg, "--mode", "train", "--fast-dev-run"]))
    print("metrics:", r.get("metrics"))

if __name__ == "__main__":
    main()
