#!/usr/bin/env python
"""Entry point: ``python scripts/main.py --config cfg.yaml --mode train``
(reference contract: ``scripts/main.py:27-45``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pytorch_connectomics_tpu.runtime import dispatch_runtime


def main():
    results = dispatch_runtime()
    metrics = results.get("metrics")
    if metrics:
        print(f"[done] {results['mode']}: {metrics}")
    else:
        print(f"[done] {results['mode']}: outputs in {results['run_dir']}")


if __name__ == "__main__":
    main()
