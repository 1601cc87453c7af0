#!/usr/bin/env python
"""Entry point: ``python scripts/main.py --config cfg.yaml --mode train``
(reference contract: ``scripts/main.py:27-45``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pytorch_connectomics_tpu.runtime import dispatch_runtime


def main():
    from pytorch_connectomics_tpu.runtime.cli import parse_args

    args = parse_args()
    results = dispatch_runtime(args)
    metrics = results.get("metrics")
    if metrics:
        print(f"[done] {results['mode']}: {metrics}")
    else:
        print(f"[done] {results['mode']}: outputs in {results['run_dir']}")
    if getattr(args, "demo", False):
        loss = (metrics or {}).get("loss_total")
        print(
            "\nDEMO COMPLETED SUCCESSFULLY"
            + (f" (final loss {loss:.4f})" if loss is not None else "")
            + "\nYour installation is working: config -> data -> model -> "
            "jitted train step -> checkpoint all ran end-to-end."
        )


if __name__ == "__main__":
    main()
