#!/usr/bin/env python
"""Apply a named Python function to a volume and save the result
(reference ``scripts/apply_volume_function.py``).

Usage:
    python scripts/apply_volume_function.py --input seg.h5 --output out.h5 \
        --function pytorch_connectomics_tpu.data.targets.misc:normalize_labels \
        --kwargs-json '{}'

``--function`` accepts ``module.path:callable`` or ``path/to/file.py:callable``.
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def resolve(spec: str):
    mod_spec, _, fn_name = spec.partition(":")
    if not fn_name:
        raise SystemExit("--function must be 'module:callable' or 'file.py:callable'")
    if mod_spec.endswith(".py"):
        s = importlib.util.spec_from_file_location("user_fn_module", mod_spec)
        mod = importlib.util.module_from_spec(s)
        s.loader.exec_module(mod)
    else:
        mod = importlib.import_module(mod_spec)
    return getattr(mod, fn_name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--function", required=True)
    p.add_argument("--kwargs-json", default="{}")
    args = p.parse_args()

    from pytorch_connectomics_tpu.data.io import read_volume, save_volume

    fn = resolve(args.function)
    vol = read_volume(args.input)
    out = fn(vol, **json.loads(args.kwargs_json))
    import numpy as np

    save_volume(args.output, np.asarray(out))
    print(f"{args.function}: {vol.shape} {vol.dtype} -> {np.asarray(out).shape} "
          f"{np.asarray(out).dtype} saved to {args.output}")


if __name__ == "__main__":
    main()
