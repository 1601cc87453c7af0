#!/usr/bin/env python3
"""Environment bootstrap for pytorch-connectomics-tpu (counterpart of the
reference's ``install.py``, which auto-detects CUDA; here the accelerator is
TPU, so the script detects libtpu / a Cloud TPU VM, installs the right jax
wheel, builds the native decode stack, and verifies the install).

Usage:
    python install.py            # detect TPU, install, build csrc, verify
    python install.py --cpu-only # skip libtpu (laptops, CI)
    python install.py --yes      # no prompts (CI mode)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent


def run(cmd, **kw):
    print(f"+ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, check=True, **kw)


def detect_tpu() -> bool:
    """Cloud TPU VMs expose accelerator metadata and /dev/accel* nodes."""
    if any(Path("/dev").glob("accel*")) or any(Path("/dev").glob("vfio/*")):
        return True
    try:
        import importlib.util

        return importlib.util.find_spec("libtpu") is not None
    except Exception:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-only", action="store_true")
    ap.add_argument("--yes", "-y", action="store_true", help="no prompts")
    ap.add_argument("--no-native", action="store_true", help="skip csrc build")
    args = ap.parse_args()

    tpu = (not args.cpu_only) and detect_tpu()
    plan = [
        f"install package (editable) {'with jax[tpu]' if tpu else 'CPU jax'}",
    ] + ([] if args.no_native else ["build csrc/pytc_ops.cpp -> libpytc_ops.so"])
    print("Plan:\n  - " + "\n  - ".join(plan))
    if not args.yes:
        if input("proceed? [y/N] ").strip().lower() not in ("y", "yes"):
            return 1

    pip = [sys.executable, "-m", "pip", "install", "--upgrade"]
    if tpu:
        run(pip + ["-e", ".[dev]", "jax[tpu]", "-f",
                   "https://storage.googleapis.com/jax-releases/libtpu_releases.html"])
    else:
        run(pip + ["-e", ".[dev]"])

    if not args.no_native:
        out = ROOT / "pytorch_connectomics_tpu/ops/libpytc_ops.so"
        run(["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-pthread", str(ROOT / "csrc/pytc_ops.cpp"), "-o", str(out)])

    # verify
    code = (
        "import jax, pytorch_connectomics_tpu as p;"
        "from pytorch_connectomics_tpu.ops.native import get_lib;"
        "print('jax', jax.__version__, 'devices', jax.devices());"
        "print('native ops:', 'OK' if get_lib() is not None else 'MISSING')"
    )
    run([sys.executable, "-c", code])
    print("install complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
