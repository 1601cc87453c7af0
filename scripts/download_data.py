#!/usr/bin/env python
"""Tutorial dataset registry + downloader CLI
(reference ``connectomics/data/download.py`` + ``scripts/download_data.py``).

Checks/creates the expected layout, fetches files with registered direct
URLs, and prints instructions for gated datasets.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pytorch_connectomics_tpu.data.download import (  # noqa: E402
    DATASETS,
    dataset_status,
    download_dataset,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=sorted(DATASETS) + ["all"], nargs="?", default="all")
    p.add_argument("--root", default="datasets")
    p.add_argument("--fetch", action="store_true", help="attempt downloads for registered URLs")
    args = p.parse_args()
    names = sorted(DATASETS) if args.dataset == "all" else [args.dataset]
    for name in names:
        missing = dataset_status(name, args.root)
        if not missing:
            print(f"[ok] {name}: complete at {Path(args.root) / name}")
            continue
        if args.fetch and download_dataset(name, args.root):
            print(f"[fetched] {name}")
            continue
        spec = DATASETS[name]
        print(f"[missing] {name} (~{spec['size_mb']} MB): {missing}")
        print(f"          fetch from {spec['url']} into {Path(args.root) / name}/")


if __name__ == "__main__":
    main()
