#!/usr/bin/env python
"""Tutorial dataset registry + downloader
(reference ``connectomics/data/download.py:20-70`` + ``scripts/download_data.py``).

This environment has no network egress; the script verifies/creates the
expected layout and prints instructions when files are missing.
"""

import argparse
import sys
import urllib.request
from pathlib import Path

DATASETS = {
    "lucchi++": {
        "files": ["train_im.h5", "train_mito.h5", "test_im.h5", "test_mito.h5"],
        "url": "https://huggingface.co/datasets/pytc/tutorial",
        "size": "211 MiB",
    },
    "snemi": {
        "files": ["train_im.h5", "train_label.h5", "test_im.h5"],
        "url": "https://huggingface.co/datasets/pytc/tutorial",
        "size": "312 MiB",
    },
    "mitoem": {
        "files": ["rat_im.zarr", "rat_label.zarr"],
        "url": "https://mitoem.grand-challenge.org/",
        "size": "~30 GiB",
    },
    "cremi": {
        "files": ["train_im.h5", "train_syn_polarity.h5"],
        "url": "https://cremi.org/data/",
        "size": "~2 GiB",
    },
    "nisb": {
        "files": ["train_im.h5", "train_label.h5", "test_im.h5", "test_label.h5"],
        "url": "https://structuredbio.org/nisb",
        "size": "~4 GiB",
    },
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=sorted(DATASETS) + ["all"], nargs="?", default="all")
    p.add_argument("--root", default="datasets")
    args = p.parse_args()
    names = sorted(DATASETS) if args.dataset == "all" else [args.dataset]
    for name in names:
        spec = DATASETS[name]
        d = Path(args.root) / name
        d.mkdir(parents=True, exist_ok=True)
        missing = [f for f in spec["files"] if not (d / f).exists()]
        if not missing:
            print(f"[ok] {name}: complete at {d}")
            continue
        print(f"[missing] {name} ({spec['size']}): {missing}")
        print(f"          fetch from {spec['url']} into {d}/")


if __name__ == "__main__":
    main()
