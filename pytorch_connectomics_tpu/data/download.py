"""Tutorial dataset registry, downloader, and train-data auto-download.

Reference: ``connectomics/data/download.py`` (registry + fetch) and
``training/lightning/data_factory.py:372-434`` (auto-download on missing
training paths, with a user prompt).
"""

from __future__ import annotations

import logging
import os
import urllib.error
import urllib.request
from pathlib import Path
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

# name -> expected files, upstream URL, approx size. file entries are
# relative to ``<base_dir>/<name>/``.
DATASETS: Dict[str, Dict] = {
    "lucchi++": {
        "files": ["train_im.h5", "train_mito.h5", "test_im.h5", "test_mito.h5"],
        "url": "https://huggingface.co/datasets/pytc/tutorial",
        "file_urls": {},
        "size_mb": 211,
    },
    "lucchi": {  # alias
        "files": ["train_im.h5", "train_mito.h5", "test_im.h5", "test_mito.h5"],
        "url": "https://huggingface.co/datasets/pytc/tutorial",
        "file_urls": {},
        "size_mb": 211,
    },
    "snemi": {
        "files": ["train_im.h5", "train_label.h5", "test_im.h5"],
        "url": "https://huggingface.co/datasets/pytc/tutorial",
        "file_urls": {},
        "size_mb": 312,
    },
    "mitoem": {
        "files": ["rat_im.zarr", "rat_label.zarr"],
        "url": "https://mitoem.grand-challenge.org/",
        "file_urls": {},
        "size_mb": 30000,
    },
    "cremi": {
        "files": ["train_im.h5", "train_syn_polarity.h5"],
        "url": "https://cremi.org/data/",
        "file_urls": {},
        "size_mb": 2000,
    },
    "nisb": {
        "files": ["train_im.h5", "train_label.h5", "test_im.h5", "test_label.h5"],
        "url": "https://structuredbio.org/nisb",
        "file_urls": {},
        "size_mb": 4000,
    },
}


def list_datasets() -> List[str]:
    for name, spec in sorted(DATASETS.items()):
        logger.info("  %s (~%d MB): %s", name, spec["size_mb"], spec["url"])
    return sorted(DATASETS)


def dataset_status(name: str, base_dir: str | Path = "datasets") -> List[str]:
    """Missing files for a dataset under ``base_dir`` (empty = complete)."""
    spec = DATASETS[name]
    d = Path(base_dir) / name
    return [f for f in spec["files"] if not (d / f).exists()]


def download_dataset(name: str, base_dir: str | Path = "datasets") -> bool:
    """Fetch missing files. Returns True when the dataset is complete.

    Per-file URLs come from the registry's ``file_urls``; entries without a
    direct URL (most gated datasets) cannot be fetched automatically and
    leave the dataset incomplete with instructions logged."""
    spec = DATASETS[name]
    d = Path(base_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    ok = True
    for f in dataset_status(name, base_dir):
        url = spec.get("file_urls", {}).get(f)
        if not url:
            logger.warning("no direct URL for %s/%s; fetch manually from %s", name, f, spec["url"])
            ok = False
            continue
        try:
            logger.info("downloading %s -> %s", url, d / f)
            urllib.request.urlretrieve(url, d / f)  # noqa: S310
        except (urllib.error.URLError, OSError) as e:
            logger.warning("download failed for %s: %s", url, e)
            ok = False
    return ok and not dataset_status(name, base_dir)


def infer_dataset_from_path(path: str) -> Optional[str]:
    """Match a missing data path onto a registry entry (reference
    ``data_factory.py:398-403``; '++'-suffixed aliases are skipped)."""
    p = str(path).lower()
    for name in DATASETS:
        if name.endswith("++"):
            continue
        if name in p:
            return name
    return None


def maybe_autodownload_train_data(cfg, interactive: Optional[bool] = None) -> None:
    """When training data is missing, try the registry: auto-download (with
    a prompt when interactive, or when ``PYTC_AUTO_DOWNLOAD=1``), else raise
    ``FileNotFoundError`` with fetch instructions
    (reference ``data_factory.py:372-434``)."""
    from glob import glob

    value = cfg.data.train.image
    paths = value if isinstance(value, list) else ([value] if value else [])
    paths = [str(p) for p in paths]
    if not paths or any(p.startswith(("random://", "synthetic://")) for p in paths):
        return

    def _exists(p: str) -> bool:
        stem = p.split("::")[0]
        if "*" in stem or "?" in stem:
            return bool(glob(stem))
        return Path(stem).exists()

    if any(_exists(p) for p in paths):
        return

    name = infer_dataset_from_path(paths[0])
    if name is None:
        logger.info("available datasets:")
        list_datasets()
        raise FileNotFoundError(f"Training data not found: {value}")

    if interactive is None:
        interactive = os.isatty(0)
    allowed = os.environ.get("PYTC_AUTO_DOWNLOAD") == "1"
    if not allowed and interactive:
        spec = DATASETS[name]
        try:
            resp = input(f"Download {name} dataset (~{spec['size_mb']} MB)? [Y/n]: ")
            allowed = resp.strip().lower() in ("", "y", "yes")
        except (EOFError, KeyboardInterrupt):
            allowed = False
    if allowed and download_dataset(name):
        logger.info("dataset %s downloaded", name)
        return
    spec = DATASETS[name]
    raise FileNotFoundError(
        f"Training data not found: {value}. Fetch the '{name}' dataset "
        f"(~{spec['size_mb']} MB) from {spec['url']} into datasets/{name}/, "
        "or set PYTC_AUTO_DOWNLOAD=1 to fetch registered files automatically."
    )
