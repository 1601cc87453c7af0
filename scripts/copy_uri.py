#!/usr/bin/env python
"""Copy files/directories between local paths and file:// URIs.

Compatibility helper for the external ABISS shell stages, which expect
UPLOAD_CMD/DOWNLOAD_CMD strings (reference scripts/copy_uri.py). Keeps the
local workflow free of a cloud-CLI dependency.

Usage: python scripts/copy_uri.py SRC DST
"""

import argparse
import shutil
import sys
from pathlib import Path
from urllib.parse import unquote, urlparse


def resolve(value: str) -> Path:
    if value.startswith("file://"):
        return Path(unquote(urlparse(value).path))
    return Path(value)


def copy(src_raw: str, dst_raw: str) -> Path:
    src, dst = resolve(src_raw), resolve(dst_raw)
    if not src.exists():
        raise FileNotFoundError(f"source does not exist: {src}")
    # a trailing slash (or existing directory) means "copy INTO"
    into = dst_raw.endswith("/") or (dst.exists() and dst.is_dir())
    target = dst / src.name if into else dst
    target.parent.mkdir(parents=True, exist_ok=True)
    if src.is_dir():
        shutil.copytree(src, target, dirs_exist_ok=True)
    else:
        shutil.copy2(src, target)
    return target


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args(argv)
    target = copy(args.src, args.dst)
    print(target)
    return 0


if __name__ == "__main__":
    sys.exit(main())
