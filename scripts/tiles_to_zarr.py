#!/usr/bin/env python
"""Convert a tiled PNG volume to a chunked multiscale zarr.

Tiled-PNG reads decode a whole section tile per ROI, starving inference;
a one-time conversion to chunked zarr makes reads random-access
(reference ``scripts/tiles_to_zarr.py``). Stages mirror the reference's
shardable workflow: ``init`` creates the arrays, ``base`` fills level 0
(shardable over z), ``pyramid`` builds 2x/4x/8x levels, ``verify``
cross-checks level 0 against the tiles.

Usage:
    python scripts/tiles_to_zarr.py --source tiles_dir_or_spec.json \
        --output out.zarr --stage init
    python scripts/tiles_to_zarr.py ... --stage base [--shard-id I --num-shards N]
    python scripts/tiles_to_zarr.py ... --stage pyramid
    python scripts/tiles_to_zarr.py ... --stage verify [--shard-id I --num-shards N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LEVELS = 4
CHUNK = (64, 256, 256)


def open_source(source: str):
    from pytorch_connectomics_tpu.inference.lazy import _open_tile_source

    return _open_tile_source(source)


def zarr_group(output: str):
    import tensorstore as ts

    return ts, Path(output)


def level_spec(ts, output: Path, level: int, shape, dtype, create: bool):
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(output / str(level))},
        "metadata": {
            "shape": list(shape),
            "chunks": list(CHUNK),
            "dtype": np.dtype(dtype).str,
        },
    }
    return ts.open(spec, create=create, open=not create).result()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--stage", choices=["init", "base", "pyramid", "verify"], required=True)
    p.add_argument("--shard-id", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    args = p.parse_args()

    tv = open_source(args.source)
    ts, out = zarr_group(args.output)
    shape = tv.shape

    if args.stage == "init":
        out.mkdir(parents=True, exist_ok=True)
        shapes = []
        s = list(shape)
        for lvl in range(LEVELS):
            level_spec(ts, out, lvl, s, tv.dtype, create=True)
            shapes.append(list(s))
            s = [max(1, x // 2) for x in s]
        (out / "multiscale.json").write_text(
            json.dumps({"levels": shapes, "downsample": 2, "source": str(args.source)})
        )
        print(f"init: {LEVELS} levels at {out} (full res {shape})")
        return

    if args.stage == "base":
        arr = level_spec(ts, out, 0, shape, tv.dtype, create=False)
        zs = [z for z in range(0, shape[0], CHUNK[0]) if (z // CHUNK[0]) % args.num_shards == args.shard_id]
        for z0 in zs:
            z1 = min(z0 + CHUNK[0], shape[0])
            block = tv[slice(z0, z1), slice(0, shape[1]), slice(0, shape[2])]
            arr[z0:z1].write(block).result()
            print(f"base: wrote z[{z0}:{z1}]", flush=True)
        return

    if args.stage == "pyramid":
        prev = level_spec(ts, out, 0, shape, tv.dtype, create=False)
        s = list(shape)
        for lvl in range(1, LEVELS):
            ns = [max(1, x // 2) for x in s]
            nxt = level_spec(ts, out, lvl, ns, tv.dtype, create=False)
            for z0 in range(0, ns[0], CHUNK[0]):
                z1 = min(z0 + CHUNK[0], ns[0])
                src = prev[2 * z0 : min(2 * z1, s[0])].read().result()
                sz, sy, sx = src.shape
                src = src[: (sz // 2) * 2 or 1, : (sy // 2) * 2, : (sx // 2) * 2]
                if src.shape[0] >= 2:
                    ds = src.reshape(src.shape[0] // 2, 2, src.shape[1] // 2, 2, src.shape[2] // 2, 2)
                    ds = ds.mean(axis=(1, 3, 5)).astype(src.dtype)
                else:
                    ds = src[:, ::2, ::2]
                nxt[z0 : z0 + ds.shape[0], : ds.shape[1], : ds.shape[2]].write(ds).result()
            prev, s = nxt, ns
            print(f"pyramid: level {lvl} {ns}", flush=True)
        return

    # verify
    arr = level_spec(ts, out, 0, shape, tv.dtype, create=False)
    zs = [z for z in range(shape[0]) if z % args.num_shards == args.shard_id]
    bad = 0
    for z in zs:
        want = tv[slice(z, z + 1), slice(0, shape[1]), slice(0, shape[2])][0]
        got = arr[z].read().result()
        if not np.array_equal(want, got):
            bad += 1
            print(f"verify: MISMATCH at z={z}", flush=True)
    print(f"verify shard {args.shard_id}/{args.num_shards}: {len(zs)} sections, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
