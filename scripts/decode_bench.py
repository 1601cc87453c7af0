#!/usr/bin/env python
"""Native decode-stack throughput benchmark: Mvox/s for the C++ kernels
(CCL, watershed, waterz-equivalent agglomeration, mutex watershed,
multilabel EDT, remap) on a realistic synthetic affinity volume.

The reference's decode stack rides external C++ packages (waterz, cc3d,
mahotas, affogato, edt); this measures our first-party equivalents'
production throughput. Usage:

  python scripts/decode_bench.py [--shape 64 256 256] [--reps 3]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np


def synth_affinity(shape, n_cells=120, seed=0):
    """Voronoi-cell instance labels + boundary-suppressed affinities."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.integers(0, s, n_cells) for s in shape], axis=1
    ).astype(np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    # nearest-seed labels, chunked over z to bound memory
    lab = np.zeros(shape, np.uint32)
    for z0 in range(0, shape[0], 8):
        z1 = min(z0 + 8, shape[0])
        coords = np.stack(
            [zz[z0:z1].ravel(), yy[z0:z1].ravel(), xx[z0:z1].ravel()], axis=1
        ).astype(np.float32)
        d = ((coords[:, None, :] - pts[None]) ** 2).sum(-1)
        lab[z0:z1] = (d.argmin(1) + 1).reshape(z1 - z0, *shape[1:])
    from pytorch_connectomics_tpu.data.targets import seg_to_affinity

    aff = seg_to_affinity(lab, ["0-0-1", "0-1-0", "1-0-0"]).astype(np.float32)
    aff = np.clip(aff + rng.normal(0, 0.08, aff.shape).astype(np.float32), 0, 1)
    return lab, aff


def bench(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", nargs=3, type=int, default=[64, 256, 256])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    shape = tuple(args.shape)
    nvox = float(np.prod(shape))

    from pytorch_connectomics_tpu.decoding.decoders import decode_waterz
    from pytorch_connectomics_tpu.ops import native

    lab, aff = synth_affinity(shape)
    mean_aff = aff.mean(axis=0)
    fg = mean_aff > 0.5

    results = {}

    def add(name, fn):
        dt = bench(fn, args.reps)
        results[name] = round(nvox / dt / 1e6, 1)
        print(f"{name:24s} {dt*1e3:8.1f} ms  {results[name]:8.1f} Mvox/s", flush=True)

    add("ccl3d_26", lambda: native.connected_components(fg, 26))
    add("affinity_cc", lambda: native.affinity_connected_components(aff, 0.5))
    seeds, _ = native.connected_components(mean_aff > 0.9, 6)
    add("watershed_seeded", lambda: native.watershed(1.0 - mean_aff, seeds, fg))
    frags = native.watershed(1.0 - mean_aff, seeds, fg)
    add("agglomerate_mean", lambda: native.agglomerate(frags, aff, 0.3))
    add(
        "agglomerate_multi_x9",
        lambda: native.agglomerate_multi(frags, aff, [i / 10 for i in range(1, 10)]),
    )
    add("mutex_watershed", lambda: native.mutex_watershed(
        aff, [[0, 0, 1], [0, 1, 0], [1, 0, 0]]))
    add("edt_multilabel", lambda: native.edt(lab))
    add("renumber", lambda: native.renumber(lab))
    add("waterz_decoder_e2e", lambda: decode_waterz(aff, threshold=0.3))

    # chunk-parallel waterz (exact parity path): CC fragments + per-chunk
    # RAG + RAG-level agglomeration, thread-parallel over chunks
    from pytorch_connectomics_tpu.decoding.streamed import (
        streamed_affinity_cc_decode,
        streamed_waterz_decode,
    )

    # NB: workers auto-size to the CPU count — on a 1-core dev host these
    # measure chunking OVERHEAD (no parallel win is possible); on a real
    # decode host the chunk decodes and RAG extractions run concurrently.
    reader = lambda sl: aff[(slice(None),) + tuple(sl)]  # noqa: E731
    chunk = tuple(max(1, s // 2) for s in shape)
    add("streamed_cc", lambda: streamed_affinity_cc_decode(
        reader, shape, chunk, threshold=0.5))
    add("streamed_waterz", lambda: streamed_waterz_decode(
        reader, shape, chunk, threshold=0.3, fragment_threshold=0.9))

    print(json.dumps({"metric": "decode_throughput", "unit": "Mvox/s",
                      "shape": list(shape), "results": results}))


if __name__ == "__main__":
    main()
