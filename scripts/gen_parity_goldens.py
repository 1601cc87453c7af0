#!/usr/bin/env python
"""Generate reference-derived parity goldens (VERDICT r3 item 5).

Runs the REFERENCE implementations (pure numpy/scipy, loaded directly from
/root/reference without installing its heavy deps) on fixed seed-42 fixture
volumes and writes ``tests/unit/fixtures/target_goldens.npz``:

- seg_to_affinity (deepem + banis modes, mixed short/long/negative offsets,
  with -1-unlabeled voxels exercising the validity mask)
  reference: ``connectomics/data/processing/affinity.py:408``
- seg_to_lsd (sigma 5 gaussian; component subset; sphere mode)
  reference: ``connectomics/data/processing/lsd.py:35``
- seg_to_instance_bd (thickness 1 x {all, seg-all, seg-no-bg} x {3d, 2d};
  thickness 3) reference: ``connectomics/data/processing/target.py:122``
- seg_to_polarity (both exclusive modes)
  reference: ``connectomics/data/processing/target.py:218``

Also re-prints the adapted-Rand / VOI scalar goldens hard-coded in
``tests/unit/test_parity_fixtures.py``.

The reference package __init__ imports monai/cc3d/fastremap/skimage which are
not installed here; we stub the unused ones and load the needed modules into
a synthetic package so their relative imports resolve.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
REF = Path("/root/reference/connectomics")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _package(name, path):
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    # stubs for module-level imports the functions we exercise never touch
    _stub("cc3d", connected_components=None)
    _stub("fastremap", renumber=None, remap=None)
    sk = _stub("skimage")
    sk_m = _stub("skimage.morphology", binary_dilation=None, disk=None)
    sk.morphology = sk_m
    # synthetic package skeleton (the real __init__ pulls monai)
    _package("refconn", REF)
    _package("refconn.utils", REF / "utils")
    _package("refconn.data", REF / "data")
    _package("refconn.data.processing", REF / "data" / "processing")
    _load("refconn.utils.channel_slices", REF / "utils" / "channel_slices.py")
    aff = _load("refconn.data.processing.affinity", REF / "data" / "processing" / "affinity.py")
    _load("refconn.data.processing.flow", REF / "data" / "processing" / "flow.py")
    _load("refconn.data.processing.segment", REF / "data" / "processing" / "segment.py")
    tgt = _load("refconn.data.processing.target", REF / "data" / "processing" / "target.py")
    lsd = _load("refconn.data.processing.lsd", REF / "data" / "processing" / "lsd.py")
    return aff, tgt, lsd


def fixture_seg():
    """Instance seg with background, touching instances and -1 ignore voxels."""
    rng = np.random.default_rng(42)
    seg = rng.integers(0, 6, (8, 16, 16)).astype(np.int64)
    ignore = rng.random(seg.shape) < 0.03
    seg[ignore] = -1
    return seg


def fixture_seg_clean():
    rng = np.random.default_rng(42)
    return rng.integers(0, 6, (8, 16, 16)).astype(np.int64)


OFFSETS = [
    (0, 0, 1), (0, 1, 0), (1, 0, 0),          # short, positive
    (0, 0, -3), (0, -3, 0),                   # negative mid-range
    (0, 0, 9), (4, 0, 0),                     # long-range
]


def main():
    aff, tgt, lsd = load_reference_modules()
    out = {}

    seg = fixture_seg()
    clean = fixture_seg_clean()
    out["seg"] = seg
    out["seg_clean"] = clean
    out["offsets"] = np.asarray(OFFSETS, np.int64)

    for mode in ("deepem", "banis"):
        t = aff.seg_to_affinity(seg, offsets=list(OFFSETS), affinity_mode=mode)
        out[f"aff_{mode}_values"] = t.values
        out[f"aff_{mode}_mask"] = t.mask

    for tag, kw in {
        "g5": dict(sigma=5.0),
        "aniso": dict(sigma=(10.0, 5.0, 5.0), voxel_size=(2, 1, 1)),
        "sub0129": dict(sigma=5.0, components="0129"),
        "sphere": dict(sigma=4.0, mode="sphere"),
    }.items():
        out[f"lsd_{tag}"] = lsd.seg_to_lsd(clean.astype(np.uint64), **kw)

    for em in ("all", "seg-all", "seg-no-bg"):
        for bmode in ("3d", "2d"):
            out[f"bd_t1_{em}_{bmode}"] = tgt.seg_to_instance_bd(
                clean, thickness=1, edge_mode=em, mode=bmode
            )
        out[f"bd_t3_{em}_3d"] = tgt.seg_to_instance_bd(
            clean, thickness=3, edge_mode=em, mode="3d"
        )

    pol = np.abs(clean)  # polarity uses non-negative ids
    out["polarity_multi"] = tgt.seg_to_polarity(pol, exclusive=False)
    out["polarity_excl"] = tgt.seg_to_polarity(pol, exclusive=True)

    dst = ROOT / "tests" / "unit" / "fixtures" / "target_goldens.npz"
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({dst.stat().st_size/1e3:.0f} kB):")
    for k, v in out.items():
        print(f"  {k}: {v.shape} {v.dtype} sum={np.asarray(v, np.float64).sum():.6f}")

    # scalar metric goldens (already hard-coded in test_parity_fixtures.py)
    try:
        sys.path.insert(0, "/root/reference")
        spec = importlib.util.spec_from_file_location(
            "ref_seg_np", REF / "metrics" / "segmentation_numpy.py"
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        rng = np.random.default_rng(42)
        gt = rng.integers(0, 6, (8, 16, 16))
        s = gt.copy()
        s[rng.random(s.shape) < 0.15] = rng.integers(0, 8)
        s[rng.random(s.shape) < 0.05] = 0
        are = m.adapted_rand(s, gt, all_stats=True)
        print(f"adapted_rand golden: {are}")
        print(f"voi golden: {m.voi(s, gt)}")
    except Exception as e:  # metrics module layout may differ; goldens exist
        print(f"(metric golden reprint skipped: {e})")


if __name__ == "__main__":
    main()
