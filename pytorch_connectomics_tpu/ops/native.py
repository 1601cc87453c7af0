"""ctypes bindings for the native C++ post-processing kernels
(``csrc/pytc_ops.cpp``), with pure scipy/numpy fallbacks when the shared
library is missing and no compiler is available.

These are the TPU-era replacements for the reference's third-party native
stack (SURVEY §2.6): cc3d, fastremap, mahotas cwatershed, waterz, affogato,
edt. Host-side — they run overlapped with device compute in the test
pipeline.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libpytc_ops.so"
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_library() -> bool:
    src = _CSRC / "pytc_ops.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", str(src), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception as e:  # pragma: no cover
        logger.warning("native ops build failed (%s); using numpy fallbacks", e)
        return False


def _lib_is_stale() -> bool:
    """True when the .so predates the source — rebuild so edits to
    csrc/pytc_ops.cpp are never shadowed by a stale binary."""
    src = _CSRC / "pytc_ops.cpp"
    try:
        return src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:  # pragma: no cover
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if (not _LIB_PATH.exists() or _lib_is_stale()) and not _build_library():
        if not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("cannot load native ops (%s)", e)
        return None
    i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ccl3d.restype = i64
    lib.ccl3d.argtypes = [u8p, i64, i64, i64, ctypes.c_int, u32p]
    lib.remap_u32.restype = None
    lib.remap_u32.argtypes = [u32p, i64, u32p, u32p, i64]
    lib.renumber_u32.restype = i64
    lib.renumber_u32.argtypes = [u32p, i64]
    lib.dust_u32.restype = i64
    lib.dust_u32.argtypes = [u32p, i64, i64]
    lib.watershed_seeded.restype = None
    lib.watershed_seeded.argtypes = [f32p, u32p, ctypes.c_void_p, i64, i64, i64, u32p]
    lib.affinity_cc.restype = i64
    lib.affinity_cc.argtypes = [f32p, i64, i64, i64, f32, u32p]
    lib.agglomerate_mean.restype = i64
    lib.agglomerate_mean.argtypes = [u32p, f32p, i64, i64, i64, f32, u32p]
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.agglomerate_mean_multi.restype = i64
    lib.agglomerate_mean_multi.argtypes = [
        u32p, f32p, i64, i64, i64, f32p, i64, u32p, i64p,
    ]
    lib.mutex_watershed.restype = i64
    lib.mutex_watershed.argtypes = [f32p, i32p, i64, i64, i64, i64, u32p]
    f64p_ = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p_ = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    vp = ctypes.c_void_p
    lib.rag_mean_edges.restype = i64
    lib.rag_mean_edges.argtypes = [
        u32p, f32p, i64, i64, i64, vp, vp, vp, u32p, u32p, f64p_, i64p_, i64,
    ]
    lib.agglomerate_rag.restype = i64
    lib.agglomerate_rag.argtypes = [u32p, u32p, f64p_, i64p_, i64, ctypes.c_uint32, f32, u32p]
    lib.binary_morph.restype = None
    lib.binary_morph.argtypes = [u8p, i64, i64, i64, ctypes.c_int, ctypes.c_int, u8p]
    lib.edt_multilabel.restype = None
    lib.edt_multilabel.argtypes = [u32p, i64, i64, i64, f32, f32, f32, f32p]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    d = ctypes.c_double
    lib.teasar_skeleton.restype = i64
    lib.teasar_skeleton.argtypes = [
        u8p, f32p, i64, i64, i64, d, d, d, d, d, d, i64,
        f64p, i64p, i64, i64, ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# public ops (native with fallback)
# ---------------------------------------------------------------------------


def connected_components(fg: np.ndarray, connectivity: int = 6) -> Tuple[np.ndarray, int]:
    """3-D CCL on a boolean/uint8 mask -> (labels uint32, count)."""
    fg = np.ascontiguousarray(fg.astype(np.uint8))
    lib = get_lib()
    if lib is not None:
        out = np.empty(fg.shape, np.uint32)
        n = lib.ccl3d(fg, *fg.shape, connectivity, out)
        return out, int(n)
    from scipy import ndimage

    st = ndimage.generate_binary_structure(3, {6: 1, 18: 2, 26: 3}[connectivity])
    lab, n = ndimage.label(fg, structure=st)
    return lab.astype(np.uint32), int(n)


def remap(labels: np.ndarray, mapping: dict) -> np.ndarray:
    """Relabel through a {old: new} table (fastremap.remap equivalent)."""
    labels = np.ascontiguousarray(labels, dtype=np.uint32)
    lib = get_lib()
    out = labels.copy()
    if lib is not None and mapping:
        keys = np.fromiter(mapping.keys(), np.uint32, len(mapping))
        vals = np.fromiter(mapping.values(), np.uint32, len(mapping))
        lib.remap_u32(out, out.size, keys, vals, len(mapping))
        return out
    if mapping:
        maxk = max(int(labels.max()), max(mapping))
        lut = np.arange(maxk + 1, dtype=np.uint32)
        for k, v in mapping.items():
            lut[k] = v
        out = lut[labels]
    return out


def renumber(labels: np.ndarray) -> Tuple[np.ndarray, int]:
    """Contiguous relabeling preserving first appearance (fastremap.renumber)."""
    labels = np.ascontiguousarray(labels, dtype=np.uint32).copy()
    lib = get_lib()
    if lib is not None:
        n = lib.renumber_u32(labels, labels.size)
        return labels, int(n)
    uniq, inv = np.unique(labels, return_inverse=True)
    # preserve 0 -> 0
    order = {u: i for i, u in enumerate(uniq)}
    if 0 in order and order[0] != 0:
        raise ValueError("labels must include 0 background")
    return inv.reshape(labels.shape).astype(np.uint32), len(uniq) - (1 if 0 in order else 0)


def remove_small(labels: np.ndarray, min_size: int) -> Tuple[np.ndarray, int]:
    """cc3d.dust equivalent; returns (labels, kept_count)."""
    labels = np.ascontiguousarray(labels, dtype=np.uint32).copy()
    if min_size <= 1:
        ids = np.unique(labels)
        return labels, int((ids > 0).sum())
    lib = get_lib()
    if lib is not None:
        kept = lib.dust_u32(labels, labels.size, min_size)
        return labels, int(kept)
    ids, counts = np.unique(labels, return_counts=True)
    small = ids[(counts < min_size) & (ids > 0)]
    if small.size:
        lut = np.arange(labels.max() + 1, dtype=np.uint32)
        lut[small] = 0
        labels = lut[labels]
    return labels, int((np.unique(labels) > 0).sum())


def watershed(energy: np.ndarray, seeds: np.ndarray, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Seeded watershed ascending ``energy`` (mahotas cwatershed equivalent)."""
    energy = np.ascontiguousarray(energy, dtype=np.float32)
    seeds = np.ascontiguousarray(seeds, dtype=np.uint32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(energy.shape, np.uint32)
        m = np.ascontiguousarray(mask.astype(np.uint8)) if mask is not None else None
        lib.watershed_seeded(
            energy, seeds,
            m.ctypes.data if m is not None else None,
            *energy.shape, out,
        )
        return out
    from skimage.segmentation import watershed as sk_ws  # pragma: no cover

    return sk_ws(energy, seeds, mask=mask).astype(np.uint32)


def affinity_connected_components(aff: np.ndarray, threshold: float = 0.5) -> Tuple[np.ndarray, int]:
    """BANIS-style decode: threshold 3-channel cardinal affinities -> CC
    (reference ``decode_affinity_cc``, ``decoders/segmentation.py:498``)."""
    aff = np.ascontiguousarray(aff[:3], dtype=np.float32)
    lib = get_lib()
    z, y, x = aff.shape[1:]
    if lib is not None:
        out = np.empty((z, y, x), np.uint32)
        n = lib.affinity_cc(aff, z, y, x, float(threshold), out)
        return out, int(n)
    # numpy fallback: union via scipy on a 6-connectivity graph approximation
    fg = (aff > threshold).any(axis=0)
    return connected_components(fg, 6)


def agglomerate(fragments: np.ndarray, aff: np.ndarray, threshold: float = 0.5) -> Tuple[np.ndarray, int]:
    """waterz-style hierarchical mean-affinity agglomeration of fragments."""
    fragments = np.ascontiguousarray(fragments, dtype=np.uint32)
    aff = np.ascontiguousarray(aff[:3], dtype=np.float32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("agglomerate requires the native ops library")
    out = np.empty(fragments.shape, np.uint32)
    n = lib.agglomerate_mean(fragments, aff, *fragments.shape, float(threshold), out)
    return out, int(n)


def agglomerate_multi(
    fragments: np.ndarray, aff: np.ndarray, thresholds: Sequence[float]
) -> "dict[float, Tuple[np.ndarray, int]]":
    """Batch waterz agglomeration: one RAG + one merge pass serves every
    threshold (waterz batch-threshold semantics, reference
    ``decoding/tuning/optuna_tuner.py:1155``). Returns
    {threshold: (labels, count)} in the caller's order."""
    fragments = np.ascontiguousarray(fragments, dtype=np.uint32)
    aff = np.ascontiguousarray(aff[:3], dtype=np.float32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("agglomerate_multi requires the native ops library")
    thr = sorted(set(float(t) for t in thresholds), reverse=True)
    thr_arr = np.asarray(thr, np.float32)
    t = len(thr)
    out = np.empty((t,) + fragments.shape, np.uint32)
    counts = np.zeros(t, np.int64)
    lib.agglomerate_mean_multi(
        fragments, aff, *fragments.shape, thr_arr, t, out, counts
    )
    by_thr = {thr[i]: (out[i], int(counts[i])) for i in range(t)}
    return {float(tv): by_thr[float(tv)] for tv in thresholds}


def rag_mean_edges(
    labels: np.ndarray,
    aff: np.ndarray,
    lz: Optional[np.ndarray] = None,
    ly: Optional[np.ndarray] = None,
    lx: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Mean-affinity RAG statistics for a (chunk of a) fragment volume.

    Each affinity edge is owned by its HIGH-end voxel, so chunk grids
    partition the global edge set exactly; ``lz/ly/lx`` are the neighbor
    label planes across the chunk's low z/y/x faces (shape (Y,X)/(Z,X)/(Z,Y);
    None at volume boundaries). Returns ``(a, b, sum, count)`` arrays with
    ``a < b``; concatenating chunk results and feeding :func:`agglomerate_rag`
    reproduces the whole-volume :func:`agglomerate` merge sequence exactly.
    """
    labels = np.ascontiguousarray(labels, dtype=np.uint32)
    aff = np.ascontiguousarray(aff[:3], dtype=np.float32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("rag_mean_edges requires the native ops library")

    def plane(p):
        if p is None:
            return None
        return np.ascontiguousarray(p, dtype=np.uint32)

    lz, ly, lx = plane(lz), plane(ly), plane(lx)

    def ptr(p):
        return p.ctypes.data if p is not None else None

    max_edges = 65536
    while True:
        ea = np.empty(max_edges, np.uint32)
        eb = np.empty(max_edges, np.uint32)
        esum = np.empty(max_edges, np.float64)
        ecnt = np.empty(max_edges, np.int64)
        n = lib.rag_mean_edges(
            labels, aff, *labels.shape, ptr(lz), ptr(ly), ptr(lx),
            ea, eb, esum, ecnt, max_edges,
        )
        if n >= 0:
            return ea[:n], eb[:n], esum[:n], ecnt[:n]
        max_edges = int(-n)


def agglomerate_rag(
    ea: np.ndarray,
    eb: np.ndarray,
    esum: np.ndarray,
    ecnt: np.ndarray,
    max_label: int,
    threshold: float,
) -> np.ndarray:
    """RAG-level waterz agglomeration: same merge policy (and sequence) as
    :func:`agglomerate`, on a prebuilt edge list (duplicate (a,b) rows are
    combined additively). Returns ``mapping`` with ``mapping[i]`` = surviving
    root fragment id for fragment ``i`` (``mapping[0] == 0``)."""
    ea = np.ascontiguousarray(ea, dtype=np.uint32)
    eb = np.ascontiguousarray(eb, dtype=np.uint32)
    esum = np.ascontiguousarray(esum, dtype=np.float64)
    ecnt = np.ascontiguousarray(ecnt, dtype=np.int64)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("agglomerate_rag requires the native ops library")
    mapping = np.empty(int(max_label) + 1, np.uint32)
    lib.agglomerate_rag(
        ea, eb, esum, ecnt, len(ea), int(max_label), float(threshold), mapping
    )
    return mapping


def mutex_watershed(aff: np.ndarray, offsets: Sequence[Sequence[int]]) -> Tuple[np.ndarray, int]:
    """Mutex watershed over short+long-range affinities (affogato equivalent)."""
    aff = np.ascontiguousarray(aff, dtype=np.float32)
    offs = np.ascontiguousarray(np.asarray(offsets, dtype=np.int32))
    lib = get_lib()
    if lib is None:
        raise RuntimeError("mutex_watershed requires the native ops library")
    k, z, y, x = aff.shape
    out = np.empty((z, y, x), np.uint32)
    n = lib.mutex_watershed(aff, offs, k, z, y, x, out)
    return out, int(n)


def binary_erosion(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    return _morph(mask, iterations, dilate=False)


def binary_dilation(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    return _morph(mask, iterations, dilate=True)


def _morph(mask: np.ndarray, iterations: int, dilate: bool) -> np.ndarray:
    m = np.ascontiguousarray(mask.astype(np.uint8))
    lib = get_lib()
    if lib is not None:
        out = np.empty(m.shape, np.uint8)
        lib.binary_morph(m, *m.shape, iterations, int(dilate), out)
        return out.astype(bool)
    from scipy import ndimage

    st = ndimage.generate_binary_structure(3, 1)
    fn = ndimage.binary_dilation if dilate else ndimage.binary_erosion
    return fn(m, st, iterations=iterations)


def edt(labels: np.ndarray, anisotropy: Sequence[float] = (1.0, 1.0, 1.0)) -> np.ndarray:
    """Multi-label EDT: per-voxel distance to its instance boundary
    (edt package equivalent)."""
    labels = np.ascontiguousarray(labels, dtype=np.uint32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(labels.shape, np.float32)
        az, ay, ax = (float(a) for a in anisotropy)
        lib.edt_multilabel(labels, *labels.shape, az, ay, ax, out)
        return out
    from scipy import ndimage

    out = np.zeros(labels.shape, np.float32)
    for iid in np.unique(labels):
        if iid == 0:
            continue
        m = labels == iid
        out[m] = ndimage.distance_transform_edt(m, sampling=anisotropy)[m]
    return out


def teasar_skeleton(
    mask: np.ndarray,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    scale: float = 1.5,
    const_r: float = 2.0,
    penalty_scale: float = 5000.0,
    max_paths: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """TEASAR centerline skeleton of one binary instance (kimimaro
    equivalent; Sato et al. 2000). Returns (nodes (N,3) float64 zyx voxel
    coords, edges (M,2) int64)."""
    import ctypes as _ct

    from scipy import ndimage as _ndi

    # 1-voxel zero border: the boundary distance field must see background
    # even when the mask fills its bbox (a borderless all-true EDT explodes
    # and the invalidation ball swallows the whole instance)
    m = np.pad(np.ascontiguousarray(mask.astype(np.uint8)), 1)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("teasar_skeleton requires the native ops library")
    dbf = np.ascontiguousarray(
        _ndi.distance_transform_edt(m, sampling=anisotropy).astype(np.float32)
    )
    node_cap = int(m.sum()) + 1
    nodes = np.empty((node_cap, 3), np.float64)
    edges = np.empty((node_cap, 2), np.int64)
    n_edges = _ct.c_int64(0)
    az, ay, ax = (float(a) for a in anisotropy)
    n = lib.teasar_skeleton(
        m, dbf, *m.shape, az, ay, ax, float(scale), float(const_r),
        float(penalty_scale), int(max_paths), nodes, edges,
        node_cap, node_cap, _ct.byref(n_edges),
    )
    if n < 0:
        raise RuntimeError("teasar_skeleton: output capacity exceeded")
    return nodes[:n] - 1.0, edges[: n_edges.value].copy()
