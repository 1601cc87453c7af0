"""External checkpoint import: load foreign (PyTorch) checkpoints — BANIS,
nnU-Net, reference-framework runs — into our Flax models.

Reference: ``load_external_weights`` (``connectomics/training/model_weights.py:14``)
and the nnU-Net loader (``models/architectures/nnunet_models.py:49``).

Strategy: strip configured key prefixes from the torch state_dict, convert
conv kernels from torch OIZYX to flax (Z,Y,X,I,O) layout, then match
against the flax param tree by (path-suffix similarity, shape). Exact
architecture parity is not required — anything that matches by shape and
name order is filled; the rest is reported.
"""

from __future__ import annotations

import logging
import pickle
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# -- torch-free checkpoint reading -------------------------------------------
#
# A torch ``.pt/.pth/.ckpt`` (zip format, torch >= 1.6) is a zip archive of
# ``<stem>/data.pkl`` (a pickle whose tensors are persistent-id references)
# plus ``<stem>/data/<key>`` raw little-endian storage files. Reading it needs
# no torch: a restricted Unpickler that resolves the storage references and
# rebuilds numpy arrays (VERDICT r3 item 4 — torch may be absent in
# deployment images; torch.load stays as the fallback for legacy non-zip
# files). Reference counterpart: ``training/model_weights.py:14`` just calls
# ``torch.load``.

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": np.dtype("<u2"),  # reinterpreted via ml_dtypes below
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}


class _StorageRef:
    __slots__ = ("dtype", "key", "numel", "is_bf16")

    def __init__(self, dtype, key, numel, is_bf16=False):
        self.dtype, self.key, self.numel, self.is_bf16 = dtype, key, numel, is_bf16


class _StorageType:
    """Stand-in returned by find_class for torch.<X>Storage references.

    Only ever used as the ``storage_type`` slot of a persistent id; if the
    pickle tries to *instantiate* it (a serialized storage/tensor-class
    object we don't model), refuse loudly so the caller's ``torch.load``
    fallback triggers instead of returning a corrupted stand-in."""

    def __init__(self, name):
        self.name = name

    def __call__(self, *args, **kwargs):
        raise pickle.UnpicklingError(
            f"torch-free reader: cannot instantiate torch class {self.name}"
        )


def _rebuild_tensor(storage: _StorageRef, offset, size, stride, *_args, **_kw):
    return ("__tensor__", storage, offset, tuple(size), tuple(stride))


def _rebuild_parameter(data, *_args, **_kw):
    return data


def _rebuild_from_type_v2(func, _new_type, args, _state):
    # torch subclass rebuild wrapper: resolve the inner tensor, ignore type
    return func(*args)


class _TorchFreeUnpickler(pickle.Unpickler):
    """Restricted unpickler: tensor storages + containers ONLY.

    Anything else (arbitrary reduce of non-allowlisted classes) raises — the
    torch-free path is strictly safer than ``torch.load`` with pickle."""

    _ALLOWED = {
        ("collections", "OrderedDict"),
        ("torch._utils", "_rebuild_tensor_v2"),
        ("torch._utils", "_rebuild_tensor"),
        ("torch._utils", "_rebuild_parameter"),
        ("torch._tensor", "_rebuild_from_type_v2"),
    }

    def find_class(self, module, name):
        if (module, name) == ("collections", "OrderedDict"):
            import collections

            return collections.OrderedDict
        if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if module.startswith("torch") and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name == "Size":
            # torch.Size is a tuple subclass; REDUCEd as Size(iterable)
            return tuple
        if module == "torch" and name == "Tensor":
            # appears as _rebuild_from_type_v2 metadata (a class object,
            # never called); _StorageType raises if it IS called
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"torch-free reader: refusing to unpickle {module}.{name} "
            "(only tensor storages and containers are allowed)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _tag, storage_type, key, _location, numel = pid
        tname = storage_type.name if isinstance(storage_type, _StorageType) else str(storage_type)
        if tname == "UntypedStorage":
            # numel is in BYTES and the element dtype lives outside the
            # persistent id; interpreting it as u8 would yield silently
            # wrong weights — refuse so torch.load handles it instead
            raise pickle.UnpicklingError(
                "torch-free reader: untyped storages are not supported"
            )
        dt = _STORAGE_DTYPES.get(tname)
        if dt is None:
            raise pickle.UnpicklingError(f"unsupported storage type {tname}")
        return _StorageRef(dt, str(key), int(numel), is_bf16=(tname == "BFloat16Storage"))


def _materialize(obj, raw: Dict[str, bytes]):
    """Resolve ``__tensor__`` placeholders into numpy arrays (strided view +
    copy, so non-contiguous saves round-trip)."""
    if isinstance(obj, tuple) and len(obj) == 5 and obj[0] == "__tensor__":
        _t, ref, offset, size, stride = obj
        buf = raw[ref.key]
        arr = np.frombuffer(buf, dtype=ref.dtype)
        itemsize = ref.dtype.itemsize
        if size:
            arr = np.lib.stride_tricks.as_strided(
                arr[offset:],
                shape=size,
                strides=tuple(s * itemsize for s in stride),
            ).copy()
        else:  # 0-d: keep an ndarray (a numpy scalar would be dropped by
            # load_torch_state_dict's isinstance(ndarray) filter)
            arr = np.asarray(arr[offset]) if arr.size else arr.copy()
        if ref.is_bf16:
            try:
                import ml_dtypes

                arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
            except ImportError:  # widen manually: bf16 = high 16 bits of f32
                arr = (arr.astype(np.uint32) << 16).view(np.float32)
        return arr
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v, raw)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v, raw) for v in obj)
    return obj


def read_torch_checkpoint(path: str) -> Any:
    """Torch-free ``torch.load`` for zip-format checkpoints: returns the
    pickled object tree with every tensor as a numpy array. Raises
    ``UnpicklingError`` on non-tensor custom classes (restricted by design);
    callers fall back to ``torch.load`` for legacy/exotic files."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next(n for n in names if n.endswith("data.pkl"))
        stem = pkl[: -len("data.pkl")]
        raw = {
            n[len(stem) + len("data/"):]: zf.read(n)
            for n in names
            if n.startswith(stem + "data/")
        }
        import io

        obj = _TorchFreeUnpickler(io.BytesIO(zf.read(pkl))).load()
    return _materialize(obj, raw)


def load_torch_state_dict(path: str, strip_prefixes: Tuple[str, ...] = ("model.", "module.", "network.")) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint's state dict as numpy arrays.

    Torch-free zip reader first (works without torch installed); falls back
    to ``torch.load`` for legacy serialization or pickles containing classes
    the restricted reader refuses."""
    try:
        ckpt = read_torch_checkpoint(path)
    except Exception as e:  # fallback is the contract: any reader failure
        # (bad zip, refused class, unexpected rebuild structure) defers to
        # torch.load; without torch installed the ORIGINAL error surfaces
        logger.info("torch-free reader failed (%s); falling back to torch.load", e)
        try:
            import torch
        except ImportError:
            raise e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt.get("model_state_dict", ckpt)) if isinstance(ckpt, dict) else ckpt
    out = {}
    for key, value in state.items():
        if hasattr(value, "numpy"):  # torch tensor (fallback path)
            value = value.detach().cpu().numpy()
        if not isinstance(value, np.ndarray):
            continue
        for pre in strip_prefixes:
            if key.startswith(pre):
                key = key[len(pre):]
        out[key] = value
    return out


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch conv3d (O, I, Z, Y, X) -> flax (Z, Y, X, I, O); conv2d/1d analogous."""
    if w.ndim == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 3:
        return np.transpose(w, (2, 1, 0))
    if w.ndim == 2:  # linear (O, I) -> (I, O)
        return w.T
    return w


def _flatten(tree, prefix=()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten(v, prefix + (k,)))
    else:
        out.append((prefix, np.asarray(tree)))
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        node = root
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = value
    return root


def load_external_weights(
    flax_params: Any,
    checkpoint_path: str,
    strip_prefixes: Tuple[str, ...] = ("model.", "module.", "network."),
    strict: bool = False,
    upkern: bool = False,
) -> Tuple[Any, Dict[str, int]]:
    """Fill ``flax_params`` with shape-matching tensors from a torch ckpt.

    Returns (new_params, stats). Matching: greedy in-order assignment within
    each shape bucket (torch param order vs flax traversal order — both are
    construction order, which lines up for same-topology networks).

    With ``upkern=True``, a conv kernel with no same-shape source falls back
    to a source kernel matching in (in, out) channels but smaller spatial
    extent, trilinearly inflated (UpKern, reference
    ``mednext_models.py:487``)."""
    state = load_torch_state_dict(checkpoint_path, strip_prefixes)
    flat = _flatten(flax_params)
    torch_items = [(k, torch_conv_to_flax(v)) for k, v in state.items()]

    by_shape: Dict[Tuple[int, ...], List[Tuple[str, np.ndarray]]] = {}
    by_io: Dict[Tuple[int, int], List[Tuple[str, np.ndarray]]] = {}
    for k, v in torch_items:
        by_shape.setdefault(tuple(v.shape), []).append((k, v))
        if v.ndim == 5:
            by_io.setdefault((v.shape[3], v.shape[4]), []).append((k, v))

    new_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    loaded = 0
    inflated = 0
    missed = 0
    for path, value in flat:
        bucket = by_shape.get(tuple(value.shape))
        if bucket:
            src_key, src_val = bucket.pop(0)
            new_flat[path] = src_val.astype(value.dtype)
            loaded += 1
            continue
        if upkern and value.ndim == 5:
            cands = by_io.get((value.shape[3], value.shape[4]), [])
            pick = next(
                (c for c in cands
                 if c[1].shape != tuple(value.shape)
                 and all(s <= t for s, t in zip(c[1].shape[:3], value.shape[:3]))),
                None,
            )
            if pick is not None:
                cands.remove(pick)
                new_flat[path] = upkern_resize_kernel(pick[1], value.shape[:3]).astype(value.dtype)
                inflated += 1
                continue
        new_flat[path] = value
        missed += 1
    stats = {
        "loaded": loaded,
        "missed": missed,
        "inflated": inflated,
        "unused": sum(len(b) for b in by_shape.values()),
    }
    if strict and missed:
        raise ValueError(f"strict load failed: {stats}")
    logger.info("external weights: %s", stats)
    return _unflatten(new_flat), stats


# -- UpKern: small-kernel -> large-kernel transfer ---------------------------


def upkern_resize_kernel(w: np.ndarray, spatial: Tuple[int, int, int]) -> np.ndarray:
    """Trilinearly interpolate a flax conv kernel ``(z, y, x, I, O)`` to a new
    spatial extent — the UpKern initialization (Roy et al., MICCAI 2023;
    reference ``mednext_models.py:487`` via nnunet_mednext's
    ``upkern_load_weights``, which uses ``F.interpolate(mode='trilinear')``)."""
    z, y, x, ci, co = w.shape
    if (z, y, x) == tuple(spatial):
        return np.asarray(w)
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(np.transpose(w, (3, 4, 0, 1, 2)))).float()
    t = t.reshape(1, ci * co, z, y, x)
    t = F.interpolate(t, size=tuple(int(s) for s in spatial), mode="trilinear")
    t = t.reshape(ci, co, *spatial)
    return np.transpose(t.numpy(), (2, 3, 4, 0, 1)).astype(w.dtype)


def upkern_transfer(target_params: Any, source_params: Any) -> Tuple[Any, Dict[str, int]]:
    """Copy a small-kernel model's params into a large-kernel one by path:
    same-shape leaves copy verbatim; 5-D conv kernels with matching channel
    dims are trilinearly inflated; anything else keeps the target init.

    flax->flax analog of the reference's ``upkern_load_weights``
    (``mednext_models.py:487``)."""
    tgt = dict(_flatten(target_params))
    src = dict(_flatten(source_params))
    new_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    copied = inflated = kept = 0
    for path, value in tgt.items():
        s = src.get(path)
        if s is None:
            new_flat[path] = value
            kept += 1
        elif s.shape == value.shape:
            new_flat[path] = s.astype(value.dtype)
            copied += 1
        elif (
            s.ndim == 5
            and value.ndim == 5
            and s.shape[3:] == value.shape[3:]
        ):
            new_flat[path] = upkern_resize_kernel(s, value.shape[:3]).astype(value.dtype)
            inflated += 1
        else:
            logger.warning("upkern: incompatible shapes at %s: %s vs %s",
                           "/".join(path), s.shape, value.shape)
            new_flat[path] = value
            kept += 1
    stats = {"copied": copied, "inflated": inflated, "kept": kept}
    logger.info("upkern transfer: %s", stats)
    return _unflatten(new_flat), stats


def upkern_initialize(model_cfg: Any, target_params: Any) -> Any:
    """Initialize a large-kernel MedNeXt from a trained small-kernel run
    (``model.mednext.upkern_from``). Torch sources go through the shape
    matcher with spatial inflation; native checkpoints (full TrainState
    trees) are restored targetless and path-transferred — the stored arrays
    already carry the small-kernel shapes, so no source model is built."""
    m = model_cfg.mednext
    path = str(m.upkern_from)
    if path.endswith((".pt", ".pth", ".ckpt", ".pytorch")):
        params, _ = load_external_weights(target_params, path, upkern=True)
        return params

    from pathlib import Path as _P

    import orbax.checkpoint as ocp

    p = _P(path)
    if (p / "state").exists():
        p = p / "state"
    restored = ocp.StandardCheckpointer().restore(p.resolve())
    src_params = restored["params"]
    if isinstance(src_params, dict) and "model" in src_params:
        src_params = src_params["model"]
    params, _ = upkern_transfer(target_params, src_params)
    return params
