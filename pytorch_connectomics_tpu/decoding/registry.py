"""Decoder registry + linear steps pipeline + DAG graph evaluator.

Reference: ``connectomics/decoding/registry.py:41-176`` (name->fn registry),
``decoding/pipeline.py:106-176`` (steps), ``decoding/graph.py`` (DAG).
Decoders take ``(prediction (C,Z,Y,X) float32, **kwargs) -> labels (Z,Y,X)``
or intermediate arrays; binary graph ops combine two inputs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

_DECODERS: Dict[str, Callable] = {}
_GRAPH_OPS: Dict[str, Callable] = {}


def register_decoder(name: str):
    def deco(fn):
        _DECODERS[name] = fn
        return fn

    return deco


def register_graph_op(name: str):
    def deco(fn):
        _GRAPH_OPS[name] = fn
        return fn

    return deco


def get_decoder(name: str) -> Callable:
    if name not in _DECODERS:
        raise KeyError(f"unknown decoder '{name}'; available: {sorted(_DECODERS)}")
    return _DECODERS[name]


def list_decoders() -> List[str]:
    return sorted(_DECODERS)


def run_steps(prediction: np.ndarray, steps: List[Any]) -> np.ndarray:
    """Linear pipeline: each step's output feeds the next
    (reference ``pipeline.py:106-176``)."""
    out = prediction
    for step in steps:
        name = step.name if hasattr(step, "name") else step["name"]
        kwargs = dict(getattr(step, "kwargs", None) or step.get("kwargs", {}) or {})
        extra = getattr(step, "extra", None) or {}
        kwargs.update({k: v for k, v in extra.items() if k not in ("name", "kwargs")})
        out = get_decoder(name)(out, **kwargs)
    return out


def run_graph(inputs: Dict[str, np.ndarray], graph: Dict[str, Any]) -> np.ndarray:
    """DAG evaluator: nodes {name: {op, inputs: [...], kwargs}} with one
    ``output`` node name (reference ``decoding/graph.py``)."""
    nodes = graph["nodes"]
    output = graph.get("output") or list(nodes)[-1]
    cache: Dict[str, np.ndarray] = dict(inputs)

    def evaluate(name: str) -> np.ndarray:
        if name in cache:
            return cache[name]
        spec = nodes[name]
        op = spec.get("op") or spec.get("name")
        args = [evaluate(i) for i in spec.get("inputs", [])]
        kwargs = spec.get("kwargs", {}) or {}
        fn = _DECODERS.get(op) or _GRAPH_OPS.get(op)
        if fn is None:
            raise KeyError(f"unknown graph op '{op}'")
        cache[name] = fn(*args, **kwargs)
        return cache[name]

    return evaluate(output)


# basic binary graph ops
@register_graph_op("multiply")
def _op_mul(a, b, **kw):
    return a * b


@register_graph_op("add")
def _op_add(a, b, **kw):
    return a + b


@register_graph_op("threshold")
def _op_threshold(a, threshold=0.5, **kw):
    return (a > threshold).astype(np.float32)


@register_graph_op("select_channels")
def _op_select(a, channels="0:1", **kw):
    from ..utils.slicing import parse_slice

    return a[parse_slice(str(channels))]


@register_graph_op("mask_apply")
def _op_mask(a, mask, **kw):
    return a * (mask > 0)


@register_graph_op("decode_quantize")
def _op_decode_quantize(a, mode="max", levels=0, **kw):
    """Quantized-energy class scores -> continuous energy map (reference
    ``processing/quantize.py:28`` via the transform registry)."""
    from ..data.targets.misc import decode_quantize

    return decode_quantize(a, mode=mode, levels=levels)


@register_graph_op("combine_split")
def _op_combine_split(a, b, output_dtype="uint32", **kw):
    """Background-preserving coarsest common refinement of two labelings
    (reference ``decoders/combine.py:27``): output is nonzero only where BOTH
    inputs are nonzero, and every distinct (a, b) label pair becomes one
    contiguous output id — the finest segmentation both inputs agree on."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        raise ValueError(f"combine_split shapes differ: {a.shape} vs {b.shape}")
    dtype = np.dtype(output_dtype)
    if not np.issubdtype(dtype, np.integer):
        raise TypeError(f"combine_split output_dtype must be integer, got {dtype}")
    out = np.zeros(a.shape, dtype)
    fg = (a != 0) & (b != 0)
    if not bool(fg.any()):
        return out
    a_fg = a[fg].astype(np.uint64, copy=False)
    b_fg = b[fg].astype(np.uint64, copy=False)
    base = np.uint64(int(b_fg.max()) + 1)
    if int(a_fg.max()) * int(base) + int(b_fg.max()) >= 2**64 - 1:
        raise OverflowError("combine_split pair key space exceeds uint64")
    _, inv = np.unique(a_fg * base + b_fg, return_inverse=True)
    n_labels = int(inv.max()) + 1
    if n_labels > np.iinfo(dtype).max:
        raise OverflowError(f"combine_split produced {n_labels} labels > {dtype} max")
    out[fg] = inv.astype(dtype) + 1
    return out
