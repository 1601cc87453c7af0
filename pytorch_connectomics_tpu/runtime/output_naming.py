"""Deterministic artifact naming: filenames encode checkpoint stem, TTA pass
count, head/channel selection, and the decode recipe (step names + kwargs),
so cache resolution can find exactly-matching artifacts and distinguish
decode variants (reference ``connectomics/runtime/output_naming.py:229-709``:
decode-step encoding :229, graph tags :342, final tags :476, cache-suffix
candidates :573-608)."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, List, Optional

# kwargs that never belong in a filename (paths, runtime context)
_IGNORED_DECODE_TAG_KEYS = {
    "candidate_output_path",
    "decision_output_path",
    "guide_affinity_path",
    "guide_prediction_path",
    "guide_seg_path",
    "primary_affinity_path",
    "receive_context",
    "report_dir",
    "tag",
}


def _sanitize(text: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9._=]+", "-", text)
    return re.sub(r"-{2,}", "-", safe).strip("-")


def checkpoint_stem(checkpoint: Optional[str]) -> str:
    if not checkpoint:
        return "scratch"
    return _sanitize(Path(checkpoint).stem.replace("=", "-")) or "scratch"


def _flatten_decode_values(value: Any) -> List[str]:
    """Deterministic value tokens for a decode step's kwargs
    (reference ``_format_one_decode_step``, output_naming.py:229)."""
    if hasattr(value, "items"):
        out: List[str] = []
        for key, nested in sorted(dict(value).items()):
            if key in _IGNORED_DECODE_TAG_KEYS:
                continue
            out.extend(_flatten_decode_values(nested))
        return out
    if isinstance(value, (list, tuple)):
        out = []
        for nested in value:
            out.extend(_flatten_decode_values(nested))
        return out
    if isinstance(value, bool):
        return ["true" if value else "false"]
    if value is None:
        return ["none"]
    if isinstance(value, float):
        return [format(value, "g")]
    return [str(value)]


def format_decode_step_tag(step: Any) -> str:
    """``{short_name}_{kwargs_tokens}`` for one decode step; an explicit
    ``tag`` kwarg overrides everything."""
    name = getattr(step, "name", None) or (step.get("name") if isinstance(step, dict) else None)
    if not name:
        return ""
    short = str(name).replace("decode_", "")
    kwargs = getattr(step, "kwargs", None)
    if kwargs is None and isinstance(step, dict):
        kwargs = step.get("kwargs", {})
    if kwargs and hasattr(kwargs, "items"):
        explicit = dict(kwargs).get("tag")
        if explicit:
            return _sanitize(str(explicit))
    tokens = _flatten_decode_values(kwargs) if kwargs else []
    if not tokens:
        return short
    kw_tag = _sanitize("-".join(tokens))
    return f"{short}_{kw_tag}" if kw_tag else short


def format_decode_graph_tag(graph: Dict[str, Any]) -> str:
    """Compact tag for a decode DAG (reference ``_format_decode_graph_tag``,
    output_naming.py:342)."""
    nodes = graph.get("nodes", {})
    parts = []
    for node_name in sorted(nodes):
        spec = nodes[node_name]
        op = format_decode_step_tag(
            {"name": spec.get("op", spec.get("name", "")), "kwargs": spec.get("kwargs", {})}
        )
        inputs = "+".join(_sanitize(str(i)) for i in spec.get("inputs", []))
        parts.append(f"{_sanitize(node_name)}-{op}-from-{inputs}")
    output = _sanitize(str(graph.get("output", "")))
    return "graph-" + "__".join(parts) + f"__out-{output}"


def format_decode_tag(decoding_cfg: Any) -> str:
    """Decode recipe tag for decoded filenames: graph tag or step chain.
    Accepts a DecodingConfig dataclass or plain dict; '' when no decoding."""
    if decoding_cfg is None:
        return ""
    graph = getattr(decoding_cfg, "graph", None)
    if graph is None and isinstance(decoding_cfg, dict):
        graph = decoding_cfg.get("graph")
    if graph:
        return format_decode_graph_tag(graph)
    steps = getattr(decoding_cfg, "steps", None)
    if steps is None and isinstance(decoding_cfg, dict):
        steps = decoding_cfg.get("steps")
    if not steps:
        return ""
    parts = [t for t in (format_decode_step_tag(s) for s in steps) if t]
    return "__".join(parts)


def format_save_suffix(decoding_cfg: Any) -> str:
    """User-controlled decoded-output suffix (``decoding.save_suffix``,
    reference ``format_decoding_output_suffix_tag``, output_naming.py:382)."""
    suffix = getattr(decoding_cfg, "save_suffix", None)
    if suffix is None and isinstance(decoding_cfg, dict):
        suffix = decoding_cfg.get("save_suffix")
    if not suffix:
        return ""
    return _sanitize(str(suffix).strip())


def prediction_tag(
    checkpoint: Optional[str] = None,
    tta_passes: int = 1,
    head: Optional[str] = None,
    channels: Optional[List[int]] = None,
) -> str:
    parts = [checkpoint_stem(checkpoint)]
    if tta_passes > 1:
        parts.append(f"tta_x{tta_passes}")
    if head:
        parts.append(f"head_{head}")
    if channels:
        parts.append("ch" + "-".join(map(str, channels)))
    return "_".join(parts)


def prediction_filename(volume_name: str, tag: str) -> str:
    return f"{volume_name}_{tag}_prediction.h5"


def decoded_filename(
    volume_name: str,
    tag: str,
    decode_tag: str = "decoded",
    decoding_cfg: Any = None,
) -> str:
    """Decoded-output filename; when ``decoding_cfg`` is given the decode
    recipe (or its ``save_suffix``) is encoded so different decode params
    produce distinct artifacts."""
    if decoding_cfg is not None:
        suffix = format_save_suffix(decoding_cfg) or format_decode_tag(decoding_cfg)
        if suffix:
            decode_tag = f"decoded_{suffix}"
    return f"{volume_name}_{tag}_{decode_tag}.h5"


def intermediate_decode_filename(volume_name: str, tag: str, step: Any) -> str:
    """Per-step intermediate artifact name
    (reference ``intermediate_decode_step_output_tag``, output_naming.py:503)."""
    return f"{volume_name}_{tag}_decoding_{format_decode_step_tag(step)}.h5"


def head_filenames(volume_name: str, tag: str, heads: List[str]) -> Dict[str, str]:
    """All-heads prediction artifact names (multi-head models)."""
    return {
        h: prediction_filename(volume_name, f"{tag}_head_{h}") for h in heads
    }


def tuned_params_filename(tag: str) -> str:
    return f"{tag}_best_params.yaml"


def tuned_params_candidates(tag: str, checkpoint: Optional[str] = None) -> List[str]:
    """Best-params YAML candidates, most specific first (reference
    ``tuning_best_params_filename_candidates``, output_naming.py:642)."""
    cands = [tuned_params_filename(tag)]
    if checkpoint:
        cands.append(tuned_params_filename(checkpoint_stem(checkpoint)))
    cands.append("best_params.yaml")
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def cache_candidates(
    volume_name: str,
    tag: str,
    checkpoint: Optional[str] = None,
    tta_passes: int = 1,
    head: Optional[str] = None,
    channels: Optional[List[int]] = None,
) -> List[str]:
    """Possible cached raw-prediction names, most specific first (reference
    ``raw_cache_suffix_candidates`` /
    ``intermediate_prediction_cache_suffix_candidates``,
    output_naming.py:573-608): the full tag, then progressively less
    decorated variants (no channels, no head, no TTA), the bare checkpoint
    stem, and legacy un-tagged names."""
    cands = [prediction_filename(volume_name, tag)]
    # progressively drop decorations
    for drop_ch in (False, True):
        for drop_head in (False, True):
            for drop_tta in (False, True):
                t = prediction_tag(
                    checkpoint,
                    1 if drop_tta else tta_passes,
                    None if drop_head else head,
                    None if drop_ch else channels,
                )
                cands.append(prediction_filename(volume_name, t))
    cands.append(prediction_filename(volume_name, checkpoint_stem(checkpoint)))
    cands.append(prediction_filename(volume_name, "scratch"))
    cands.append(f"{volume_name}_prediction.h5")
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def volume_name_from_path(path: str) -> str:
    stem = Path(str(path).split(":")[0]).stem
    for suffix in ("_im", "_image", "_img"):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    return stem
