"""Deterministic artifact naming: filenames encode checkpoint stem, TTA pass
count, decode tag, head and channel selection, so cache resume can find them
(reference ``connectomics/runtime/output_naming.py:476-709``)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional


def checkpoint_stem(checkpoint: Optional[str]) -> str:
    if not checkpoint:
        return "scratch"
    return Path(checkpoint).stem.replace("=", "-")


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


def decoded_filename(volume_name: str, tag: str, decode_tag: str = "decoded") -> str:
    return f"{volume_name}_{tag}_{decode_tag}.h5"


def tuned_params_filename(tag: str) -> str:
    return f"{tag}_best_params.yaml"


def cache_candidates(volume_name: str, tag: str) -> List[str]:
    """Possible cached prediction names, most specific first
    (reference ``resolve_prediction_cache_suffix``)."""
    return [
        prediction_filename(volume_name, tag),
        f"{volume_name}_{checkpoint_stem(None)}_prediction.h5",
        f"{volume_name}_prediction.h5",
    ]


def volume_name_from_path(path: str) -> str:
    stem = Path(str(path).split(":")[0]).stem
    for suffix in ("_im", "_image", "_img"):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    return stem
