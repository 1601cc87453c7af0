"""Prediction output transforms + artifact metadata.

Reference: ``apply_prediction_transform`` (``inference/output.py``) and H5
attrs provenance (``inference/artifact.py:16-206``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..config.schema import InferenceOutputConfig
from ..data.io import read_h5_attrs, save_volume


def apply_prediction_transform(
    pred: np.ndarray, out_cfg: InferenceOutputConfig
) -> np.ndarray:
    """Intensity scale + dtype cast (e.g. scale 255 -> uint8)."""
    out = pred
    if out_cfg.scale:
        out = out * float(out_cfg.scale)
    if out_cfg.dtype:
        dt = np.dtype(out_cfg.dtype)
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.rint(out), info.min, info.max)
        out = out.astype(dt)
    return out


def save_prediction(
    path: str | Path,
    pred: np.ndarray,
    config_hash: str = "",
    checkpoint: str = "",
    head: str = "",
    extra_attrs: Optional[Dict[str, Any]] = None,
) -> None:
    """Write prediction with provenance attrs for cache validation
    (reference ``artifact.py:74-141``)."""
    attrs = {
        "config_hash": config_hash,
        # Predictions from randomly-initialized weights (no checkpoint) are
        # stamped with an explicit sentinel so they can never masquerade as
        # legacy pre-provenance caches and be reused after training.
        "checkpoint": str(checkpoint) or "random-init",
        "head": head,
        "framework": "pytorch_connectomics_tpu",
    }
    attrs.update(extra_attrs or {})
    save_volume(str(path), pred, attrs=attrs)


def validate_prediction_cache(
    path: str | Path,
    config_hash: Optional[str] = None,
    checkpoint: Optional[str] = None,
) -> bool:
    """Check a cached prediction exists and (optionally) matches the config
    hash and checkpoint provenance (reference ``cache_resolver.py:22-116``).

    The checkpoint check matters: the config hash does NOT cover
    ``--checkpoint`` (a CLI arg), so without it a prediction produced from
    different weights — e.g. the pre-auto-resolve random-init footgun —
    would be silently reused on re-run.

    Semantics of the recorded ``checkpoint`` attr:

    - key absent: pre-provenance cache, accepted (legacy).
    - ``"random-init"`` (or the pre-sentinel ``""`` spelling): prediction
      came from untrained weights — valid ONLY when the current run also has
      no checkpoint. This closes the residual hole where a cache written
      before training validated against any later checkpoint.
    - ``"__incomplete__"``: a chunked run crashed mid-write — NEVER valid
      (not even for decode-only ``checkpoint=None`` callers); the re-run
      resumes through the chunk manifest and restamps real attrs.
    - anything else: must equal the current checkpoint exactly.

    ``checkpoint=None`` skips the check (caller has no weight context, e.g.
    decode-only reuse); ``checkpoint=""`` means "this run uses random init".
    """
    p = Path(str(path).split(":")[0])
    if not p.exists():
        return False
    try:
        attrs = read_h5_attrs(str(path))
    except Exception:
        return p.exists()  # non-h5 cache: existence is enough
    if str(attrs.get("checkpoint", "")) == "__incomplete__":
        return False  # chunked artifact from a crashed mid-write run
    if config_hash and attrs.get("config_hash") not in ("", None, config_hash):
        return False
    if checkpoint is not None and "checkpoint" in attrs:
        recorded = str(attrs["checkpoint"])
        expected = str(checkpoint) or "random-init"
        if recorded == "":  # pre-sentinel spelling of random-init
            recorded = "random-init"
        if recorded != expected:
            return False
    return True
