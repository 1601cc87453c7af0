"""Preflight coherence validation across config sections.

Reference: ``connectomics/runtime/preflight.py`` (deep-supervision arch
support :24, runtime coherence :34, train-mode warnings :317).
"""

from __future__ import annotations

import logging
from typing import List

from ..config.schema import Config

logger = logging.getLogger(__name__)

_DS_ARCHS = {"mednext", "rsunet"}


def preflight_check(cfg: Config, mode: str = "train") -> List[str]:
    """Raises on incoherent configs, returns warnings otherwise."""
    warnings: List[str] = []
    m = cfg.model
    if m.loss.deep_supervision and m.arch.type not in _DS_ARCHS:
        raise ValueError(
            f"deep supervision is only supported for {_DS_ARCHS}, got {m.arch.type}"
        )
    # multi-head coherence: per-head loss terms must reference declared heads
    heads = {h.name for h in (m.mednext.heads or [])}
    for term in m.loss.losses:
        if term.head and heads and term.head not in heads:
            raise ValueError(f"loss term references unknown head '{term.head}'; heads: {sorted(heads)}")
    # window vs patch coherence
    w = cfg.inference.window.window_size
    if w and list(w) != list(m.input_size):
        warnings.append(
            f"inference window {w} != model.input_size {m.input_size} "
            "(legal, but retracing happens per shape)"
        )
    # chunked: chunk must be >= window
    ch = cfg.inference.chunked
    if ch.enabled and ch.chunk_size and w:
        for c, ww in zip(ch.chunk_size, w):
            if c < ww:
                raise ValueError(f"chunk_size {ch.chunk_size} smaller than window {w}")
    if mode == "train":
        dl = cfg.data.dataloader
        if dl.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        if cfg.optimization.max_epochs < 1 and not cfg.optimization.max_steps:
            raise ValueError("need max_epochs or max_steps")
        targets = {t.name for t in (cfg.data.label_transform.targets or [])}
        if "affinity" in targets and m.out_channels < 3:
            warnings.append("affinity targets with <3 out_channels")
    if mode in ("tune", "tune-test") and not cfg.decoding.tuning.params:
        warnings.append("tune mode without decoding.tuning.params does nothing")
    for msg in warnings:
        logger.warning("preflight: %s", msg)
    return warnings
