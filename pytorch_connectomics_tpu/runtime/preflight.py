"""Preflight coherence validation across config sections.

Reference: ``connectomics/runtime/preflight.py`` (deep-supervision arch
support :24, runtime coherence :34, train-mode warnings :317).
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np

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
    # patchify stem: each spatial axis must divide by stem_stride * 2^4
    # (4 encoder downs) or decoder skip adds fail with a shape error
    if m.arch.type == "mednext" and getattr(m.mednext, "patchify_stem", False):
        stride = list(getattr(m.mednext, "patchify_stride", None) or (2, 2, 2))
        for size in filter(None, [m.input_size, w]):
            for s, n in zip(stride, size):
                if n % (s * 16):
                    raise ValueError(
                        f"patchify stem with stride {stride}: size {list(size)} "
                        f"axis {n} must be divisible by {s * 16} "
                        "(stem stride x 16 for the 4 encoder downsamples)"
                    )
    # mutex watershed over short-range-only affinities silently degrades to
    # garbage (no repulsive edges — measured VOI 7.37 vs 0.45 with long-range,
    # QUALITY.md): warn when no configured offset has a |component| > 1
    warnings += _mutex_offset_issues(cfg)
    if mode == "train":
        dl = cfg.data.dataloader
        if dl.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        if cfg.optimization.max_epochs < 1 and not cfg.optimization.max_steps:
            raise ValueError("need max_epochs or max_steps")
        targets = {t.name for t in (cfg.data.label_transform.targets or [])}
        if "affinity" in targets and m.out_channels < 3:
            warnings.append("affinity targets with <3 out_channels")
        warnings += _train_path_issues(cfg)
        # patch-size sanity (reference preflight.py:380-388)
        ps = dl.patch_size or []
        if ps and min(ps) < 16 and min(ps) != 1:  # 1 = 2-D workloads
            warnings.append(f"very small patch size {ps} (little spatial context)")
        if ps and max(ps) > 256:
            warnings.append(f"very large patch size {ps} (HBM pressure; watch for OOM)")
        # learning-rate sanity (reference preflight.py:390-397)
        lr = cfg.optimization.optimizer.lr
        if lr is not None and lr > 1e-2:
            warnings.append(f"learning rate {lr} is very high (instability risk)")
        if lr is not None and 0 < lr < 1e-6:
            warnings.append(f"learning rate {lr} is very low (training will crawl)")
        # rough activation-memory estimate vs device HBM
        try:
            import jax

            dev = jax.devices()[0]
            stats = dev.memory_stats() or {}
            hbm_gb = stats.get("bytes_limit", 0) / 1e9
            if hbm_gb:
                est_gb = (
                    dl.batch_size
                    * float(np.prod(ps or m.input_size))
                    * m.in_channels * 4 * 10 / 1e9
                )
                if est_gb > 0.8 * hbm_gb:
                    warnings.append(
                        f"estimated activation memory ~{est_gb:.1f} GB may exceed "
                        f"{hbm_gb:.0f} GB HBM; reduce batch/patch or enable remat"
                    )
        except Exception:
            pass
    if mode in ("tune", "tune-test") and not cfg.decoding.tuning.params:
        warnings.append("tune mode without decoding.tuning.params does nothing")
    for msg in warnings:
        logger.warning("preflight: %s", msg)
    return warnings


def _mutex_offset_issues(cfg: Config) -> List[str]:
    """Warn on ``mutex_watershed`` decode steps whose affinity offsets are all
    short-range: without |offset| > 1 repulsive edges the algorithm reduces to
    plain agglomeration and over-merges badly (QUALITY.md: VOI 7.37 vs 0.45)."""
    steps = cfg.decoding.steps or []
    mutex_steps = [s for s in steps if (s.name or "") == "mutex_watershed"]
    if not mutex_steps:
        return []
    from ..data.targets.affinity import parse_offsets

    def _long_range(offs) -> bool:
        try:
            parsed = parse_offsets(offs)
        except (ValueError, TypeError):
            return True  # malformed → let the decoder raise its own error
        return any(max(abs(c) for c in o) > 1 for o in parsed)

    issues: List[str] = []
    # offsets can come from the step kwargs or default to the affinity target's
    for s in mutex_steps:
        offs = (s.kwargs or {}).get("offsets")
        if offs is None:
            for t in cfg.data.label_transform.targets or []:
                if t.name == "affinity":
                    offs = (t.kwargs or {}).get("offsets")
        if offs is not None and not _long_range(offs):
            issues.append(
                "mutex_watershed configured over short-range-only affinity "
                f"offsets {list(offs)}: no repulsive (long-range) edges — "
                "expect severe over-merging; add offsets with |component| > 1 "
                "(e.g. [0,0,-9], [0,-9,0], [-4,0,0])"
            )
    return issues


def _train_path_issues(cfg: Config) -> List[str]:
    """Missing/unmatched training data paths (reference preflight.py:331)."""
    from glob import glob
    from pathlib import Path

    issues: List[str] = []
    for kind in ("image", "label"):
        value = getattr(cfg.data.train, kind)
        paths = value if isinstance(value, list) else ([value] if value else [])
        for raw in paths:
            raw = str(raw)
            if raw.startswith(("random://", "synthetic://")):
                continue
            raw = raw.split(":")[0]
            if "*" in raw or "?" in raw:
                if not glob(raw):
                    issues.append(f"train {kind} pattern matched no files: {raw}")
            elif not Path(raw).exists():
                issues.append(f"train {kind} not found: {raw}")
    return issues
