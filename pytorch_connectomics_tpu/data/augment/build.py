"""Config -> augmentation pipeline (reference ``data/augmentation/build.py:185``).

Order mirrors the reference: geometric -> EM artifacts -> intensity -> mixing.
Each configured transform block is a dict with ``enabled`` + kwargs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ...config.schema import AugmentationConfig
from . import ops

Sample = Dict[str, np.ndarray]

# (config_key, fn, needs_other_sample)
_ORDER: List[Tuple[str, Callable, bool]] = [
    ("flip", ops.rand_flip, False),
    ("axis_permute", ops.rand_axis_permute, False),
    ("transpose", ops.rand_transpose, False),
    ("rotate", ops.rand_rotate90, False),
    ("affine", ops.rand_affine, False),
    ("elastic", ops.rand_elastic, False),
    ("misalignment", ops.rand_misalignment, False),
    ("missing_section", ops.rand_missing_section, False),
    ("lost_section", ops.rand_lost_section, False),
    ("slice_drop", ops.rand_slice_drop, False),
    ("slice_shift", ops.rand_slice_shift, False),
    ("missing_parts", ops.rand_missing_parts, False),
    ("motion_blur", ops.rand_motion_blur, False),
    ("cut_blur", ops.rand_cut_blur, False),
    ("cut_noise", ops.rand_cut_noise, False),
    ("stripe", ops.rand_stripe, False),
    ("intensity", ops.rand_intensity, False),
    ("mul_add", ops.rand_mul_add, False),
    ("gamma", ops.rand_gamma, False),
    ("mixup", ops.rand_mixup, True),
    ("copy_paste", ops.rand_copy_paste, True),
]


def build_augmentation_fn(
    cfg: Optional[AugmentationConfig],
    sample_other: Optional[Callable[[np.random.Generator], Sample]] = None,
):
    """Returns ``augment(sample, rng) -> sample`` or None when disabled.

    ``sample_other`` supplies a second sample for mixup/copy-paste."""
    if cfg is None or not cfg.enabled:
        return None
    steps = []
    for key, fn, needs_other in _ORDER:
        block = getattr(cfg, key, None)
        if block is None:
            extra = getattr(cfg, "extra", None) or {}
            block = extra.get(key)
        if not block or not block.get("enabled", True):
            continue
        kwargs = {k: v for k, v in block.items() if k != "enabled"}
        if "down_ratio" in kwargs and isinstance(kwargs["down_ratio"], list):
            kwargs["down_ratio"] = tuple(kwargs["down_ratio"])
        if "contrast_range" in kwargs and isinstance(kwargs["contrast_range"], list):
            kwargs["contrast_range"] = tuple(kwargs["contrast_range"])
        if "gamma_range" in kwargs and isinstance(kwargs["gamma_range"], list):
            kwargs["gamma_range"] = tuple(kwargs["gamma_range"])
        if "spatial_axes" in kwargs and isinstance(kwargs["spatial_axes"], list):
            kwargs["spatial_axes"] = tuple(kwargs["spatial_axes"])
        steps.append((fn, kwargs, needs_other))
    if not steps:
        return None

    def augment(sample: Sample, rng: np.random.Generator) -> Sample:
        for fn, kwargs, needs_other in steps:
            if needs_other:
                other = sample_other(rng) if sample_other else None
                sample = fn(sample, rng, other=other, **kwargs)
            else:
                sample = fn(sample, rng, **kwargs)
        return sample

    return augment
