"""Target-generation pipeline: config -> (seg -> stacked target channels).

Reference: ``MultiTaskLabelTransformd`` (``data/processing/transforms.py:753``)
and the per-target transform zoo; channels stack in configured order.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ...config.schema import LabelTransformConfig
from .affinity import seg_to_affinity
from .distance import (
    erode_instances,
    instance_boundary_mask,
    instance_edt,
    semantic_edt,
    signed_distance,
    skeleton_aware_edt,
)
from .lsd import seg_to_lsd
from .misc import (
    binary_ratio_weight,
    normalize_labels,
    relabel_connected_components,
    seg_to_binary,
    seg_to_flow,
    seg_to_polarity,
    seg_to_small_object,
    unet3d_weight,
)

TargetFn = Callable[[np.ndarray, Dict[str, Any]], np.ndarray]


def _chan(x: np.ndarray) -> np.ndarray:
    """Ensure channel-first 4-D output (C,Z,Y,X)."""
    return x[None] if x.ndim == 3 else x


_TARGETS: Dict[str, Callable[..., np.ndarray]] = {}


def register_target(name: str):
    def deco(fn):
        _TARGETS[name] = fn
        return fn
    return deco


@register_target("binary")
def _t_binary(seg, **kw):
    return _chan(seg_to_binary(seg, **kw))


@register_target("affinity")
def _t_affinity(seg, offsets=None, affinity_mode="deepem", **kw):
    if offsets is None:
        offsets = ["0-0-1", "0-1-0", "1-0-0"]
    return seg_to_affinity(seg, offsets, affinity_mode)


@register_target("instance_boundary")
def _t_boundary(seg, thickness=1, mode="3d", edge_mode=None, **kw):
    return _chan(
        instance_boundary_mask(seg, thickness, mode, edge_mode).astype(np.float32)
    )


@register_target("instance_edt")
def _t_iedt(seg, mode="3d", **kw):
    return _chan(instance_edt(seg, mode=mode, **kw))


@register_target("semantic_edt")
def _t_sedt(seg, mode="3d", **kw):
    return _chan(semantic_edt(seg, mode=mode, **kw))


@register_target("sdt")
def _t_sdt(seg, mode="3d", **kw):
    return _chan(signed_distance(seg, mode=mode, **kw))


@register_target("skeleton_aware_edt")
def _t_skel(seg, alpha=0.8, bg_value=-1.0, **kw):
    return _chan(skeleton_aware_edt(seg, alpha=alpha, bg_value=bg_value))


@register_target("lsd")
def _t_lsd(seg, sigma=(5.0, 5.0, 5.0), **kw):
    return seg_to_lsd(seg, sigma=sigma)


@register_target("polarity")
def _t_pol(seg, exclusive=False, **kw):
    out = seg_to_polarity(seg, exclusive=exclusive)
    return out[None].astype(np.float32) if exclusive else out


@register_target("small_object")
def _t_small(seg, size_threshold=1000, **kw):
    return _chan(seg_to_small_object(seg, size_threshold))


@register_target("flow")
def _t_flow(seg, **kw):
    return seg_to_flow(seg)


@register_target("binary_ratio_weight")
def _t_brw(seg, **kw):
    return _chan(binary_ratio_weight(seg))


@register_target("unet3d_weight")
def _t_u3w(seg, **kw):
    return _chan(unet3d_weight(seg, **kw))


def available_targets() -> List[str]:
    return sorted(_TARGETS)


def build_target_fn(cfg: Optional[LabelTransformConfig]) -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """Compile a LabelTransformConfig into ``seg (C,Z,Y,X) -> target (C',Z,Y,X)``.

    Returns None when no targets configured (label used as-is)."""
    if cfg is None or not cfg.targets:
        return None
    steps = []
    for t in cfg.targets:
        if t.name not in _TARGETS:
            raise KeyError(f"unknown target '{t.name}'; available: {available_targets()}")
        kw = dict(t.kwargs or {})
        extra = getattr(t, "extra", None) or {}
        kw.update({k: v for k, v in extra.items() if k not in ("name", "kwargs")})
        steps.append((_TARGETS[t.name], kw))

    def fn(seg: np.ndarray) -> np.ndarray:
        s = np.asarray(seg)
        if s.ndim == 4:
            s = s[0]
        if cfg.normalize_labels:
            s = normalize_labels(s)
        if cfg.relabel_cc:
            s = relabel_connected_components(s)
        if cfg.erosion:
            s = erode_instances(s, cfg.erosion)
        if getattr(cfg, "erosion_window", None) is not None:
            from .distance import seg_erosion_instance

            s = seg_erosion_instance(s, cfg.erosion_window)
        outs = [f(s, **kw) for f, kw in steps]
        return np.concatenate(outs, axis=0).astype(np.float32)

    return fn


def build_target_mask_fn(
    cfg: Optional[LabelTransformConfig],
) -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """``fn(raw_seg) -> (C, Z, Y, X) float32 per-channel validity mask``
    over the FULL stacked target layout, for datasets whose segmentation
    carries ``-1`` unlabeled voxels (reference ``seg_to_affinity`` mask
    semantics, ``data/processing/affinity.py:419-456``, and the
    ignore-aware per-task masks in ``transforms.py:736-743,1069``):

    - affinity spans: edge valid iff BOTH endpoints are labeled and inside
      the volume (:func:`affinity_unlabeled_mask`, mode-aware storage);
    - every other target channel: voxel valid iff ``seg != -1``.

    Returns None when no targets are configured. The mask multiplies into
    the batch ``mask`` tensor (pipeline), which the loss orchestrator
    already routes per-channel; emission is gated at the dataset level
    (``Pipeline(emit_target_mask=...)``) so fully-labeled datasets pay no
    extra host->device traffic."""
    spans = target_channel_spans(cfg)
    if not spans:
        return None
    from .affinity import affinity_unlabeled_mask

    def fn(seg: np.ndarray) -> np.ndarray:
        s = np.asarray(seg)
        if s.ndim == 4:
            s = s[0]
        labeled = (s != -1).astype(np.float32)
        cols = []
        for span in spans:
            width = span["end"] - span["start"]
            if span["name"] == "affinity":
                offsets = span["kwargs"].get("offsets") or ["0-0-1", "0-1-0", "1-0-0"]
                mode = span["kwargs"].get("affinity_mode", "deepem")
                cols.append(affinity_unlabeled_mask(s, offsets, mode))
            else:
                cols.append(np.broadcast_to(labeled[None], (width,) + s.shape))
        return np.ascontiguousarray(np.concatenate(cols, axis=0), dtype=np.float32)

    return fn


def target_channel_spans(
    cfg: Optional[LabelTransformConfig],
) -> List[Dict[str, Any]]:
    """[{name, start, end, kwargs}] channel layout of the stacked target
    tensor, probed by running each target on a tiny segmentation (channel
    counts are data-independent)."""
    if cfg is None or not cfg.targets:
        return []
    probe = np.zeros((6, 6, 6), np.uint32)
    probe[1:3, 1:3, 1:3] = 1
    probe[4:, 4:, 4:] = 2
    spans = []
    start = 0
    for t in cfg.targets:
        kw = dict(t.kwargs or {})
        extra = getattr(t, "extra", None) or {}
        kw.update({k: v for k, v in extra.items() if k not in ("name", "kwargs")})
        if t.name == "affinity":
            # one channel per offset; long offsets may exceed the probe
            c = len(kw.get("offsets") or ["0-0-1", "0-1-0", "1-0-0"])
        else:
            c = int(_TARGETS[t.name](probe, **kw).shape[0])
        spans.append({"name": t.name, "start": start, "end": start + c, "kwargs": kw})
        start += c
    return spans


def affinity_target_groups(
    cfg: Optional[LabelTransformConfig],
) -> List[Dict[str, Any]]:
    """[{start, end, offsets}] channel ranges of the target tensor holding
    affinity channels, with parsed (dz, dy, dx) offsets — the affinity-aware
    target-group map the loss orchestrator uses to auto-apply validity masks
    (reference ``training/losses/orchestrator.py:29-53,411``)."""
    from .affinity import parse_offsets

    groups = []
    for span in target_channel_spans(cfg):
        if span["name"] != "affinity":
            continue
        offsets = span["kwargs"].get("offsets") or ["0-0-1", "0-1-0", "1-0-0"]
        groups.append(
            {
                "start": span["start"],
                "end": span["end"],
                "offsets": parse_offsets(offsets),
                "mode": span["kwargs"].get("affinity_mode", "deepem"),
            }
        )
    return groups
