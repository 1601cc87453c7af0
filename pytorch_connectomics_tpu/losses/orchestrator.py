"""Loss orchestrator: compiles the unified ``model.loss.losses`` list into a
jit-safe callable with channel routing, spatial weights, masks, deep
supervision, and multi-task balancing.

Reference: ``connectomics/training/losses/orchestrator.py:54`` (channel
routing :302-473, auto pos_weight :129-198, deep supervision :764-843) and
``losses/plan.py:59-280`` slice selectors.

All slicing is static (resolved at trace time from config strings), so the
whole loss stack fuses into the backward pass under jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.schema import LossConfig, LossTermConfig
from ..utils.slicing import parse_slice, slice_channels
from .zoo import auto_pos_weight, get_loss

_PAIR_LOSSES = {"ContourDTConsistency"}  # losses taking (pred, pred2)


@dataclass
class CompiledTerm:
    name: str
    fn: Callable
    weight: float
    pred_slice: Optional[str]
    target_slice: Optional[str]
    pred2_slice: Optional[str]
    mask_slice: Optional[str]
    head: Optional[str]
    auto_pos: bool
    use_valid_mask: bool
    kwargs: Dict[str, Any]
    # how the batch's spatial-weight tensor reaches this term (reference
    # spatial_weight_arg, losses/plan.py:37): "weight" (default), "mask"
    # (folded into the loss mask), or "none" (term ignores it)
    spatial_weight: Optional[str] = None


def _offset_valid_mask(
    spatial: Tuple[int, int, int], offset, mode: str = "deepem"
) -> jnp.ndarray:
    """(Z, Y, X) validity of one affinity offset: positions whose offset
    neighbor exists, at that mode's storage voxel (``deepem`` stores the edge
    at the destination/high-end voxel, ``banis`` at the source voxel —
    matches ``data/targets/affinity.py::_storage_slices``). Built from iotas
    so it stays a cheap fused on-device op, not a giant HLO constant."""
    m = jnp.ones(spatial, jnp.float32)
    for d, o in enumerate(offset):
        idx = jax.lax.broadcasted_iota(jnp.int32, spatial, d)
        if mode == "banis":
            # storage = src slice: o>0 -> [0, n-o), o<0 -> [-o, n)
            if o > 0:
                m = m * (idx < spatial[d] - o)
            elif o < 0:
                m = m * (idx >= -o)
        else:
            # storage = dst slice: o>0 -> [o, n), o<0 -> [0, n+o)
            if o > 0:
                m = m * (idx >= o)
            elif o < 0:
                m = m * (idx < spatial[d] + o)
    return m


class LossOrchestrator:
    """Builds once from config; ``__call__(outputs, targets, mask, weight)``
    returns ``(total, per_term_dict)`` — fully traceable.

    ``affinity_groups`` ([{start, end, offsets}], from
    ``data.targets.build.affinity_target_groups``) makes the orchestrator
    affinity-aware: any term whose target channels overlap an affinity group
    automatically gets the per-offset validity mask (positions whose offset
    neighbor exists) multiplied into its loss mask — the reference's
    affinity-aware target groups (``orchestrator.py:29-53,411``)."""

    def __init__(self, loss_cfg: LossConfig, affinity_groups=None):
        self.cfg = loss_cfg
        self.affinity_groups = list(affinity_groups or [])
        self.terms: List[CompiledTerm] = []
        for i, t in enumerate(loss_cfg.losses):
            kwargs = dict(t.kwargs or {})
            extra = getattr(t, "extra", None) or {}
            kwargs.update({k: v for k, v in extra.items()})
            sw = getattr(t, "spatial_weight", None)
            if sw not in (None, "weight", "mask", "none"):
                raise ValueError(
                    f"loss term {t.function}: spatial_weight must be "
                    f"weight|mask|none, got {sw!r}"
                )
            auto_pos = t.pos_weight == "auto"
            if t.pos_weight is not None and not auto_pos:
                kwargs["pos_weight"] = float(t.pos_weight)
            self.terms.append(
                CompiledTerm(
                    name=f"{t.function}_{i}",
                    fn=get_loss(t.function),
                    weight=float(t.weight),
                    pred_slice=t.pred_slice,
                    target_slice=t.target_slice,
                    pred2_slice=t.pred2_slice,
                    mask_slice=t.mask_slice,
                    head=t.head,
                    auto_pos=auto_pos,
                    use_valid_mask=t.use_valid_mask,
                    kwargs=kwargs,
                    spatial_weight=getattr(t, "spatial_weight", None),
                )
            )
        self.ds_weights = loss_cfg.ds_weights
        self.ds_clamp = loss_cfg.ds_clamp

    # -- single-scale ------------------------------------------------------

    def _affinity_valid_mask(self, term: CompiledTerm, target) -> Optional[jnp.ndarray]:
        """(1, Z, Y, X, Csel) validity mask when the term's target channels
        overlap an affinity group; None otherwise. Static per jit trace."""
        if not self.affinity_groups:
            return None
        total = target.shape[-1]
        sel = list(range(*parse_slice(term.target_slice).indices(total)))
        per_channel = [None] * len(sel)
        hit = False
        for g in self.affinity_groups:
            mode = g.get("mode", "deepem")
            for i, c in enumerate(sel):
                if g["start"] <= c < g["end"]:
                    per_channel[i] = (g["offsets"][c - g["start"]], mode)
                    hit = True
        if not hit:
            return None
        spatial = tuple(target.shape[1:4])
        cols = [
            _offset_valid_mask(spatial, om[0], om[1])
            if om is not None
            else jnp.ones(spatial, jnp.float32)
            for om in per_channel
        ]
        return jnp.stack(cols, axis=-1)[None]

    def _term_loss(self, term: CompiledTerm, pred, target, mask=None, weight=None):
        p = slice_channels(pred, term.pred_slice)
        t = slice_channels(target, term.target_slice)
        m = None
        if mask is not None:
            m = mask if mask.shape[-1] == 1 else slice_channels(mask, term.pred_slice)
        if term.mask_slice is not None:
            m2 = slice_channels(target, term.mask_slice)
            m = m2 if m is None else m * m2
        mv = self._affinity_valid_mask(term, target)
        if mv is not None:
            m = mv if m is None else m * mv
        w = None
        if weight is not None and term.spatial_weight != "none":
            w = weight if weight.shape[-1] == 1 else slice_channels(weight, term.pred_slice)
            if term.spatial_weight == "mask":
                # reference spatial_weight_arg="mask" (orchestrator.py:199):
                # the weight map gates the loss region instead of scaling it
                m = w if m is None else m * w
                w = None
        kwargs = dict(term.kwargs)
        if term.auto_pos:
            kwargs["pos_weight"] = auto_pos_weight(t, m)
        if term.fn.__name__ == "contour_consistency" or term.pred2_slice is not None:
            # pred-vs-pred losses: contour_consistency with no pred2_slice
            # compares against the full prediction tensor
            p2 = slice_channels(pred, term.pred2_slice)
            return term.fn(p, p2, weight=w, mask=m, **kwargs)
        return term.fn(p, t, weight=w, mask=m, **kwargs)

    def compute(
        self,
        outputs: Any,
        targets: Any,
        mask: Optional[jnp.ndarray] = None,
        weight: Optional[jnp.ndarray] = None,
        balancer_params: Optional[jnp.ndarray] = None,
        term_weights: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """``outputs``: array or dict (multi-head and/or ds_*);
        ``targets``: array or dict keyed by head name.

        ``term_weights``: externally-managed per-term multipliers (GradNorm,
        reference ``losses/balancing.py:90``) — overrides uncertainty."""
        logs: Dict[str, jnp.ndarray] = {}
        main_out, ds_outs = self._split_outputs(outputs)
        term_losses = []
        for term in self.terms:
            pred = main_out[term.head] if (isinstance(main_out, dict)) else main_out
            tgt = targets[term.head] if (isinstance(targets, dict) and term.head in targets) else (
                targets["label"] if isinstance(targets, dict) else targets
            )
            value = self._term_loss(term, pred, tgt, mask, weight)
            # No nan_to_num here: a non-finite term must propagate so the
            # Trainer's per-term finite check can name it and raise (the
            # reference raises per-term, orchestrator.py:216). Masking it
            # would train on a silently-zeroed loss.
            logs[f"loss_{term.name}"] = value
            term_losses.append(value)

        if term_weights is not None and len(term_losses) > 1:
            total = sum(
                term_weights[i] * term.weight * L
                for i, (term, L) in enumerate(zip(self.terms, term_losses))
            )
        elif balancer_params is not None and len(term_losses) > 1:
            # Kendall uncertainty weighting: sum exp(-s_i) L_i + s_i
            s = balancer_params[: len(term_losses)]
            total = sum(
                jnp.exp(-s[i]) * term.weight * L + 0.5 * s[i]
                for i, (term, L) in enumerate(zip(self.terms, term_losses))
            )
        else:
            total = sum(term.weight * L for term, L in zip(self.terms, term_losses))

        if ds_outs:
            ds_total = self._deep_supervision_loss(ds_outs, targets, mask, weight, logs)
            total = total + ds_total
        logs["loss_total"] = total
        return total, logs

    __call__ = compute

    # -- deep supervision --------------------------------------------------

    def _split_outputs(self, outputs):
        if not isinstance(outputs, dict):
            return outputs, {}
        ds = {k: v for k, v in outputs.items() if k.startswith("ds_")}
        main = {k: v for k, v in outputs.items() if not k.startswith("ds_")}
        if set(main) == {"out"}:
            return main["out"], ds
        return main, ds

    def _downsample_target(self, target, spatial):
        """Average-pool targets to a DS scale (trace-safe, shapes static)."""
        factors = [t // s for t, s in zip(target.shape[1:4], spatial)]
        window = (1, *factors, 1)
        summed = jax.lax.reduce_window(
            target.astype(jnp.float32), 0.0, jax.lax.add, window, window, "VALID"
        )
        return summed / float(factors[0] * factors[1] * factors[2])

    def _deep_supervision_loss(self, ds_outs, targets, mask, weight, logs):
        """Multi-scale loss with per-scale weights (reference
        ``orchestrator.py:764-843``); default weights 1/2^k, optional clamp."""
        tgt = targets["label"] if isinstance(targets, dict) else targets
        total = 0.0
        keys = sorted(ds_outs, key=lambda k: int(k.split("_")[1]))
        for k_i, key in enumerate(keys):
            out = ds_outs[key]
            w = (
                self.ds_weights[k_i]
                if self.ds_weights and k_i < len(self.ds_weights)
                else 0.5 ** (k_i + 1)
            )
            t_small = self._downsample_target(tgt, out.shape[1:4])
            m_small = self._downsample_target(mask, out.shape[1:4]) if mask is not None else None
            scale_loss = 0.0
            for term in self.terms:
                if term.head is not None:
                    continue  # per-head terms only on full-res heads
                value = self._term_loss(term, out, t_small, m_small, None)
                scale_loss = scale_loss + term.weight * value
            if self.ds_clamp is not None:
                scale_loss = jnp.clip(scale_loss, 0.0, self.ds_clamp)
            logs[f"loss_{key}"] = scale_loss
            total = total + w * scale_loss
        return total

    @property
    def num_terms(self) -> int:
        return len(self.terms)
