"""Test-time augmentation predictor.

Reference: ``connectomics/inference/tta.py:53`` — flip-axes/rot90 variant
enumeration (``tta_combinations.py``), per-channel ensemble modes
(mean/min/max per channel slice, ``schema/inference.py:166-172``), channel
activations (sigmoid/softmax/tanh per slice, ``tta.py:127-191``), and
variant sharding across devices (``tta.py:234-297``) — here the variant loop
runs on one chip per variant via the sharded window engine, or sequentially
with on-device accumulation (no CPU chunked reduces needed: accumulators
stay in HBM).
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..config.schema import TTAConfig
from ..utils.slicing import parse_slice
from .window import SlidingWindowEngine


def enumerate_tta_variants(
    flip_axes: Union[str, List[List[int]], None] = "all",
    rotation90: bool = False,
    rotation_planes: Optional[Sequence[Sequence[int]]] = None,
    rotation_k: Optional[Sequence[int]] = None,
    transforms: Optional[Sequence[Dict[str, Any]]] = None,
) -> List[Dict[str, Any]]:
    """Each variant: {"flip": tuple of spatial axes (0=z,1=y,2=x), "rot": k,
    "plane": rotation plane}. ``rotation_planes``/``rotation_k`` generalize
    ``rotation90`` to arbitrary spatial planes and k subsets (reference
    ``tta_combinations.py:159``); redundant flip×rot combinations (e.g. a
    k=2 rotation equals a double flip) are deduplicated by their index
    permutation, as the reference does via signatures.

    ``transforms``: explicit variant dicts ({"flip": [axes], "rot"/
    "rotation90_k": k, "plane": [a, b]}; reference ``schema/inference.py:165``)
    — when given they REPLACE the enumeration; the identity variant is
    prepended if absent so ensembles always include the raw prediction."""
    if transforms is not None:
        out = [{"flip": (), "rot": 0, "plane": (1, 2)}]
        seen = {_variant_signature(out[0])}
        for t in transforms:
            extra = set(t) - {"flip", "rot", "rotation90_k", "plane"}
            if extra:
                raise ValueError(f"unknown TTA transform keys {sorted(extra)}")
            v = {
                "flip": tuple(int(a) for a in (t.get("flip") or ())),
                "rot": int(t.get("rot", t.get("rotation90_k", 0))) % 4,
                "plane": tuple(int(a) for a in (t.get("plane") or (1, 2))),
            }
            if any(a not in (0, 1, 2) for a in v["flip"]) or len(v["plane"]) != 2:
                raise ValueError(f"bad TTA transform {t}")
            sig = _variant_signature(v)
            if sig not in seen:
                seen.add(sig)
                out.append(v)
        return out
    if flip_axes in (None, False):
        flips: List[Tuple[int, ...]] = [()]
    elif flip_axes == "all":
        flips = []
        for r in range(4):
            flips.extend(itertools.combinations((0, 1, 2), r))
    elif flip_axes == "xy":
        flips = [(), (1,), (2,), (1, 2)]
    elif isinstance(flip_axes, str):
        raise ValueError(
            f"flip_axes string must be 'all' or 'xy', got {flip_axes!r} "
            "(use a list of axis combinations, e.g. [[0]] for z-flip; "
            "0=z, 1=y, 2=x — reference schema/inference.py:159)"
        )
    else:
        flips = [tuple(int(a) for a in f) for f in ([()] + list(flip_axes))]
    if rotation_planes is not None:
        planes = [tuple(int(a) for a in p) for p in rotation_planes]
        for p in planes:
            if len(p) != 2 or not all(0 <= a <= 2 for a in p) or p[0] == p[1]:
                raise ValueError(f"rotation plane must be two distinct spatial axes, got {p}")
        rotation90 = True
    else:
        planes = [(1, 2)]
    rots = [int(k) % 4 for k in rotation_k] if rotation_k is not None else (
        [0, 1, 2, 3] if rotation90 else [0]
    )
    out: List[Dict[str, Any]] = []
    seen = set()
    for f in flips:
        for plane in planes:
            for k in rots:
                v = {"flip": f, "rot": k, "plane": plane}
                sig = _variant_signature(v)
                if sig in seen:
                    continue
                seen.add(sig)
                out.append(v)
    return out


def _variant_signature(v: Dict[str, Any]) -> bytes:
    """A flip/rot90 composition is uniquely determined by its action on a
    small index probe — used to dedup equivalent variants."""
    probe = np.arange(64, dtype=np.int64).reshape(4, 4, 4)
    return apply_variant(probe, v).tobytes()


def apply_variant(vol: np.ndarray, variant: Dict[str, Any]) -> np.ndarray:
    """vol: (Z,Y,X[,C]) — apply flips then rot90 in the variant's plane."""
    out = vol
    if variant["flip"]:
        out = np.flip(out, axis=tuple(variant["flip"]))
    if variant["rot"]:
        out = np.rot90(out, variant["rot"], axes=tuple(variant.get("plane", (1, 2))))
    return np.ascontiguousarray(out)


def invert_variant(pred: np.ndarray, variant: Dict[str, Any]) -> np.ndarray:
    out = pred
    if variant["rot"]:
        out = np.rot90(out, -variant["rot"], axes=tuple(variant.get("plane", (1, 2))))
    if variant["flip"]:
        out = np.flip(out, axis=tuple(variant["flip"]))
    return np.ascontiguousarray(out)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def apply_channel_activations(
    pred: np.ndarray, acts: Optional[Union[str, List[Any]]]
) -> np.ndarray:
    """acts: 'sigmoid' | list of {channels, activation} dicts | list of
    [slice_spec, act] pairs. pred channel-last."""
    if acts is None:
        return pred
    out = pred.astype(np.float32).copy()
    if isinstance(acts, str):
        return _apply_act(out, acts)
    for entry in acts:
        if isinstance(entry, dict):
            spec, act = entry.get("channels", ":"), entry.get("activation", "none")
        else:
            spec, act = entry
        sl = parse_slice(str(spec))
        out[..., sl] = _apply_act(out[..., sl], act)
    return out


def _apply_act(x, act: str):
    if act in ("none", None, ""):
        return x
    if act == "sigmoid":
        return _sigmoid(x)
    if act == "tanh":
        return np.tanh(x)
    if act == "softmax":
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)
    raise ValueError(f"unknown activation '{act}'")


def apply_channel_activations_jnp(pred, acts: Optional[Union[str, List[Any]]]):
    """Traced (jit-safe) twin of :func:`apply_channel_activations` — same
    spec semantics, jnp ops, channels last."""
    import jax.nn as jnn
    import jax.numpy as jnp

    def one(v, act: str):
        if act in ("none", None, ""):
            return v
        if act == "sigmoid":
            return jnn.sigmoid(v)
        if act == "tanh":
            return jnp.tanh(v)
        if act == "softmax":
            return jnn.softmax(v, axis=-1)
        raise ValueError(f"unknown activation '{act}'")

    if acts is None:
        return pred
    x = pred.astype(jnp.float32)
    if isinstance(acts, str):
        return one(x, acts)
    for entry in acts:
        if isinstance(entry, dict):
            spec, act = entry.get("channels", ":"), entry.get("activation", "none")
        else:
            spec, act = entry
        sl = parse_slice(str(spec))
        x = x.at[..., sl].set(one(x[..., sl], str(act)))
    return x


def _ensemble_reduce(stack: List[np.ndarray], mode: str) -> np.ndarray:
    if mode == "mean":
        return np.mean(stack, axis=0)
    if mode == "min":
        return np.min(stack, axis=0)
    if mode == "max":
        return np.max(stack, axis=0)
    raise ValueError(f"unknown ensemble mode '{mode}'")


def ensemble(
    preds: List[np.ndarray], mode: Union[str, List[Any]] = "mean"
) -> np.ndarray:
    """Per-channel-slice ensemble (reference ``schema/inference.py:166-172``,
    e.g. ``[["0:9", min], ["9:", mean]]``)."""
    if isinstance(mode, str):
        return _ensemble_reduce(preds, mode)
    out = np.empty_like(preds[0])
    for spec, m in mode:
        sl = parse_slice(str(spec))
        out[..., sl] = _ensemble_reduce([p[..., sl] for p in preds], str(m))
    return out


def affinity_flip_align(aff, flipped_axes, offsets, channel_slice=None):
    """Re-align flip-inverted affinity predictions to canonical offsets.

    Under the deepem high-end convention (``data/targets/affinity.py``:
    ``aff_c[p] = same(seg[p], seg[p - off_c])``), predicting on a volume
    flipped along spatial axis ``a`` and flipping the prediction back yields
    the affinity for the offset with its ``a``-component NEGATED:
    ``aff_{-o}[q] = same(seg[q], seg[q + o_a])``. Converting back to the
    canonical channel is a shift: ``aff_{+o}[p] = aff_{-o}[p - o_a]`` along
    ``a``, zero-filled at the start. Plain flip-back (what image-channel TTA
    does) is off by ``o_a`` voxels on that channel — this helper applies the
    missing shift so affinity TTA ensembles stay voxel-aligned.

    ``aff``: (..., Z, Y, X, C) with affinity channels last, AFTER the naive
    flip-back. ``flipped_axes``: spatial axes (0=z,1=y,2=x) the variant
    flipped. ``offsets``: parsed (dz,dy,dx) per channel (affinity channel
    order). ``channel_slice``: optional (start, stop) if the affinity block
    sits inside a wider channel dim. jnp-traceable (usable inside jit).
    """
    import jax
    import jax.numpy as jnp

    if not flipped_axes:
        return aff
    c0 = 0 if channel_slice is None else channel_slice[0]
    sdim = aff.ndim - 4  # index of Z among aff dims
    chans = {}
    for c, off in enumerate(offsets):
        ch = aff[..., c0 + c]
        for a in flipped_axes:
            o = int(off[a])
            if o == 0:
                continue
            ax = sdim + a
            n = ch.shape[ax]
            if o > 0:
                body = jax.lax.slice_in_dim(ch, 0, n - o, axis=ax)
                pad = [(0, 0)] * ch.ndim
                pad[ax] = (o, 0)
            else:
                body = jax.lax.slice_in_dim(ch, -o, n, axis=ax)
                pad = [(0, 0)] * ch.ndim
                pad[ax] = (0, -o)
            ch = jnp.pad(body, pad)
        chans[c0 + c] = ch
    cols = [chans.get(i, aff[..., i]) for i in range(aff.shape[-1])]
    return jnp.stack(cols, axis=-1)


def flip_align_valid_mask(
    shape_zyx: Sequence[int],
    n_channels: int,
    flipped_axes: Sequence[int],
    affinity_groups: Sequence[Dict[str, Any]],
) -> np.ndarray:
    """(Z,Y,X,C) mask: 1 where a flip-realigned value is genuine, 0 on the
    planes :func:`affinity_flip_align` zero-fills (the realigned value lives
    outside this block). Static — built once per variant at trace time."""
    m = np.ones((*tuple(shape_zyx), n_channels), np.float32)
    for g in affinity_groups or ():
        for c, off in enumerate(g["offsets"]):
            ci = g["start"] + c
            for a in flipped_axes:
                o = int(off[a])
                if o == 0:
                    continue
                n = int(shape_zyx[a])
                idx: List[Any] = [slice(None)] * 3
                idx[a] = slice(0, min(o, n)) if o > 0 else slice(max(n + o, 0), n)
                m[tuple(idx) + (ci,)] = 0.0
    return m


def make_patch_local_apply_fn(
    apply_fn: Callable,
    variants: List[Dict[str, Any]],
    ensemble_mode: Union[str, List[Any]] = "mean",
    window: Optional[Sequence[int]] = None,
    affinity_groups: Optional[List[Any]] = None,
    activations: Optional[Union[str, List[Any]]] = None,
) -> Callable:
    """Wrap a model ``apply_fn`` so every window batch is evaluated under all
    TTA variants on-device and ensembled per window (reference
    patch-first-local TTA, ``tta.py:420,822``). Flips/rots on a patch are a
    handful of vmapped lane/sublane reversals — nearly free on TPU — so this
    removes the per-variant volume sweeps entirely.

    Semantics (the standard patch-local convention, cf. nnU-Net mirroring):
    each variant is inverted, affinity-realigned, ACTIVATED, then ensembled
    per window, and the ensembled window is blended into the volume. With
    ``activations=None`` + mean ensembling + a flip-symmetric grid this is
    exactly the whole-volume TTA result (blending is linear); with a
    nonlinear activation it activates before blending where whole-volume
    mode activates after — the window-level analogue, not bit-equal.

    Affinity channels: per-window realignment shifts values in from OUTSIDE
    the window, so the first ``|offset|`` planes of every flipped variant
    are unknown at every window (not just the volume border). Those planes
    are excluded per variant via a validity mask — mean becomes a weighted
    mean, min/max skip masked entries — instead of ensembling a spurious
    zero logit at every interior window seam.
    """
    import jax.numpy as jnp

    if any(v["rot"] for v in variants):
        for v in variants:
            if not v["rot"]:
                continue
            p0, p1 = v.get("plane", (1, 2))
            if window is not None and window[p0] != window[p1]:
                raise ValueError(
                    "patch_first_local rotation90 needs equal window extents "
                    f"in its rotation plane {(p0, p1)}, got {tuple(window)}"
                )
        if affinity_groups:
            raise ValueError(
                "rotation90 TTA over affinity channels is not supported"
            )

    modes: Union[str, List[Any]] = ensemble_mode
    need = {modes} if isinstance(modes, str) else {str(m) for _, m in modes}
    bad = need - {"mean", "min", "max"}
    if bad:
        raise ValueError(f"unknown ensemble mode(s) {sorted(bad)}")
    # masking only matters when a flip variant realigns an affinity channel
    masked = bool(affinity_groups) and any(
        v["flip"]
        and any(
            off[a]
            for g in affinity_groups
            for off in g["offsets"]
            for a in v["flip"]
        )
        for v in variants
    )

    def tta_apply(params, batch):
        accs: Dict[str, Any] = {}
        den = None
        big = jnp.float32(3.4e38)
        for v in variants:
            vb = batch
            if v["flip"]:
                vb = jnp.flip(vb, axis=tuple(a + 1 for a in v["flip"]))
            if v["rot"]:
                pl = v.get("plane", (1, 2))
                vb = jnp.rot90(vb, v["rot"], axes=(pl[0] + 1, pl[1] + 1))
            p = apply_fn(params, vb)
            if v["rot"]:
                pl = v.get("plane", (1, 2))
                p = jnp.rot90(p, -v["rot"], axes=(pl[0] + 1, pl[1] + 1))
            if v["flip"]:
                p = jnp.flip(p, axis=tuple(a + 1 for a in v["flip"]))
                for g in affinity_groups or ():
                    p = affinity_flip_align(
                        p, tuple(v["flip"]), g["offsets"],
                        channel_slice=(g["start"], g["end"]),
                    )
            p = apply_channel_activations_jnp(p.astype(jnp.float32), activations)
            if masked:
                m = jnp.asarray(
                    flip_align_valid_mask(
                        p.shape[-4:-1], p.shape[-1], tuple(v["flip"]),
                        affinity_groups or (),
                    )
                )
                den = m if den is None else den + m
                if "mean" in need:
                    pm = p * m
                    accs["mean"] = pm if "mean" not in accs else accs["mean"] + pm
                if "min" in need:
                    pm = jnp.where(m > 0, p, big)
                    accs["min"] = pm if "min" not in accs else jnp.minimum(accs["min"], pm)
                if "max" in need:
                    pm = jnp.where(m > 0, p, -big)
                    accs["max"] = pm if "max" not in accs else jnp.maximum(accs["max"], pm)
            else:
                if "mean" in need:
                    accs["mean"] = p if "mean" not in accs else accs["mean"] + p
                if "min" in need:
                    accs["min"] = p if "min" not in accs else jnp.minimum(accs["min"], p)
                if "max" in need:
                    accs["max"] = p if "max" not in accs else jnp.maximum(accs["max"], p)
        if "mean" in accs:
            if masked:
                # identity variant is always valid -> den >= 1 everywhere
                accs["mean"] = accs["mean"] / jnp.maximum(den, 1.0)
            else:
                accs["mean"] = accs["mean"] / len(variants)
        if isinstance(modes, str):
            return accs[modes]
        out = accs[str(modes[0][1])]
        for spec, m in modes:
            sl = parse_slice(str(spec))
            out = out.at[..., sl].set(accs[str(m)][..., sl])
        return out

    return tta_apply


class TTAPredictor:
    """Wires variant enumeration around a sliding-window engine."""

    def __init__(
        self,
        engine: SlidingWindowEngine,
        tta_cfg: Optional[TTAConfig] = None,
        activations: Optional[Union[str, List[Any]]] = None,
        select_channel: Optional[List[int]] = None,
        mesh=None,
        affinity_groups: Optional[List[Any]] = None,
    ):
        self.engine = engine
        cfg = tta_cfg or TTAConfig()
        if cfg.enabled:
            self.variants = enumerate_tta_variants(
                cfg.flip_axes or "all",
                cfg.rotation90,
                rotation_planes=getattr(cfg, "rotation_planes", None),
                rotation_k=getattr(cfg, "rotation_k", None),
                transforms=getattr(cfg, "transforms", None),
            )
        else:
            self.variants = [{"flip": (), "rot": 0}]
        self.ensemble_mode = cfg.ensemble_mode
        self.activations = activations if activations is not None else cfg.act
        self.select_channel = select_channel
        self.mesh = mesh
        # affinity channel ranges ([{start, end, offsets}]): flip inversion
        # of affinity channels needs a per-offset shift (affinity_flip_align)
        # or the ensemble combines channels misaligned by each offset
        self.affinity_groups = list(affinity_groups or [])
        if self.affinity_groups and any(v["rot"] for v in self.variants):
            raise ValueError(
                "rotation90 TTA over affinity channels is not supported: a "
                "(y,x) rotation permutes offset channels; use flip-only TTA "
                "for affinity outputs"
            )
        self.patch_first_local = bool(getattr(cfg, "patch_first_local", False))
        self._patch_engine: Optional[SlidingWindowEngine] = None
        if self.patch_first_local and len(self.variants) > 1:
            import copy

            wrapped = make_patch_local_apply_fn(
                engine.apply_fn, self.variants, self.ensemble_mode, engine.window,
                affinity_groups=self.affinity_groups,
                activations=self.activations,
            )
            self._patch_engine = copy.copy(engine)
            self._patch_engine.apply_fn = wrapped

    def _align_affinities(self, pred, variant):
        """Post-flip-back offset realignment of affinity channel groups
        (no-op without groups or flips). Applied on raw outputs, before
        channel activations."""
        if not self.affinity_groups or not variant["flip"]:
            return pred
        out = pred
        for g in self.affinity_groups:
            out = np.asarray(
                affinity_flip_align(
                    out, tuple(variant["flip"]), g["offsets"],
                    channel_slice=(g["start"], g["end"]),
                )
            )
        return out

    @property
    def num_variants(self) -> int:
        return len(self.variants)

    def _variants_preserve_shape(self, shape_zyx: Sequence[int]) -> bool:
        """True when every variant maps a volume of this shape onto the SAME
        shape — required by the variant-sharded path, which stacks all variant
        volumes on one axis and crops all outputs with the identity slice. An
        odd rot90 in a plane with unequal extents transposes those extents
        (mainstream for anisotropic EM volumes via ``rotation_planes``), so
        such configs fall back to the serial per-variant loop."""
        for v in self.variants:
            if v["rot"] % 2:
                p0, p1 = v.get("plane", (1, 2))
                if shape_zyx[p0] != shape_zyx[p1]:
                    return False
        return True

    def _run_engine(self, params, vol, out_channels=None):
        if self.mesh is not None and self.mesh.devices.size > 1:
            return self.engine.predict_sharded(params, vol, self.mesh, out_channels)
        return self.engine(params, vol, out_channels)

    def predict(
        self, params, volume: np.ndarray, out_channels: Optional[int] = None
    ) -> np.ndarray:
        """volume (Z,Y,X[,C]) -> activated ensembled prediction (Z,Y,X,C)."""
        if self._patch_engine is not None:
            # ONE sweep; variants activated + ensembled per window inside the
            # jitted pass (activations already applied — see
            # make_patch_local_apply_fn)
            eng = self._patch_engine
            if self.mesh is not None and self.mesh.devices.size > 1:
                out = eng.predict_sharded(params, volume, self.mesh, out_channels)
            else:
                out = eng(params, volume, out_channels)
            if self.select_channel is not None:
                out = out[..., self.select_channel]
            return out.astype(np.float32)
        if (
            self.mesh is not None
            and self.mesh.devices.size > 1
            and len(self.variants) >= self.mesh.devices.size
            and self._variants_preserve_shape(volume.shape[:3])
        ):
            preds = self._predict_variants_sharded(params, volume, out_channels)
        else:
            preds = []
            for variant in self.variants:
                v = apply_variant(volume, variant)
                p = self._run_engine(params, v, out_channels)
                p = invert_variant(p, variant)
                p = self._align_affinities(p, variant)
                p = apply_channel_activations(p, self.activations)
                preds.append(p)
        out = ensemble(preds, self.ensemble_mode) if len(preds) > 1 else preds[0]
        if self.select_channel is not None:
            out = out[..., self.select_channel]
        return out.astype(np.float32)

    def _predict_variants_sharded(self, params, volume, out_channels):
        """TTA-variant parallelism: variants stacked on a leading axis sharded
        over the ``data`` mesh axis — each device runs the full window pass
        for its variants concurrently (the TPU equivalent of the reference's
        DDP-rank variant sharding + reduce, ``tta.py:234-297``)."""
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .window import pad_roi_jnp, pad_volume_to_roi

        mesh = self.mesh
        n_dev = mesh.devices.size
        engine = self.engine
        vol = np.asarray(volume, dtype=np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        # variants padded to a device multiple by repeating the identity
        variants = list(self.variants)
        while len(variants) % n_dev:
            variants.append({"flip": (), "rot": 0})
        stacked = np.stack([apply_variant(vol, v) for v in variants])
        if out_channels is None:
            out_channels = engine.probe_out_channels(params, vol.shape[-1])

        orig_shape = vol.shape[:3]
        # device function: per-variant full window pass (padding done inside
        # on fixed shapes so results match the single-device path)
        def one(params, vols):
            def single(v):
                padded, _ = pad_roi_jnp(v, engine.window, engine.padding_mode)
                return engine.device_pass(params, padded, out_channels)

            return jax.vmap(single)(vols)

        sharded = shard_map(
            one,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
        rep = NamedSharding(mesh, P())
        params_m = jax.device_put(params, rep)
        stacked_m = jax.device_put(stacked, NamedSharding(mesh, P("data")))
        outs = np.asarray(jax.jit(sharded)(params_m, stacked_m))
        # crop the grow-to-roi padding, invert variants, activations
        _, pads = pad_volume_to_roi(vol, engine.window, engine.padding_mode)
        sl = tuple(slice(p[0], p[0] + s) for p, s in zip(pads, orig_shape))
        preds = []
        for i, variant in enumerate(self.variants):
            p = outs[i][sl]
            p = invert_variant(p, variant)
            p = self._align_affinities(p, variant)
            preds.append(apply_channel_activations(p, self.activations))
        return preds
