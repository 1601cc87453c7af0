"""Unknown-key rejection for free-form config blocks.

The reference encodes each augmentation as a typed dataclass with strict
field checking (``config/schema/data.py:258-532``) and rejects unconsumed
config keys (``config_io.py:94``). Here the augmentation ops and decoders
take plain keyword arguments, so their *signatures are the schema*: this
module introspects them and rejects config keys no implementation accepts —
a typo'd key raises at config-validation time instead of being silently
ignored.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Iterable, List, Optional, Set

from .schema import ConfigError

# keys meaningful to the builders themselves, never passed to the op
_BUILDER_KEYS = {"enabled"}


def _named_params(
    fn: Callable, skip_first: int, strict_var_kw: bool = False
) -> Optional[Set[str]]:
    """Named keyword-accepting params of ``fn`` past the first ``skip_first``
    positionals; None means the fn takes **kwargs (accepts anything).

    ``strict_var_kw=True`` treats a VAR_KEYWORD parameter as a silent sink
    rather than a real surface — validation stays strict against the named
    params (the decoders' ``**kw`` exists so step pipelines can share one
    kwargs dict, not to accept arbitrary options)."""
    sig = inspect.signature(fn)
    names: Set[str] = set()
    for i, (name, p) in enumerate(sig.parameters.items()):
        if p.kind is inspect.Parameter.VAR_KEYWORD:
            if not strict_var_kw:
                return None
            continue
        if p.kind is inspect.Parameter.VAR_POSITIONAL:
            continue
        if i < skip_first:
            continue
        names.add(name)
    return names


def augmentation_kwarg_schema() -> Dict[str, Optional[Set[str]]]:
    """transform name -> accepted config keys (None = free-form).

    Union of the host op (``data/augment/ops.py``, canonical) and the
    on-device variant (``ops/augment_jax.py``) signatures, since a config
    block may drive either backend.
    """
    from ..data.augment.build import _ORDER
    from ..ops import augment_jax

    schema: Dict[str, Optional[Set[str]]] = {}
    for key, fn, needs_other in _ORDER:
        # host ops: (sample, rng, [other,] **named)
        names = _named_params(fn, skip_first=2)
        if names is not None:
            names.discard("other")
            names |= _BUILDER_KEYS
        dev_fn = getattr(augment_jax, f"_{key}", None) or getattr(
            augment_jax, f"_{key.replace('rotate', 'rot90')}", None
        )
        if names is not None and dev_fn is not None:
            dev = _named_params(dev_fn, skip_first=2)
            if dev is not None:
                names |= dev
        schema[key] = names
    return schema


def validate_augmentation_config(aug_cfg: Any) -> List[str]:
    """Raise ``ConfigError`` on unknown transform names or unknown kwargs
    inside a transform block; returns warnings."""
    if aug_cfg is None or not getattr(aug_cfg, "enabled", False):
        return []
    schema = augmentation_kwarg_schema()
    known_fields = {
        "profile", "enabled", "on_device",
    }
    blocks: Dict[str, Any] = {}
    for name in schema:
        block = getattr(aug_cfg, name, None)
        if block:
            blocks[name] = block
    extra = getattr(aug_cfg, "extra", None) or {}
    for name, block in extra.items():
        if name in known_fields:
            continue
        if name not in schema:
            raise ConfigError(
                f"augmentation: unknown transform '{name}' "
                f"(known: {sorted(schema)})"
            )
        if block:
            blocks[name] = block
    warnings: List[str] = []
    for name, block in blocks.items():
        allowed = schema[name]
        if allowed is None or not isinstance(block, dict):
            continue
        unknown = sorted(set(block) - allowed)
        if unknown:
            raise ConfigError(
                f"augmentation.{name}: unknown option(s) {unknown} "
                f"(accepted: {sorted(allowed - _BUILDER_KEYS)})"
            )
    return warnings


def validate_decoding_config(dec_cfg: Any) -> List[str]:
    """Validate decode step names + kwargs against decoder signatures
    (first positional = the prediction/labels array)."""
    if dec_cfg is None or not getattr(dec_cfg, "enabled", False):
        return []
    from ..decoding.registry import _DECODERS, _GRAPH_OPS, get_decoder

    warnings: List[str] = []

    def check(op_name: str, kwargs: Dict[str, Any], where: str, n_inputs: int = 1):
        fn = _DECODERS.get(op_name) or _GRAPH_OPS.get(op_name)
        if fn is None:
            raise ConfigError(
                f"{where}: unknown decoder/op '{op_name}' "
                f"(known: {sorted(set(_DECODERS) | set(_GRAPH_OPS))})"
            )
        # decoders whose **kw is a real pass-through surface (e.g. abiss
        # forwards arbitrary params into the ABISS param file) opt out
        if getattr(fn, "__free_kwargs__", False):
            return
        allowed = _named_params(fn, skip_first=n_inputs, strict_var_kw=True)
        if allowed is None:
            return
        unknown = sorted(set(kwargs or {}) - allowed)
        if unknown:
            raise ConfigError(
                f"{where} ({op_name}): unknown option(s) {unknown} "
                f"(accepted: {sorted(allowed)})"
            )

    for i, step in enumerate(dec_cfg.steps or []):
        name = step.name if hasattr(step, "name") else step["name"]
        kwargs = dict(getattr(step, "kwargs", None) or {})
        extra = getattr(step, "extra", None) or {}
        kwargs.update({k: v for k, v in extra.items() if k not in ("name", "kwargs")})
        check(name, kwargs, f"decoding.steps[{i}]")
    graph = dec_cfg.graph or {}
    for node, spec in (graph.get("nodes") or {}).items():
        op = spec.get("op") or spec.get("name")
        n_in = max(1, len(spec.get("inputs", []) or []))
        check(op, spec.get("kwargs", {}) or {}, f"decoding.graph.nodes[{node}]", n_in)
    return warnings
