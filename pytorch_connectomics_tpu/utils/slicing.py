"""Python-style channel-slice selectors ("0:1", "-1:", ":", "2") used by loss
terms, activations, and ensemble configuration
(reference ``connectomics/utils`` channel-slice selectors;
``losses/plan.py:59-280``)."""

from __future__ import annotations

from typing import Optional, Tuple


def parse_slice(spec: Optional[str]) -> slice:
    """'a:b' / ':' / 'a:' / ':b' / 'i' -> slice object (channel axis)."""
    if spec is None or spec == ":" or spec == "":
        return slice(None)
    s = str(spec).strip()
    if ":" not in s:
        i = int(s)
        stop = i + 1 if i != -1 else None
        return slice(i, stop)
    lo, _, hi = s.partition(":")
    return slice(int(lo) if lo else None, int(hi) if hi else None)


def slice_channels(x, spec: Optional[str], axis: int = -1):
    """Apply a channel-slice spec along ``axis`` (default last = NDHWC)."""
    sl = parse_slice(spec)
    if sl == slice(None):
        return x
    index = [slice(None)] * x.ndim
    index[axis] = sl
    return x[tuple(index)]


def slice_length(spec: Optional[str], total: int) -> int:
    return len(range(*parse_slice(spec).indices(total)))
