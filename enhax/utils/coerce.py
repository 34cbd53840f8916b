"""Type/collection coercion helpers.

Rebuild of the reference's ``core/dtype.py`` coercions (to_list :337,
to_int_list :366, intersect_ordered_dicts :121) used for config parsing and
partial weight loading.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence


def to_list(x: Any) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    if isinstance(x, dict):
        return list(x.values())
    if isinstance(x, str):
        # "0,1,2" or "[0,1,2]"
        s = x.strip().strip("[]()")
        if "," in s:
            return [p.strip() for p in s.split(",") if p.strip()]
        return [x]
    return [x]


def to_int_list(x: Any) -> list[int]:
    return [int(v) for v in to_list(x)]


def to_float_list(x: Any) -> list[float]:
    return [float(v) for v in to_list(x)]


def to_pair(x: Any) -> tuple:
    """Coerce to a (h, w)-style 2-tuple (reference uses `_size_2_t` parsing)."""
    if isinstance(x, (int, float)):
        return (x, x)
    xs = to_list(x)
    if len(xs) == 1:
        return (xs[0], xs[0])
    if len(xs) >= 2:
        return (xs[0], xs[1])
    raise ValueError(f"cannot coerce {x!r} to pair")


def intersect_dicts(da: dict, db: dict, exclude: Sequence[str] = ()) -> dict:
    """Keys of ``da`` that exist in ``db`` with matching array shapes.

    Rebuild of ``intersect_ordered_dicts`` (core/dtype.py:121) used for
    partial/adapted weight loading.
    """
    out = {}
    for k, v in da.items():
        if k in db and not any(x in k for x in exclude):
            vb = db[k]
            sa = getattr(v, "shape", None)
            sb = getattr(vb, "shape", None)
            if sa == sb:
                out[k] = v
    return out


def unique(seq: Iterable) -> list:
    """Order-preserving unique."""
    seen = set()
    out = []
    for s in seq:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
