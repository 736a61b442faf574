"""Generic translated-filter EXECUTION — the serving path's WHERE clause.

``convert_filters`` (pipelines/query.py) reproduces the reference's
virva→warehouse filter translation (``convert_api_filters.py:11-39``). The
reference then ships those params to api.laji.fi and lets the warehouse
evaluate them; this engine stores the enriched output itself, so the same
params must compile into executable predicates. Each supported param is
bound to an output column through a per-collection :class:`Binding` map —
the analogue of ``edit_config.py:109-118``, which binds ``time_field`` and
the provider's queryable columns per generated table.

All compiled predicates AND together (with the bbox cell-prune when given)
inside ONE vectorized ``map_batches`` — the filter never leaves Arrow.
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .query import FilterError, convert_filters


@dataclass(frozen=True)
class Binding:
    """How one translated param executes against the output table.

    kind:
      - ``equals_any``: comma-separated value list → vectorized is_in
      - ``time``: OGC-ish time value (single period, 'a/b' range, comma OR
        list; '..'/'' = unbounded end) → half-open range(s) on a timestamp
        column
      - ``bool``: 'True'/'False' string → boolean equality
    decode: optional per-item value decode applied before the compare
    (e.g. ML.* province id → the label the enriched table stores).
    """
    column: str
    kind: str = "equals_any"
    decode: Callable[[str], str] | None = None


_YEAR = re.compile(r"^\d{4}$")
_MONTH = re.compile(r"^\d{4}-\d{2}$")
_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_REL = re.compile(r"^-?\d+$")


def _period(s: str, *, now: np.datetime64 | None = None
            ) -> tuple[np.datetime64, np.datetime64]:
    """One time token → [start, end) in datetime64[us]. Years/months/days
    expand to their full period (the warehouse's date-containment
    semantics); a full timestamp is the 1-µs instant; relative day counts
    (the reference's ``-7/0``) resolve against ``now`` and raise without
    one — the batch path has no implicit wall clock."""
    s = s.strip()
    if s in ("", ".."):
        raise FilterError("open time endpoint needs a range context")
    for pat, unit in ((_YEAR, "Y"), (_MONTH, "M"), (_DATE, "D")):
        if pat.match(s):
            start = np.datetime64(s, unit)
            return (start.astype("datetime64[us]"),
                    (start + 1).astype("datetime64[us]"))
    try:
        t = np.datetime64(s, "us")
    except ValueError as exc:
        raise FilterError(f"unparseable time value {s!r}") from exc
    return t, t + np.timedelta64(1, "us")


def time_ranges(value: str, *, now: np.datetime64 | None = None
                ) -> list[tuple[np.datetime64 | None, np.datetime64 | None]]:
    """Translated ``time`` value → list of OR'd [start, end) ranges
    (None = unbounded side). Accepts the full ``convert_time`` output
    grammar: comma OR lists, 'a/b' ranges (either side open via '..' or
    empty), single periods."""
    out: list[tuple[np.datetime64 | None, np.datetime64 | None]] = []
    for item in str(value).split(","):
        item = item.strip()
        if "/" in item:
            a, b = (p.strip() for p in item.split("/", 1))
            if _REL.match(a) and _REL.match(b):
                # reference convert_time: a range where BOTH sides are bare
                # integers is relative days from 'now' (e.g. '-7/0') —
                # needs an explicit clock on the batch path
                if now is None:
                    raise FilterError(
                        f"relative day range {item!r} needs an explicit 'now'")
                d0 = now.astype("datetime64[D]") + np.timedelta64(int(a), "D")
                d1 = now.astype("datetime64[D]") + np.timedelta64(int(b), "D")
                out.append((d0.astype("datetime64[us]"),
                            (d1 + np.timedelta64(1, "D"))
                            .astype("datetime64[us]")))
                continue
            lo = None if a in ("", "..") else _period(a, now=now)[0]
            hi = None if b in ("", "..") else _period(b, now=now)[1]
            if lo is None and hi is None:
                raise FilterError(f"unbounded time range {item!r}")
            out.append((lo, hi))
        else:
            out.append(_period(item, now=now))
    return out


def compile_predicate(params: dict[str, str],
                      bindings: dict[str, Binding],
                      *, now: np.datetime64 | None = None
                      ) -> Callable[[pa.Table], pa.Array]:
    """Translated params → ONE vectorized Arrow predicate fn(t)→bool array.
    Every param must have a binding — an unexecutable filter is a loud
    error, not a silently unfiltered result."""
    unknown = sorted(set(params) - set(bindings))
    if unknown:
        raise FilterError(f"no executable binding for filters: {unknown}")
    compiled: list[Callable[[pa.Table], pa.Array]] = []
    for name, value in params.items():
        b = bindings[name]
        if b.kind == "time":
            ranges = time_ranges(value, now=now)

            def time_fn(t: pa.Table, _b=b, _ranges=ranges) -> pa.Array:
                col = pc.cast(t[_b.column], pa.timestamp("us"))
                acc = None
                for lo, hi in _ranges:
                    m = None
                    if lo is not None:
                        m = pc.greater_equal(col, pa.scalar(lo.item()))
                    if hi is not None:
                        h = pc.less(col, pa.scalar(hi.item()))
                        m = h if m is None else pc.and_kleene(m, h)
                    acc = m if acc is None else pc.or_kleene(acc, m)
                return acc

            compiled.append(time_fn)
        elif b.kind == "bool":
            want = str(value).strip().lower() == "true"

            def bool_fn(t: pa.Table, _b=b, _want=want) -> pa.Array:
                return pc.equal(t[_b.column], pa.scalar(_want))

            compiled.append(bool_fn)
        elif b.kind == "equals_any":
            items = [p.strip() for p in str(value).split(",")]
            if b.decode is not None:
                items = [b.decode(p) for p in items]
            vals = pa.array(items, pa.string())

            def isin_fn(t: pa.Table, _b=b, _vals=vals) -> pa.Array:
                return pc.is_in(pc.cast(t[_b.column], pa.string()),
                                value_set=_vals)

            compiled.append(isin_fn)
        else:
            raise FilterError(f"unknown binding kind {b.kind!r}")

    def predicate(t: pa.Table) -> pa.Array:
        acc = None
        for fn in compiled:
            m = fn(t)
            acc = m if acc is None else pc.and_kleene(acc, m)
        if acc is None:
            acc = pa.array(np.ones(len(t), dtype=bool))
        return acc

    return predicate


def apply_filters(ds, properties, bindings: dict[str, Binding], *,
                  now: np.datetime64 | None = None, **convert_kwargs):
    """The full serving WHERE path: translate the (virva name, value) pairs
    via ``convert_filters`` then filter the Dataset with the compiled
    predicate in one map_batches (null compares drop the row, matching SQL
    WHERE)."""
    params = convert_filters(properties, **convert_kwargs)
    pred = compile_predicate(params, bindings, now=now)

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(pred(t), False))

    return ds.map_batches(fn, batch_format="pyarrow")
