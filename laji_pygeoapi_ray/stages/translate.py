"""``translate_column_names`` on Arrow — the fixed-output-schema projector.

Reproduces ``/root/reference/pygeoapi/scripts/process_data.py:86-130``:
rename per the CSV spec → add missing columns as null → project to exactly
the 57 ``virva`` columns in CSV order → cast per the CSV ``type``:

- int      → int64 (nullable; strings parsed, errors → null)
- double   → float64
- bool     → parsed from 'true'/'false' strings (case-insensitive),
             'none'/'nan'/unparseable → null (``process_data.py:121-123``)
- datetime → '%Y-%m-%d' with coerce-to-null (``process_data.py:119-120``)
- str      → string (NaN normalized to null, ``process_data.py:127-128``)
- geom     → binary (WKB) passthrough

Dynamic-in / fixed-out: the input batch may lack any subset of columns
(the upstream API returns ragged JSON — SURVEY.md §1.3)."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import spec as specmod


def _cast_column(col: pa.Array, typ: str, n: int) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        if typ == "int":
            if pa.types.is_string(col.type):
                # vectorized errors='coerce': regex-validate (same accept
                # set as Python int(): optional sign, digits, outer
                # whitespace), null out the rest, then one Arrow cast
                s = pc.utf8_trim_whitespace(col)
                ok = pc.match_substring_regex(s, r"^[+-]?[0-9]+$")
                return pc.cast(pc.if_else(ok, s, pa.scalar(None, pa.string())),
                               pa.int64())
            return pc.cast(col, pa.int64())
        if typ == "double":
            return pc.cast(col, pa.float64())
        if typ == "bool":
            if pa.types.is_boolean(col.type):
                return col
            s = pc.utf8_lower(pc.cast(col, pa.string()))
            return pc.if_else(pc.equal(s, "true"), pa.scalar(True),
                              pc.if_else(pc.equal(s, "false"),
                                         pa.scalar(False),
                                         pa.scalar(None, pa.bool_())))
        if typ == "datetime":
            if pa.types.is_timestamp(col.type):
                return pc.cast(col, pa.timestamp("us"))
            return pc.cast(
                pc.strptime(pc.cast(col, pa.string()), "%Y-%m-%d", "us",
                            error_is_null=True), pa.timestamp("us"))
        if typ == "geom":
            return pc.cast(col, pa.binary())
        return pc.cast(col, pa.string())
    except pa.ArrowInvalid:
        return pa.nulls(n, specmod.ARROW_TYPES[typ])


def translate_columns(batch: pa.Table) -> pa.Table:
    """Rename → fill missing with null → project to CSV order → cast."""
    renames = specmod.rename_map()
    cols = {}
    for name in batch.column_names:
        cols[renames.get(name, name)] = batch[name]
    n = len(batch)
    out_cols = []
    for cs in specmod.load_spec():
        if cs.virva in cols:
            out_cols.append(_cast_column(cols[cs.virva], cs.type, n))
        else:
            out_cols.append(pa.nulls(n, cs.arrow_type))
    return pa.table(dict(zip([c.virva for c in specmod.load_spec()],
                             out_cols)))
