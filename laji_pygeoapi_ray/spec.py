"""The declarative column-pipeline spec — the engine's schema system.

Driven by ``resources/lookup_table_columns.csv`` (mirrored verbatim from the
reference, where it drives the whole projection/rename/cast/merge behavior:
``/root/reference/pygeoapi/scripts/process_data.py:86-130`` and the merge
options consumed at ``edit_db.py:381-460``). Per column the CSV gives the
source API field (``finbif_api_var``), the API filter name
(``finbif_api_query``), Darwin Core name (``dwc``), output name (``virva``),
type (str/int/double/bool/datetime/geom) and merge rule
(GROUPBY/FIRST/AGGREGATE/SUM/MAX).

Adding a column to the engine = adding a CSV row (the UDF-free extension
point, SURVEY.md §2.9).
"""
from __future__ import annotations

import csv
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

import pyarrow as pa

CSV_PATH = Path(__file__).parent / "resources" / "lookup_table_columns.csv"

ARROW_TYPES = {
    "str": pa.string(),
    "int": pa.int64(),            # nullable (Arrow ints are always nullable)
    "double": pa.float64(),
    "bool": pa.bool_(),
    "datetime": pa.timestamp("us"),
    "geom": pa.binary(),          # WKB
}


@dataclass(frozen=True)
class ColumnSpec:
    selected: str          # projection string sent upstream
    source: str            # finbif_api_var — input column name
    query_name: str        # finbif_api_query — user-facing filter name
    dwc: str               # Darwin Core name
    virva: str             # output column name
    type: str              # str | int | double | bool | datetime | geom
    merge_option: str      # GROUPBY | FIRST | AGGREGATE | SUM | MAX | ''
    description: str = ""  # human title (CSV 'description')

    @property
    def arrow_type(self) -> pa.DataType:
        return ARROW_TYPES[self.type]


@lru_cache(maxsize=1)
def load_spec(path: str | None = None) -> tuple[ColumnSpec, ...]:
    """All 57 column specs in CSV order (the fixed output column order,
    ``process_data.py:104-113``)."""
    with open(path or CSV_PATH, encoding="utf-8") as f:
        rows = list(csv.DictReader(f, delimiter=";"))
    return tuple(ColumnSpec(
        selected=r["selected"], source=r["finbif_api_var"],
        query_name=r["finbif_api_query"], dwc=r["dwc"], virva=r["virva"],
        type=r["type"], merge_option=r["merge_option"],
        description=r.get("description", "")) for r in rows)


def output_schema() -> pa.Schema:
    """The fixed 57-column output schema in CSV order."""
    return pa.schema([(c.virva, c.arrow_type) for c in load_spec()])


def rename_map() -> dict[str, str]:
    """source (finbif) name → output (virva) name (``process_data.py:104``)."""
    return {c.source: c.virva for c in load_spec() if c.source}


def filter_name_map() -> dict[str, str]:
    """virva → finbif_api_query (the filter-translation table,
    ``convert_api_filters.py:41-56``)."""
    return {c.virva: c.query_name for c in load_spec() if c.query_name}


def merge_columns() -> dict[str, list[str]]:
    """merge_option → [virva columns] (drives merge_similar; the shipped CSV
    has 23 GROUPBY / 20 FIRST / 11 AGGREGATE / 1 MAX)."""
    out: dict[str, list[str]] = {}
    for c in load_spec():
        if c.merge_option:
            out.setdefault(c.merge_option, []).append(c.virva)
    return out


# JSON-schema type names per the provider surface (lajiapi_provider.py:36-45)
_JSON_TYPES = {"int": "integer", "str": "string", "bool": "boolean",
               "double": "number", "datetime": "string", "geom": "string"}


@lru_cache(maxsize=1)
def get_fields() -> dict[str, dict]:
    """The provider field-introspection surface
    (``lajiapi_provider.py:29-51``): every queryable column (those with a
    ``finbif_api_query`` binding) → {"type": json-type, "title":
    description}. Cached like the reference's ``_cached_fields``."""
    return {c.virva: {"type": _JSON_TYPES[c.type], "title": c.description}
            for c in load_spec() if c.query_name}


def get_schema() -> dict:
    """OGC JSON schema of the output record
    (``lajiapi_provider.py:166-186``): properties limited to the JSON
    primitive types, geometry referenced as a GeoJSON Point."""
    props = {}
    for field, info in get_fields().items():
        t = info["type"]
        props[field] = {"type": t if t in {"number", "integer", "boolean",
                                           "string"} else "string"}
        if info["title"]:
            props[field]["title"] = info["title"]
    return {"type": "object", "properties": props}


def selected_fields() -> str:
    """The upstream projection string — comma-joined non-empty ``selected``
    entries (``lajiapi_provider.py:27``); the engine's read-side analogue is
    the pruned ``columns=[...]`` list passed to ``read_parquet``."""
    return ",".join(c.selected for c in load_spec() if c.selected)
