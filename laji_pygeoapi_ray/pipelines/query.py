"""The query layer — user-facing filter translation + spatial predicates +
pagination guards (the OGC-API-Features serving path of SURVEY.md §2.3/§3.2,
re-expressed as Arrow predicate construction over the engine's output).

Reference semantics (file:line into /root/reference/pygeoapi):
- ``translate_filter_names``  convert_api_filters.py:41-56 (exact lookup via
  the CSV spec; fuzzy "Did you mean" via difflib cutoff 0.8)
- ``remove_id_prefix``        convert_api_filters.py:59-65
- ``map_value_ranges``        convert_api_filters.py:68-84 (case- and
  whitespace-insensitive reverse label→key, comma lists)
- ``map_biogeographical_provinces`` convert_api_filters.py:87-101
- ``map_municipality``        convert_api_filters.py:116-122
- ``convert_time``            convert_api_filters.py:125-146
- ``process_bbox``            convert_api_filters.py:148-159 — pygeoapi
  passes [ymin, xmin, ymax, xmax]; NOTE the reference's WGS84 branch
  feeds the swapped axes into pyproj (its own test output shows garbage
  eastings ~3.9e6) — a known bug we do NOT replicate (SURVEY.md §4): the
  engine unswaps first, then reprojects corners with functions/tm35.py.
- pagination guards           plugins/lajiapi_provider.py:57-75,108-111
"""
from __future__ import annotations

import difflib
import re

from .. import spec as specmod
from ..functions import cells, tm35
from ..state import fixtures

MAX_LIMIT = 10_000          # pygeoapi-config.yml:14-16
MAX_PAGED_TOTAL = 100_000   # lajiapi_provider.py:108-111


class FilterError(ValueError):
    """Serving-path error carrying the provider error contract
    (``lajiapi_provider.py:193-201``): ``.payload()`` renders the same
    ``{type: urn:pygeoapi:lajiapi:<code>, title, detail[, hint]}`` dict the
    reference returns to OGC clients."""

    def __init__(self, message: str, *, code: str = "invalid-parameter",
                 hint: str | None = None):
        super().__init__(message)
        self.code = code
        self.hint = hint

    def payload(self) -> dict:
        err = {"type": f"urn:pygeoapi:lajiapi:{self.code}",
               "title": self.code.replace("-", " ").title(),
               "detail": str(self)}
        if self.hint:
            err["hint"] = self.hint
        return err


def translate_filter_name(name: str) -> str:
    """virva column name → upstream filter name; unknown names raise a
    'Did you mean' when a close match exists (cutoff 0.8), else pass
    through unchanged (the reference warns and passes through)."""
    mapping = specmod.filter_name_map()
    if name in mapping:
        return mapping[name]
    close = difflib.get_close_matches(name, mapping.keys(), n=1, cutoff=0.8)
    if close:
        raise FilterError(f"Unknown filter {name!r}. Did you mean {close[0]!r}?")
    return name


def remove_id_prefix(value: str) -> str:
    return re.sub(r"http://[^/]+\.fi/", "", value)


def map_value_ranges(value_ranges: dict[str, str], value: str) -> str:
    """Reverse lookup label→key, case/space-insensitive, over comma-separated
    values; unknown labels pass through. Internal spaces are stripped on BOTH
    sides before the casefold compare (reference
    convert_api_filters.py:70-84 uses ``.replace(' ', '').casefold()``)."""
    rev = {str(v).replace(" ", "").casefold(): k
           for k, v in value_ranges.items()}
    out = [rev.get(part.replace(" ", "").casefold(), part.strip())
           for part in str(value).split(",")]
    return ",".join(out)


def map_biogeographical_provinces(value: str) -> str:
    """Province display name (optionally with a parenthesised suffix) →
    ML.* id; comma lists; unknown pass through."""
    rev = {n.casefold(): i for i, n in fixtures.PROVINCE_ID_MAPPING.items()}
    out = []
    for part in str(value).split(","):
        key = re.sub(r"\s*\(.*\)\s*$", "", part.strip()).casefold()
        out.append(rev.get(key, part.strip()))
    return ",".join(out)


def map_municipality(municipality_ids: dict[str, str], value: str) -> str:
    """Map each comma-separated municipality name to its id (reference
    convert_api_filters.py:116-122: per-part lookup, unknown pass through)."""
    return ",".join(municipality_ids.get(p.strip(), p.strip())
                    for p in str(value).split(","))


def convert_time(value):
    """Reference-exact normalization (``convert_api_filters.py:125-141``):
    strip ``[H:MM]`` bracket times, then remove ALL whitespace; '/' ranges
    and comma lists survive structurally. Non-strings pass through.
    (golden cases: '2020.01.01 [9:41]'→'2020.01.01', '-7 / 0 '→'-7/0',
    '2020, 2021'→'2020,2021', '2020 - 01'→'2020-01')."""
    if not isinstance(value, str):
        return value
    v = re.sub(r"\[\s*\d{1,2}:\d{2}\s*\]", "", value)
    return re.sub(r"\s+", "", v)


def process_bbox(bbox: list[float]) -> tuple[float, float, float, float]:
    """pygeoapi bbox [ymin, xmin, ymax, xmax] → (x0, y0, x1, y1) in WGS84;
    TM35FIN input (the non-plausible-WGS84 branch) is inverse-projected.
    Returns lon/lat because the engine's spatial predicate is cell-cover +
    exact PIP over the derived lon/lat points."""
    ymin, xmin, ymax, xmax = bbox
    if tm35.looks_like_wgs84(xmin, ymin, xmax, ymax):
        return xmin, ymin, xmax, ymax
    lon0, lat0 = tm35.tm35_to_wgs84(xmin, ymin)
    lon1, lat1 = tm35.tm35_to_wgs84(xmax, ymax)
    return float(lon0), float(lat0), float(lon1), float(lat1)


def bbox_predicate(bbox: list[float], res: int = 7):
    """bbox → (cover_cells, exact_fn): the coarse prune set on ``cell{res}``
    (the GIST-scan analogue) plus the exact refine predicate on x/y."""
    x0, y0, x1, y1 = process_bbox(bbox)
    cover = cells.cover_bbox(x0, y0, x1, y1, res)

    def exact(t):
        import pyarrow.compute as pc
        return pc.and_(
            pc.and_(pc.greater_equal(t["x"], x0), pc.less_equal(t["x"], x1)),
            pc.and_(pc.greater_equal(t["y"], y0), pc.less_equal(t["y"], y1)))

    return cover, exact


def validate_paging(limit: int, offset: int, total: int | None = None):
    """limit 1..10 000, offset ≥ 0; totals > 100 000 refuse paging past
    page 1 (lajiapi_provider.py:64-67,108-111)."""
    if not 1 <= limit <= MAX_LIMIT:
        raise FilterError(f"limit outside allowed range 1-{MAX_LIMIT}",
                          hint=f"Reduce limit to <= {MAX_LIMIT}.")
    if offset < 0:
        raise FilterError("offset must be >= 0")
    page = offset // limit + 1
    if total is not None and total > MAX_PAGED_TOTAL and page > 1:
        raise FilterError(
            f"result set {total} exceeds {MAX_PAGED_TOTAL}; refine the query",
            code="too-many-results",
            hint="Refine with datetime, bbox, taxon, collection, or other "
                 "filters.")
    return page


def bbox_query(ds, bbox: list[float], res: int = 7,
               limit: int = 100, offset: int = 0,
               sortby: list[tuple[str, str]] | None = None,
               select_properties: list[str] | None = None):
    """Execute a bbox query over an enriched Dataset (needs x, y, cell{res}):
    coarse cell prune inside map_batches (vectorized isin) + exact refine +
    pagination. Returns the page as a pyarrow Table.

    ``sortby`` — OGC sortby pairs ``[(col, '+'|'-')...]``
    (lajiapi_provider.py:115): the sorted page is computed DISTRIBUTED as
    per-batch partial top-(offset+limit) then one page-sized driver merge —
    no global sort; callers should end sortby with a unique key for a
    deterministic page. ``select_properties`` projects the output columns
    (the ``selected`` pushdown analogue)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    validate_paging(limit, offset)
    cover, exact = bbox_predicate(bbox, res)
    cover_arr = np.asarray(sorted(cover), dtype=np.int64)

    def prune(t: pa.Table) -> pa.Table:
        c = t[f"cell{res}"].to_numpy(zero_copy_only=False)
        keep = np.searchsorted(cover_arr, c) < len(cover_arr)
        keep &= cover_arr[np.minimum(np.searchsorted(cover_arr, c),
                                     len(cover_arr) - 1)] == c
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return t
        return t.filter(exact(t))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    n = offset + limit
    if sortby:
        cols = [c for c, _ in sortby]
        asc = [d != "-" for _, d in sortby]

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(cols, ascending=asc,
                                  kind="mergesort").head(n)

        parts = pruned.map_batches(partial, batch_format="pandas")
        merged = parts.to_pandas()         # ≤ n rows per block, page-sized
        merged = merged.sort_values(cols, ascending=asc, kind="mergesort")
        page = pa.Table.from_pandas(merged.iloc[offset:offset + limit],
                                    preserve_index=False)
    else:
        rows = pruned.limit(n).take_all()
        page = (pa.Table.from_pylist(rows[offset:offset + limit])
                if rows else pa.table({}))
    if select_properties and page.num_rows:
        keep_cols = [c for c in page.column_names
                     if c in set(select_properties)]
        page = page.select(keep_cols)
    return page


# filters dispatched to per-value enumeration lookup in the reference
# (convert_api_filters.py:22-23); here the same dicts are fixture-backed
ENUM_VALUE_FILTERS = ("lifeStage", "sex", "recordQuality",
                      "collectionQuality", "secureReason", "recordBasis")
RANGE_VALUE_FILTERS = ("redListStatusId", "administrativeStatusId",
                       "atlasClass", "atlasCode", "primaryHabitat")


def convert_filters(properties, *, value_ranges: dict | None = None,
                    enum_values: dict | None = None,
                    municipality_ids: dict | None = None,
                    params: dict | None = None) -> dict:
    """The top-level filter dispatcher (``convert_api_filters.py:11-39``):
    per (virva-name, value) pair — translate the name via the CSV spec,
    strip id URL prefixes, then apply the name-specific value translation:
    enum label→key, value-range reverse map, province name→ML id,
    municipality name→id, time normalization, and the negative-filter
    boolean swap for ``onlyNonStateLands``."""
    params = dict(params or {})
    value_ranges = value_ranges or {}
    enum_values = enum_values or {}
    municipality_ids = municipality_ids or {}
    for name, value in properties:
        name = translate_filter_name(name)
        value = remove_id_prefix(str(value))
        if name in ENUM_VALUE_FILTERS:
            value = map_value_ranges(enum_values.get(name, {}), value)
        elif name in RANGE_VALUE_FILTERS:
            value = map_value_ranges(value_ranges, value)
        elif name == "biogeographicalProvinceId":
            value = map_biogeographical_provinces(value)
        elif name == "finnishMunicipalityId":
            value = map_municipality(municipality_ids, value)
        elif name == "time":
            value = convert_time(value)
        elif name == "onlyNonStateLands":
            # the upstream filter is negative: swap (convert_api_filters.py:33-37)
            value = "False" if value.lower() == "true" else "True"
        params[name] = value
    return params
