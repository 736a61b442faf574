"""Serving-path queries: predicate pushdown (bbox cell-prune + exact refine
+ property filter), oracle-checked."""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import points
from ..sources.parquet import read_table
from ..stages.derive import derive_and_encode
from .query import bbox_predicate
from .registry import register

BBOX = [60.0, 24.6, 60.4, 25.3]   # pygeoapi order [ymin, xmin, ymax, xmax]


def _bbox_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT d.doc_id, d.lang, {x} AS x, {y} AS y
                 FROM documents d)
    SELECT doc_id, lang, x, y FROM pts
    WHERE lang = 'en'
      AND x >= CAST('24.6' AS DOUBLE) AND x <= CAST('25.3' AS DOUBLE)
      AND y >= CAST('60.0' AS DOUBLE) AND y <= CAST('60.4' AS DOUBLE)"""


@register("filtered_docs_bbox", sql=_bbox_sql)
def filtered_docs_bbox(sf_dir: str):
    """The serving path (SURVEY.md §3.2) as a pipeline: property filter
    (lang = 'en') + bbox predicate = coarse res-7 cell-cover prune (the
    GIST-scan analogue) then the exact x/y refine — both inside one
    vectorized map_batches."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    cover, exact = bbox_predicate(BBOX, 7)
    cover_arr = np.asarray(sorted(cover), dtype=np.int64)

    def fn(t: pa.Table) -> pa.Table:
        c = t["cell7"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cover_arr, c)
        keep = (pos < len(cover_arr)) & (
            cover_arr[np.minimum(pos, len(cover_arr) - 1)] == c)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return t.select(["doc_id", "lang", "x", "y"])
        t = t.filter(pc.and_(exact(t), pc.equal(t["lang"], "en")))
        return t.select(["doc_id", "lang", "x", "y"])

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------- translated-filter execution

from ..stages import assign                                    # noqa: E402
from ..sources.parquet import default_pool                     # noqa: E402
from ..state import fixtures                                   # noqa: E402
from .serving import Binding, apply_filters                    # noqa: E402

# the events "collection" binding map — the edit_config.py:109-118 analogue
# (time_field + queryable provider columns bound per generated table)
EVENTS_BINDINGS = {
    "time": Binding("ts", "time"),
    "event_type": Binding("event_type", "equals_any"),
}

DOCS_BINDINGS = {
    "biogeographicalProvinceId": Binding(
        "province", "equals_any",
        decode=lambda v: fixtures.PROVINCE_ID_MAPPING.get(v, v)),
    "source": Binding("source", "equals_any"),
}


@register("filtered_events_time_range", sql="""
    SELECT event_id, ts, event_type, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-11'
      AND event_type IN ('view', 'purchase')""")
def filtered_events_time_range(sf_dir: str):
    """Executed datetime + property filter on the serving path: the raw
    virva-style request ``Aika='2024-01-05 [9:41] / 2024-01-10'`` (bracket
    time + whitespace stripped by convert_time, range endpoints expanded to
    full-day periods) plus a pass-through enum list, translated by
    convert_filters then compiled to ONE vectorized Arrow predicate
    (reference: convert_api_filters.py:11-39 + the warehouse evaluating the
    shipped params)."""
    ds = read_table(sf_dir, "events",
                    ["event_id", "ts", "event_type", "value"])
    return apply_filters(ds, [("Aika", "2024-01-05 [9:41] / 2024-01-10"),
                              ("event_type", "view,purchase")],
                         EVENTS_BINDINGS)


def _province_filter_sql() -> str:
    from .geoqueries import _pip_sql
    return f"""
    WITH assigned AS ({_pip_sql(fixtures.province_layer, True)})
    SELECT a.doc_id, a.name AS province, d.source
    FROM assigned a JOIN documents d USING (doc_id)
    WHERE a.name = 'Uusimaa' AND d.source IN ('src1', 'src5')"""


@register("filtered_docs_province", sql=_province_filter_sql)
def filtered_docs_province(sf_dir: str):
    """Executed biogeographical-province + property filter over the
    ENRICHED output: 'Eliomaakunta=Uusimaa (U)' translates to
    biogeographicalProvinceId=ML.253 (map_biogeographical_provinces), which
    the binding decodes back to the PIP label the enriched table stores;
    'source' passes through untranslated (the reference's unknown-filter
    warning path). Predicate executes after the PIP actor-pool stage."""
    ds = read_table(sf_dir, "documents", ["doc_id", "source"])
    from ..stages.derive import derive_and_encode
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(assign.PIPAssigner, batch_format="pyarrow",
                        batch_size=16384, concurrency=default_pool(),
                        num_cpus=1)
    ds = apply_filters(ds, [("Eliomaakunta", "Uusimaa (U)"),
                            ("source", "src1,src5")], DOCS_BINDINGS)
    return ds.select_columns(["doc_id", "province", "source"])


# ----------------------------------------- composed serving page (bbox+sort)

PAGE_LIMIT, PAGE_OFFSET = 4, 2


def _bbox_page_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT d.doc_id, d.lang, d.source, {x} AS x, {y} AS y
                 FROM documents d)
    SELECT doc_id, lang, source, x, y FROM pts
    WHERE source IN ('src1', 'src5')
      AND x >= CAST('24.6' AS DOUBLE) AND x <= CAST('25.3' AS DOUBLE)
      AND y >= CAST('60.0' AS DOUBLE) AND y <= CAST('60.4' AS DOUBLE)
    ORDER BY lang, doc_id
    LIMIT {PAGE_LIMIT} OFFSET {PAGE_OFFSET}"""


@register("bbox_query_page", sql=_bbox_page_sql)
def bbox_query_page(sf_dir: str):
    """The FULL composed serving request, end-to-end — the
    ``lajiapi_provider.query`` analogue (reference
    ``plugins/lajiapi_provider.py:115-135``): raw property filter through
    the convert_filters TRANSLATION path → res-7 cell-cover PRUNE (the
    GIST-scan analogue) → exact x/y REFINE → OGC ``sortby`` (per-batch
    partial top-(offset+limit), page-sized driver merge — no global sort)
    → limit/offset PAGING with the reference's paging guards
    (validate_paging) → ``select_properties`` projection. The oracle is
    the identical SQL WHERE + ORDER BY + LIMIT/OFFSET; sortby ends with
    the unique doc_id so the page is deterministic on both sides."""
    from ..stages.derive import derive_and_encode
    from .query import bbox_query

    ds = read_table(sf_dir, "documents", ["doc_id", "lang", "source"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = apply_filters(ds, [("source", "src1,src5")], DOCS_BINDINGS)
    return bbox_query(
        ds, BBOX, res=7, limit=PAGE_LIMIT, offset=PAGE_OFFSET,
        sortby=[("lang", "+"), ("doc_id", "+")],
        select_properties=["doc_id", "lang", "source", "x", "y"])


# ------------------------------------------------- single-record fetch (by id)

GET_ID = 123   # the fixture record fetched by the registered query


def fetch_by_local_id(sf_dir: str, local_id: str):
    """``GET /items/{id}`` (reference ``lajiapi_provider.py:137-163``): the
    serving id is ``Paikallinen_tunniste`` — the unit id with its LAST
    ``#`` stored as ``_``. Decode ``_``→``#``, parse the integer record
    key out of it, and push that key down as a Parquet read filter (row-
    group pruning — at 10^12 rows the lookup touches one fragment, never a
    scan), then verify the full decoded id on the fetched row."""
    import pyarrow.dataset as pads

    from ..functions import points as pts
    from ..functions.colops import local_id_decode

    decoded = local_id_decode(pa.array([local_id])).to_pylist()[0]
    m = re.match(r"^http://tun\.fi/JX\.(\d+)#(\d+)$", decoded or "")
    if m is None:
        raise ValueError(f"malformed local id {local_id!r}")
    key = int(m.group(1))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"],
                               filter=(pads.field("doc_id") == key))

    def enrich(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        x, y = pts.derive_xy(k)
        unit = [f"http://tun.fi/JX.{v}#{v % 7}" for v in k.tolist()]
        keep = pa.array([u == decoded for u in unit])
        t = (t.append_column("x", pa.array(x))
              .append_column("y", pa.array(y))
              .append_column("local_id", pa.array(
                  [u.replace("#", "_") for u in unit], pa.string())))
        return t.filter(keep)

    return ds.map_batches(enrich, batch_format="pyarrow")


def _get_by_id_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    SELECT doc_id, lang, {x} AS x, {y} AS y,
           'http://tun.fi/JX.' || CAST(doc_id AS VARCHAR) || '_'
               || CAST(doc_id % 7 AS VARCHAR) AS local_id
    FROM documents WHERE doc_id = {GET_ID}"""


@register("get_by_id", sql=_get_by_id_sql)
def get_by_id(sf_dir: str):
    """Single-record fetch through the id round-trip: the request carries
    the '_' form, the engine decodes to '#', prunes the read by the parsed
    key, and returns the one enriched feature row."""
    return fetch_by_local_id(
        sf_dir, f"http://tun.fi/JX.{GET_ID}_{GET_ID % 7}")


# ------------------------------------------------- resulttype=hits

@register("hits_count", sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS number_matched FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-11'
      AND event_type IN ('view', 'purchase')""")
def hits_count(sf_dir: str):
    """``resulttype=hits`` (lajiapi_provider.py:124-125): the same translated
    filters, but only the match COUNT is returned — the count is the
    pre-aggregated partial-count path, so no row ever leaves the read
    stage."""
    ds = read_table(sf_dir, "events", ["ts", "event_type"])
    ds = apply_filters(ds, [("Aika", "2024-01-05 [9:41] / 2024-01-10"),
                            ("event_type", "view,purchase")],
                       EVENTS_BINDINGS)
    n = ds.count()
    return pa.table({"number_matched": pa.array([n], pa.int64())})


# ------------------------------------------------- sorted + projected paging

def _sorted_page_sql() -> str:
    x, y = points.sql_xy("doc_id")
    return f"""
    WITH pts AS (SELECT d.doc_id, d.n_chars, {x} AS x, {y} AS y
                 FROM documents d)
    SELECT doc_id, n_chars FROM pts
    WHERE x >= CAST('24.6' AS DOUBLE) AND x <= CAST('25.3' AS DOUBLE)
      AND y >= CAST('60.0' AS DOUBLE) AND y <= CAST('60.4' AS DOUBLE)
    ORDER BY n_chars DESC, doc_id
    LIMIT 20 OFFSET 5"""


@register("sorted_page_docs", sql=_sorted_page_sql)
def sorted_page_docs(sf_dir: str):
    """OGC ``sortby`` + ``select_properties`` paging on the serving path:
    bbox prune → distributed partial top-(offset+limit) per block → one
    page-sized merge (no global sort) → projection. sortby ends with the
    unique doc_id so the page is deterministic — hash-exact vs the SQL
    ORDER BY ... LIMIT/OFFSET twin."""
    from .query import bbox_query

    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = ds.map_batches(derive_and_encode("doc_id", (7,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    return bbox_query(ds, BBOX, limit=20, offset=5,
                      sortby=[("n_chars", "-"), ("doc_id", "+")],
                      select_properties=["doc_id", "n_chars"])


@register("keyset_page_docs", sql=_sorted_page_sql)
def keyset_page_docs(sf_dir: str):
    """Keyset (cursor) pagination — the scale path OFFSET paging can't
    take: OFFSET n forces every deeper page to re-rank n+limit rows,
    while a keyset cursor pushes `(sort_key, id) after last-seen` DOWN
    into the scan as a vectorized predicate, so page depth never costs
    more than one page. Here page 1 (5 rows) yields the cursor and the
    next 20 rows are fetched keyset-style; sharing `sorted_page_docs`'
    LIMIT 20 OFFSET 5 oracle proves keyset ≡ offset semantics exactly
    (sort = n_chars desc, doc_id asc — the unique tail key makes the
    cursor total)."""
    from .query import bbox_query

    sortby = [("n_chars", "-"), ("doc_id", "+")]

    def enriched():
        ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
        return ds.map_batches(derive_and_encode("doc_id", (7,)),
                              batch_format="pyarrow", zero_copy_batch=True)

    page1 = bbox_query(enriched(), BBOX, limit=5, offset=0, sortby=sortby,
                       select_properties=["doc_id", "n_chars"])
    c_chars = page1["n_chars"][-1].as_py()
    c_id = page1["doc_id"][-1].as_py()

    def after_cursor(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        di = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (nc < c_chars) | ((nc == c_chars) & (di > c_id))
        return t.filter(pa.array(keep))

    ds2 = enriched().map_batches(after_cursor, batch_format="pyarrow")
    return bbox_query(ds2, BBOX, limit=20, offset=0, sortby=sortby,
                      select_properties=["doc_id", "n_chars"])
