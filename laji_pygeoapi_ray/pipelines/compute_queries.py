"""Oracle-checked queries for the per-batch column operators (SURVEY.md
§2.2) exercised over the TPC-H-ish views (the occurrence-shaped paths are
covered by golden unit tests in tests/test_colops.py)."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import colops
from ..sources.parquet import default_pool, read_table
from .registry import register

COLLECTION_NAMES = {
    "HR.0": "Kokoelma A", "HR.1": "Kokoelma B", "HR.2": "Kokoelma C",
    "HR.3": "Kokoelma D", "HR.4": "Kokoelma Ö",
}


@register("individual_count_events", sql="""
    SELECT event_id,
           CASE WHEN value > 0 THEN 'paikalla'
                WHEN value <= 0 THEN 'poissa'
                ELSE NULL END AS esiintyman_tila
    FROM events""")
def individual_count_events(sf_dir: str):
    """``compute_individual_count`` (compute_variables.py:34-47): the
    presence/absence ternary over a numeric column."""
    ds = read_table(sf_dir, "events", ["event_id", "value"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "esiintyman_tila": colops.compute_individual_count(t["value"]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


@register("collection_id_part", sql=f"""
    WITH b AS (SELECT p_partkey,
                      'http://tun.fi/HR.' || CAST(p_partkey % 7 AS VARCHAR) AS url
               FROM part),
    names(id, nm) AS (VALUES {", ".join(
        f"('{k}', '{v}')" for k, v in COLLECTION_NAMES.items())})
    SELECT b.p_partkey, n.nm AS aineisto
    FROM b LEFT JOIN names n ON regexp_replace(b.url, '^.*/', '') = n.id""")
def collection_id_part(sf_dir: str):
    """``compute_collection_id`` (compute_variables.py:49-64): strip the id
    URL, broadcast-dict map to the collection long name (miss → null) —
    exercised over a URL column constructed from part keys (ids ≥ HR.5
    have no mapping, the null path)."""
    ds = read_table(sf_dir, "part", ["p_partkey"])

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np
        mod7 = t["p_partkey"].to_numpy(zero_copy_only=False) % 7
        url = pc.binary_join_element_wise(
            pa.array(["http://tun.fi/HR."] * len(t)),
            pc.cast(pa.array(mod7), pa.string()), pa.scalar(""))
        return pa.table({
            "p_partkey": t["p_partkey"],
            "aineisto": colops.compute_collection_id(url, COLLECTION_NAMES),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------ JSON ingest path (oracle)

OCC_N = 2000


def _occ_sql() -> str:
    from ..sources import occurrence_json as occ
    path = occ.synth_occurrence_jsonl(OCC_N)
    taxmap = ", ".join(f"('{k}', '{v}')" for k, v in occ.TAXONOMY.items())
    return f"""
    WITH j AS (SELECT * FROM read_json_auto('{path}/*.jsonl')),
    ids AS (SELECT regexp_extract(
                j.unit.linkings.taxon.informalTaxonGroups[1],
                'MVL\\.[0-9]+', 0) AS mvl FROM j),
    m AS (SELECT * FROM (VALUES {taxmap}) t(id, name))
    SELECT m.name AS elioryhma, CAST(COUNT(*) AS BIGINT) AS n
    FROM ids JOIN m ON ids.mvl = m.id
    GROUP BY 1"""


@register("occurrence_taxon_counts", sql=_occ_sql)
def occurrence_taxon_counts(sf_dir: str):
    """The reference's REAL ingest format end-to-end: ragged nested JSONL
    pages → flatten (json_normalize convention) → ComputeAllStage
    (broadcast taxonomy join, regex MVL extraction) → counts per
    Elioryhma. The oracle re-reads the SAME JSONL with read_json_auto and
    re-derives the group from the raw nested field — certifying the
    flatten + taxonomy-join chain, not just the count."""
    import ray

    from ..sources import occurrence_json as occ
    from ..stages.compute_all import ComputeAllStage
    from ..stages.shuffle import partial_group_counts

    path = occ.synth_occurrence_jsonl(OCC_N)
    ds = occ.read_occurrence_json(path)
    state_ref = ray.put({"taxonomy": occ.TAXONOMY,
                         "collection_names": occ.COLLECTIONS,
                         "value_ranges": {}})
    ds = ds.map_batches(ComputeAllStage, fn_constructor_args=(state_ref,),
                        batch_format="pyarrow", batch_size=4096,
                        concurrency=default_pool(0.5), num_cpus=1)
    out = partial_group_counts(
        ds.map_batches(lambda t: t.select(["Elioryhma"]),
                       batch_format="pyarrow"), ["Elioryhma"])
    return out.map_batches(
        lambda t: t.rename_columns(["elioryhma", "n"]),
        batch_format="pyarrow")
