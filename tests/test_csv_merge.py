"""The CSV-spec merge applied to real 57-column occurrence batches: the
reference's flagship combination (compute_all output -> merge_similar with
the shipped merge_option spec, edit_db.py:381-460)."""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from laji_pygeoapi_ray.stages.compute_all import ComputeAllStage
from laji_pygeoapi_ray.stages.merge import merge_similar, merge_spec_from_csv


def _occurrence_batch():
    """Three raw records: two identical on every GROUPBY column (mergeable),
    one differing (distinct group)."""
    def rec(uid, count, det, name, date):
        return {
            "unit.unitId": uid,
            "unit.linkings.taxon.scientificName": name,
            "unit.interpretations.individualCount": count,
            "unit.det": det,
            "document.collectionId": "http://tun.fi/HR.1",
            "gathering.eventDate.begin": date,
            "gathering.eventDate.end": date,
            "document.loadDate": "2024-05-02",
            "unit.linkings.taxon.id": "MX.1",
        }
    rows = [rec("http://tun.fi/JX.1#1", 5, "Ann", "Parus major", "2024-05-01"),
            rec("http://tun.fi/JX.2#1", 5, "Bob", "Parus major", "2024-05-01"),
            rec("http://tun.fi/JX.3#1", 2, "Cec", "Parus major", "2024-05-09")]
    return pa.Table.from_pylist(rows)


def test_csv_spec_merge_on_occurrence_records():
    enriched = ComputeAllStage(collection_names={"HR.1": "Kokoelma"})(
        _occurrence_batch())
    spec = merge_spec_from_csv(order=["Havainnon_tunniste"])
    assert len(spec.groupby) == 23 and len(spec.first) == 20
    assert spec.max == ["Paikan_tarkkuus_metreina_max"]
    ds = ray.data.from_arrow(enriched)
    out = merge_similar(ds, spec, num_buckets=2).to_pandas()
    assert len(out) == 2                       # records 1+2 merged
    merged = out[out["Yhdistetty"] == 2].iloc[0]
    # AGGREGATE columns join in id order; FIRST takes the first
    assert merged["Havainnon_tunniste"] == "http://tun.fi/JX.1#1, http://tun.fi/JX.2#1"
    assert merged["Maarittaja"] == "Ann, Bob"
    assert merged["Tieteellinen_nimi"] == "Parus major"
    single = out[out["Yhdistetty"] == 1].iloc[0]
    assert single["Havainnon_tunniste"] == "http://tun.fi/JX.3#1"


def test_get_fields_schema_and_selected():
    from laji_pygeoapi_ray import spec
    fields = spec.get_fields()
    # only queryable columns; json types mapped like the provider
    assert "Havainnon_tunniste" in fields
    assert fields["Havainnon_tunniste"]["type"] == "string"
    assert fields["Havainnon_tunniste"]["title"]  # description carried
    assert all(c.query_name for c in spec.load_spec()
               if c.virva in fields)
    ints = [v for v in fields.values() if v["type"] == "integer"]
    assert ints, "int columns must map to 'integer'"
    schema = spec.get_schema()
    assert schema["type"] == "object"
    assert set(schema["properties"]) == set(fields)
    assert all(p["type"] in {"number", "integer", "boolean", "string"}
               for p in schema["properties"].values())
    sel = spec.selected_fields()
    assert "unit.unitId" in sel.split(",")
