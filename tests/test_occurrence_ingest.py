"""The JSON ingest path: ragged nested pages → flatten → compute_all →
fixed 57-column schema (the reference's real ETL input format)."""
from __future__ import annotations

import pyarrow.parquet as pq

from laji_pygeoapi_ray import spec as specmod
from laji_pygeoapi_ray.pipelines.etl import run_occurrence_etl
from laji_pygeoapi_ray.sources import occurrence_json as occ


def test_occurrence_etl_end_to_end(tmp_path):
    src = occ.synth_occurrence_jsonl(300, str(tmp_path / "pages"))
    out = str(tmp_path / "enriched")
    summary = run_occurrence_etl(src, out)
    assert summary["rows"] == 300

    t = pq.read_table(out)
    assert t.schema.names == specmod.output_schema().names   # all 57
    rows = {r["Havainnon_tunniste"]: r for r in t.to_pylist()}

    # full record (n=1: has count, gathering, sex FEMALE? n%3==1 -> 'FEMALE')
    r1 = rows["http://tun.fi/JX.1#1"]
    assert r1["Paikallinen_tunniste"] == "http://tun.fi/JX.1_1"
    assert r1["Elioryhma"] == occ.TAXONOMY[list(occ.TAXONOMY)[1]]
    assert r1["Sukupuoli"] == "naaras"
    assert r1["Esiintyman_tila"] == "paikalla"        # count 1 > 0
    assert r1["Avainsanat"] == "kw0"                  # 1 keyword
    assert r1["Vastuualue"] is not None               # municipality present

    # ragged record (n=0: no count, no keywords; n%4==0 -> no gathering
    # block at all; sex=MALE present)
    r0 = rows["http://tun.fi/JX.0#0"]
    assert r0["Esiintyman_tila"] is None or r0["Esiintyman_tila"] == ""
    assert r0["Sukupuoli"] == "koiras"
    assert r0["Avainsanat"] is None
    assert r0["Kunta"] is None
    assert r0["Vastuualue"] is None                   # no municipality
    # n=2: sex slot None -> null survives the whole chain
    assert rows["http://tun.fi/JX.2#2"]["Sukupuoli"] is None

    # counts by taxonomy group match the generative rule
    import collections
    got = collections.Counter(t["Elioryhma"].to_pylist())
    exp = collections.Counter(
        occ.TAXONOMY[list(occ.TAXONOMY)[n % 5]] for n in range(300))
    assert got == exp
