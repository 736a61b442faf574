"""Golden-value tests for the per-batch column operators, mirroring the
reference's unit tests (test_process_data.py / test_compute_variables.py)."""
from __future__ import annotations

import pyarrow as pa
import pytest

from laji_pygeoapi_ray import spec as specmod
from laji_pygeoapi_ray.functions import colops
from laji_pygeoapi_ray.stages.translate import translate_columns


def test_spec_counts():
    mc = specmod.merge_columns()
    assert len(specmod.load_spec()) == 57
    assert len(mc["GROUPBY"]) == 23
    assert len(mc["FIRST"]) == 20
    assert len(mc["AGGREGATE"]) == 11
    assert len(mc["MAX"]) == 1
    assert specmod.output_schema().names[0] == "Havainnon_tunniste"


def test_combine_similar_columns():
    t = pa.table({
        "keyword[0]": ["a", None, None],
        "keyword[1]": ["b", "c", None],
        "other": [1, 2, 3],
    })
    out = colops.combine_similar_columns(t)
    assert out["keyword"].to_pylist() == ["a, b", "c", None]
    assert "keyword[0]" not in out.column_names
    assert out["other"].to_pylist() == [1, 2, 3]


def test_individual_count():
    col = pa.array([5, 0, -1, None], pa.int64())
    assert colops.compute_individual_count(col).to_pylist() == \
        ["paikalla", "poissa", "poissa", None]


def test_collection_id():
    col = pa.array(["http://tun.fi/HR.3553", "HR.1", "http://tun.fi/HR.9"])
    names = {"HR.3553": "Long name", "HR.1": "Other"}
    assert colops.compute_collection_id(col, names).to_pylist() == \
        ["Long name", "Other", None]


def test_map_values_multivalue_and_url_strip():
    col = pa.array(["http://tun.fi/MY.1, MY.2", "MY.3", None])
    vr = {"MY.1": "yksi", "MY.2": "kaksi"}
    assert colops.map_values(col, vr).to_pylist() == \
        ["yksi, kaksi", "MY.3", None]   # miss keeps original value


def test_compute_areas_multimunicipality():
    col = pa.array(["Helsinki, Espoo", "Tuntematon", None])
    ely = {"Helsinki": "Uudenmaan ELY-keskus", "Espoo": "Uudenmaan ELY-keskus"}
    out = colops.compute_areas(col, ely).to_pylist()
    assert out == ["Uudenmaan ELY-keskus, Uudenmaan ELY-keskus",
                   "Tuntematon", None]


def test_enum_maps():
    vr = {"MX.1": "Elävä"}
    assert colops.enum_map_strip_url(
        pa.array(["http://tun.fi/MX.1", "MX.2"]), vr).to_pylist() == \
        ["Elävä", None]
    assert colops.enum_map_direct(
        pa.array(["MX.1", "zzz"]), vr).to_pylist() == ["Elävä", None]


def test_local_id_roundtrip():
    ids = pa.array(["http://tun.fi/JX.1#5", "plain"])
    enc = colops.local_id_encode(ids)
    assert enc.to_pylist() == ["http://tun.fi/JX.1_5", "plain"]
    assert colops.local_id_decode(enc).to_pylist() == \
        ["http://tun.fi/JX.1#5", "plain"]


def test_translate_columns_dynamic_in_fixed_out():
    t = pa.table({
        "unit.unitId": ["http://tun.fi/JX.1#2"],
        "unit.interpretations.individualCount": ["7"],       # str → int64
        "gathering.eventDate.begin": ["2024-05-01"],         # str → ts
        "unit.breedingSite": ["True"],                       # str → bool
        "gathering.conversions.eurefCenterPoint.lat": ["6675000.5"],
        "unexpected_column": ["drop me"],
    })
    out = translate_columns(t)
    schema = specmod.output_schema()
    assert out.schema.names == schema.names          # exact order, all 57
    assert out["Havainnon_tunniste"].to_pylist() == ["http://tun.fi/JX.1#2"]
    assert out["Yksilomaara_tulkittu"].to_pylist() == [7]
    assert out["Yksilomaara_tulkittu"].type == pa.int64()
    assert str(out["Keruu_aloitus_pvm"][0].as_py().date()) == "2024-05-01"
    assert out["Pesintapaikka"].to_pylist() == [True]
    assert out["ETRS_TM35FIN_N"].to_pylist() == [6675000.5]
    assert out["Tieteellinen_nimi"].to_pylist() == [None]    # missing → null
    assert "unexpected_column" not in out.schema.names       # unlisted dropped


def test_translate_bool_none_and_bad_date():
    t = pa.table({
        "unit.breedingSite": ["none", "false", "TRUE"],
        "gathering.eventDate.begin": ["not-a-date", "2020-01-02", None],
    })
    out = translate_columns(t)
    assert out["Pesintapaikka"].to_pylist() == [None, False, True]
    dts = out["Keruu_aloitus_pvm"].to_pylist()
    assert dts[0] is None and str(dts[1].date()) == "2020-01-02" and dts[2] is None


@pytest.mark.parametrize("name", ["individual_count_events",
                                  "collection_id_part"])
def test_compute_query_matches_oracle(name):
    from tests.conftest import SF_UNIT, assert_query_matches_oracle
    assert_query_matches_oracle(name, SF_UNIT)
