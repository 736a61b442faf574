"""Golden-record test for the fused compute_all chain (mirrors the
reference's full-record expectation, test_compute_variables.py:86-142)."""
from __future__ import annotations

import pyarrow as pa

from laji_pygeoapi_ray import spec as specmod
from laji_pygeoapi_ray.stages.compute_all import ComputeAllStage


def test_compute_all_golden_record():
    batch = pa.table({
        "unit.unitId": ["http://tun.fi/JX.1587125#3"],
        "unit.linkings.taxon.informalTaxonGroups[0]":
            ["http://tun.fi/MVL.2"],
        "unit.linkings.taxon.scientificName": ["Parus major"],
        "unit.interpretations.individualCount": [3],
        "document.collectionId": ["http://tun.fi/HR.3553"],
        "gathering.interpretations.municipalityDisplayname":
            ["Helsinki, Espoo"],
        "unit.sex": ["MALE"],
        "unit.linkings.taxon.latestRedListStatusFinland.status":
            ["http://tun.fi/MX.iucnLC"],
        "unit.keywords[0]": ["a"],
        "unit.keywords[1]": ["b"],
        "gathering.eventDate.begin": ["2024-05-01"],
        "document.loadDate": ["2024-05-02"],
        "unit.breedingSite": ["true"],
        "gathering.conversions.eurefCenterPoint.lat": [6675000.0],
        "gathering.conversions.eurefCenterPoint.lon": [385000.0],
    })
    stage = ComputeAllStage(
        taxonomy={"MVL.2": "Linnut"},
        collection_names={"HR.3553": "Lintuatlas"},
        value_ranges={"MALE": "koiras", "MX.iucnLC": "LC – elinvoimainen"})
    out = stage(batch)

    assert out.schema.names == specmod.output_schema().names   # all 57
    row = {name: out[name][0].as_py() for name in out.schema.names}
    assert row["Havainnon_tunniste"] == "http://tun.fi/JX.1587125#3"
    assert row["Paikallinen_tunniste"] == "http://tun.fi/JX.1587125_3"
    assert row["Elioryhma"] == "Linnut"               # taxonomy join
    assert row["Tieteellinen_nimi"] == "Parus major"
    assert row["Esiintyman_tila"] == "paikalla"       # count 3 > 0
    assert row["Aineisto"] == "Lintuatlas"            # collection id map
    assert row["Vastuualue"] == "Uudenmaan ELY-keskus, Uudenmaan ELY-keskus"
    assert row["Elinvoimakeskus"] == ("Uudenmaan elinvoimakeskus, "
                                      "Uudenmaan elinvoimakeskus")
    assert row["Sukupuoli"] == "koiras"               # direct enum map
    assert row["Uhanalaisuusluokka"] == "LC – elinvoimainen"  # strip-url map
    assert row["Avainsanat"] == "a, b"                # combined family
    assert str(row["Keruu_aloitus_pvm"].date()) == "2024-05-01"
    assert row["Pesintapaikka"] is True
    assert row["ETRS_TM35FIN_N"] == 6675000.0
    assert row["Yksilomaara_tulkittu"] == 3
    assert row["Maara"] is None                       # absent input → null


def test_compute_all_absent_columns():
    """Ragged input: a batch with only an id still yields the fixed schema
    (dynamic-in / fixed-out, SURVEY.md §1.3)."""
    out = ComputeAllStage()(pa.table({"unit.unitId": ["x#1", "y#2"]}))
    assert out.schema.names == specmod.output_schema().names
    assert out["Paikallinen_tunniste"].to_pylist() == ["x_1", "y_2"]
    assert out["Esiintyman_tila"].to_pylist() == [None, None]
