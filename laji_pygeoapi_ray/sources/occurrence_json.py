"""The reference's REAL input format: paged occurrence JSON.

``load_data.py`` downloads warehouse pages of nested occurrence JSON and
flattens them with ``pandas.json_normalize`` (dotted column names) before
the enrich chain. This module provides the same path for the engine:

- :func:`synth_occurrence_jsonl` — a deterministic ragged JSONL corpus
  (nested finbif-shaped records; fields drop out per-record, keyword
  arrays vary in length) standing in for the API pages;
- :func:`read_occurrence_json` — ``ray.data.read_json`` + a vectorized
  flatten stage producing the dotted-name columns ``ComputeAllStage``
  consumes (``unit.keywords`` list → ``unit.keywords[i]`` columns, the
  json_normalize convention the reference's combine step expects).

Everything is deterministic so the DuckDB oracle can read the SAME JSONL
with ``read_json_auto`` and agree bit-for-bit.
"""
from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data

TAXONOMY = {
    "MVL.1": "Nisäkkäät",
    "MVL.2": "Linnut",
    "MVL.21": "Putkilokasvit",
    "MVL.27": "Sienet",
    "MVL.31": "Hämähäkkieläimet",
}
COLLECTIONS = {"HR.1": "Atlas A", "HR.2": "Atlas B", "HR.3": "Atlas C"}
_MUNIS = ("Helsinki", "Espoo", "Alavieska", "Akaa")
_SEXES = ("MALE", "FEMALE", None)

JSONL_VERSION = 1


def occurrence_record(n: int) -> dict:
    """Deterministic ragged nested record n (the API page-row shape)."""
    mvl = list(TAXONOMY) [n % len(TAXONOMY)]
    rec: dict = {
        "unit": {
            "unitId": f"http://tun.fi/JX.{n}#{n % 7}",
            "linkings": {"taxon": {
                "scientificName": f"Species no{n % 97}",
                "informalTaxonGroups": [f"http://tun.fi/{mvl}"],
            }},
        },
        "document": {"collectionId":
                     f"http://tun.fi/HR.{n % len(COLLECTIONS) + 1}"},
    }
    # raggedness: fields drop out deterministically
    if n % 3 != 0:
        rec["unit"]["interpretations"] = {"individualCount": n % 5}
    if n % 4 != 0:
        rec["gathering"] = {
            "interpretations": {
                "municipalityDisplayname": _MUNIS[n % len(_MUNIS)]},
            "eventDate": {"begin": f"2024-03-{n % 28 + 1:02d}"},
        }
    if _SEXES[n % 3] is not None:
        rec["unit"]["sex"] = _SEXES[n % 3]
    kw = [f"kw{j}" for j in range(n % 3)]
    if kw:
        rec["unit"]["keywords"] = kw
    return rec


def synth_occurrence_jsonl(n: int, base_dir: str = "/tmp/laji_ray_occjson",
                           *, shards: int = 4) -> str:
    """Write n deterministic records as sharded JSONL (≙ API pages);
    idempotent via a done-marker."""
    from ..state.spill import claim_layout

    out = os.path.join(base_dir, f"n{n}v{JSONL_VERSION}")

    def build(tmp: str) -> None:
        for s in range(shards):
            with open(os.path.join(tmp, f"page_{s:04d}.jsonl"), "w") as f:
                for i in range(s, n, shards):
                    f.write(json.dumps(occurrence_record(i),
                                       sort_keys=True) + "\n")

    return claim_layout(out, build, marker_text=str(n))


MAX_KEYWORDS = 4   # keyword-array expansion bound (json_normalize analogue)


def flatten_occurrences(df: pd.DataFrame) -> pd.DataFrame:
    """Nested records → dotted columns (the json_normalize convention),
    with list-valued ``unit.keywords`` expanded to ``unit.keywords[i]``
    columns. ray.data.read_json yields struct columns → pandas dicts; one
    json_normalize call per batch flattens every level."""
    flat = pd.json_normalize(df.to_dict("records"), sep=".")
    # informalTaxonGroups comes out as a list column → take element [0]
    def _elem(v, i):
        # list values may arrive as list, tuple or numpy array (Arrow
        # list columns round-trip to ndarray through pandas)
        if v is None or isinstance(v, float):
            return None
        try:
            return v[i] if len(v) > i else None
        except TypeError:
            return None

    itg = "unit.linkings.taxon.informalTaxonGroups"
    if itg in flat.columns:
        flat[itg + "[0]"] = flat[itg].map(lambda v: _elem(v, 0))
        flat = flat.drop(columns=[itg])
    kw = "unit.keywords"
    if kw in flat.columns:
        for i in range(MAX_KEYWORDS):
            flat[f"{kw}[{i}]"] = flat[kw].map(lambda v, i=i: _elem(v, i))
        flat = flat.drop(columns=[kw])
    return flat


def read_occurrence_json(path: str) -> "ray.data.Dataset":
    """JSONL pages → Dataset of flat dotted-name columns (ragged-in,
    ragged-out; the fixed 57-column projection happens downstream in
    ``translate_columns``)."""
    ds = ray.data.read_json(
        sorted(os.path.join(path, f) for f in os.listdir(path)
               if f.endswith(".jsonl")))
    return ds.map_batches(flatten_occurrences, batch_format="pandas")
