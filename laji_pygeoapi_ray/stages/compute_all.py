"""``compute_all`` — the fused occurrence-enrichment stage: the reference's
full per-batch transform chain (``main.py:107-112`` order):

    merge_taxonomy_data → combine_similar_columns → compute_all
    → translate_column_names → (geometry normalize/validate)

as ONE ``map_batches`` callable over an Arrow batch of raw (finbif-named)
occurrence columns. Reference semantics per step:
``process_data.py:8-23`` (regex-extract MVL id + broadcast taxonomy join),
``process_data.py:41-84``, ``compute_variables.py:199-241`` (computed
columns incl. Esiintyman_tila / Aineisto / Vastuualue / Elinvoimakeskus /
Paikallinen_tunniste), ``process_data.py:86-130``.

State (taxonomy dict, collection names, value ranges, municipality→ELY
maps) is broadcast once and bound in ``__init__`` — an actor-pool stage.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions import colops
from ..state import fixtures
from .translate import translate_columns

TAXON_GROUP_COL = "unit.linkings.taxon.informalTaxonGroups[0]"


class ComputeAllStage:
    def __init__(self, broadcast_ref=None, *, taxonomy: dict | None = None,
                 collection_names: dict | None = None,
                 value_ranges: dict | None = None):
        if broadcast_ref is not None:
            state = (ray.get(broadcast_ref)
                     if isinstance(broadcast_ref, ray.ObjectRef)
                     else broadcast_ref)
        else:
            state = {}
        self.taxonomy = state.get("taxonomy", taxonomy or {})
        self.collection_names = state.get("collection_names",
                                          collection_names or {})
        self.value_ranges = state.get("value_ranges", value_ranges or {})
        self.ely = state.get("ely", fixtures.ely_mapping())
        self.elinvoima = state.get("elinvoima", fixtures.elinvoima_mapping())

    # columns processed per compute_variables.py:154-197
    STRIP_URL_COLS = (
        "unit.atlasClass", "unit.atlasCode",
        "unit.linkings.taxon.primaryHabitat.habitat",
        "unit.linkings.taxon.latestRedListStatusFinland.status",
        "unit.linkings.taxon.threatenedStatus")
    DIRECT_MAP_COLS = (
        "unit.recordBasis", "unit.interpretations.recordQuality",
        "document.secureReasons", "unit.lifeStage", "unit.sex",
        "unit.abundanceUnit", "document.linkings.collectionQuality")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)

        def has(col):
            return col in batch.column_names

        def setcol(name, arr):
            nonlocal batch
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, arr)
            else:
                batch = batch.append_column(name, arr)

        # 1. taxonomy join: regex-extract 'MVL.\d+' (creating the column as
        #    null when absent) then broadcast-map to the group name
        #    (process_data.py:8-23)
        if has(TAXON_GROUP_COL):
            m = pc.extract_regex(pc.cast(batch[TAXON_GROUP_COL], pa.string()),
                                 r"(?P<id>MVL\.\d+)")
            ids = pc.struct_field(m, "id")
        else:
            ids = pa.nulls(n, pa.string())
        # the reference's taxonomy merge lands in column 'name' (the CSV row
        # for Elioryhma has finbif_api_var='name'); translate renames it
        setcol("name", colops.dict_map(ids, self.taxonomy))

        # 2. combine keyword[0..n]-style families (process_data.py:41-84)
        batch = colops.combine_similar_columns(batch)

        # 3. computed columns (compute_variables.py:199-241)
        if has("unit.interpretations.individualCount"):
            setcol("Esiintyman_tila", colops.compute_individual_count(
                pc.cast(batch["unit.interpretations.individualCount"],
                        pa.int64())))
        if has("document.collectionId"):
            setcol("Aineisto", colops.compute_collection_id(
                batch["document.collectionId"], self.collection_names))
        if has("gathering.interpretations.municipalityDisplayname"):
            muni = batch["gathering.interpretations.municipalityDisplayname"]
            setcol("Vastuualue", colops.compute_areas(muni, self.ely))
            setcol("Elinvoimakeskus",
                   colops.compute_areas(muni, self.elinvoima))
        for col in self.STRIP_URL_COLS:
            if has(col):
                setcol(col, colops.enum_map_strip_url(batch[col],
                                                      self.value_ranges))
        for col in self.DIRECT_MAP_COLS:
            if has(col):
                setcol(col, colops.enum_map_direct(batch[col],
                                                   self.value_ranges))
        if has("unit.unitId"):
            setcol("Paikallinen_tunniste",
                   colops.local_id_encode(batch["unit.unitId"]))

        # 4. fixed-schema projection + casts (process_data.py:86-130) —
        #    computed virva columns survive because translate keys on the
        #    output names too
        return translate_columns(batch)
