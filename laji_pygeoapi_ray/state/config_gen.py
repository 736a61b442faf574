"""Serving-config generation — ``edit_config.py`` re-expressed for the
engine's partitioned-Parquet sink.

The reference regenerates its pygeoapi YAML after every ETL: one collection
block per (province, geom_type) PostGIS table, filled from a template with
bbox/temporal extents, counts and the provider binding
(``edit_config.py:38-58`` + ``resources/template_resource.txt``). The
engine's tables are hive partition directories, so the generator walks
``province=<name>/geom_group=<type>/`` under the ETL output and emits the
same structure as JSON: title, description
('<n> <geom_type>s from the <province> biogeographical area'), spatial
extent (from the Parquet column statistics — no data scan), and a provider
block binding the partition path with the reference's field names
(id_field Paikallinen_tunniste, time_field Keruu_aloitus_pvm, …). The
``occurrence-metadata`` collection heads the dict exactly like
``add_resources_to_config``.
"""
from __future__ import annotations

import glob
import os
import urllib.parse

import pyarrow.parquet as pq

CRS_LIST = ["https://www.opengis.net/def/crs/EPSG/0/4326",
            "https://www.opengis.net/def/crs/EPSG/0/3067"]

METADATA_COLLECTION = {
    "type": "collection",
    "title": "Occurrence Metadata",
    "description": ("This metadata record contains metadata of the all "
                    "collections in this service"),
    "keywords": ["metadata", "record"],
    "extents": {"spatial": {
        "bbox": [19.08317359, 59.45414258, 31.58672881, 70.09229553],
        "crs": "https://www.opengis.net/def/crs/EPSG/0/3067"}},
}


def _partition_stats(files: list[str]) -> tuple[int, list[float]]:
    """(row count, [x0, y0, x1, y1]) from Parquet row-group statistics —
    metadata only, no data pages are read."""
    rows = 0
    x0 = y0 = float("inf")
    x1 = y1 = float("-inf")
    for f in files:
        md = pq.read_metadata(f)
        rows += md.num_rows
        schema_names = md.schema.to_arrow_schema().names
        xi = schema_names.index("x") if "x" in schema_names else None
        yi = schema_names.index("y") if "y" in schema_names else None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            if xi is not None and g.column(xi).statistics:
                s = g.column(xi).statistics
                x0, x1 = min(x0, s.min), max(x1, s.max)
            if yi is not None and g.column(yi).statistics:
                s = g.column(yi).statistics
                y0, y1 = min(y0, s.min), max(y1, s.max)
    bbox = ([x0, y0, x1, y1] if x1 >= x0 else [])
    return rows, bbox


def generate_serving_config(etl_out_dir: str) -> dict:
    """Hive-partitioned ETL output → the per-table collections config."""
    config: dict = {"occurrence-metadata": dict(METADATA_COLLECTION)}
    prov_dirs = sorted(glob.glob(os.path.join(etl_out_dir, "province=*")))
    for pd_ in prov_dirs:
        province = urllib.parse.unquote(
            os.path.basename(pd_).split("=", 1)[1])
        for gd in sorted(glob.glob(os.path.join(pd_, "geom_group=*"))):
            geom = os.path.basename(gd).split("=", 1)[1]
            files = sorted(glob.glob(os.path.join(gd, "*.parquet")))
            if not files:
                continue
            rows, bbox = _partition_stats(files)
            name = f"{province.lower().replace(' ', '_')}_{geom.lower()}s"
            config[name] = {
                "type": "collection",
                "title": name,
                "description": (f"{rows} {geom}s from the {province} "
                                f"biogeographical area."),
                "keywords": [province, "occurrence data"],
                "extents": {"spatial": {
                    "bbox": bbox,
                    "crs": CRS_LIST[0]}},
                "providers": [{
                    "type": "feature",
                    "name": "RayParquet",
                    "data": gd,
                    "id_field": "Paikallinen_tunniste",
                    "uri": "Havainnon_tunniste",
                    "geom_field": "geometry",
                    "time_field": "Keruu_aloitus_pvm",
                    "title_field": "Suomenkielinen_nimi",
                    "crs": CRS_LIST,
                }],
            }
    return config
