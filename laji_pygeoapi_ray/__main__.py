"""CLI entry point — the ``ray job submit`` surface (north rule: runs are
launched as Ray jobs on a fixed-size cluster; locally the same module runs
standalone).

    ray job submit -- python -m laji_pygeoapi_ray etl --sf-dir /root/testdata/sf0.01 --out /tmp/laji_out
    python -m laji_pygeoapi_ray maintenance --out /tmp/laji_out      # dedup + metadata + cell index
    python -m laji_pygeoapi_ray geometry-etl --out /tmp/geom         # (province, geom_type) hive sink
    python -m laji_pygeoapi_ray ingest --input events.parquet --out /tmp/inc   # watermark incremental
    python -m laji_pygeoapi_ray query --out /tmp/laji_out --bbox 60.0,24.6,60.4,25.3 \
        --filter "Eliomaakunta=Uusimaa (U)" [--geojson]              # pruned + filtered serving
    python -m laji_pygeoapi_ray get --id "http://tun.fi/JX.42_0"     # single record
    python -m laji_pygeoapi_ray print-log [--limit 100]              # request audit log
    python -m laji_pygeoapi_ray bench [--scaling]

Owns its Ray session (guarded init + shutdown), per the driver contract —
library code never calls ray.init.
"""
from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="laji_pygeoapi_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("etl", help="enrich+append with per-shard resume")
    pe.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pe.add_argument("--out", required=True)
    pe.add_argument("--shards", type=int, default=4)
    pe.add_argument("--no-resume", action="store_true")

    pm = sub.add_parser("maintenance", help="dedup + metadata pass")
    pm.add_argument("--out", required=True)

    pg = sub.add_parser("geometry-etl", help="mixed-geometry ETL with the "
                        "(province, geom_type)-partitioned sink")
    pg.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pg.add_argument("--out", required=True)

    pi = sub.add_parser("ingest", help="watermark-filtered incremental "
                        "ingest (PAGES=latest analogue)")
    pi.add_argument("--input", required=True,
                    help="parquet file/dir with a ts column")
    pi.add_argument("--out", required=True)

    pq = sub.add_parser("query", help="bbox/property query over ETL output")
    pq.add_argument("--out", required=True)
    pq.add_argument("--bbox", required=True,
                    help="ymin,xmin,ymax,xmax (pygeoapi order)")
    pq.add_argument("--limit", type=int, default=100)
    pq.add_argument("--offset", type=int, default=0)
    pq.add_argument("--geojson", action="store_true",
                    help="emit an OGC-style FeatureCollection")
    pq.add_argument("--filter", action="append", default=[],
                    metavar="NAME=VALUE",
                    help="virva property filter, translated then executed "
                         "(repeatable)")

    pget = sub.add_parser("get", help="single record by local id "
                          "(GET /items/{id})")
    pget.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pget.add_argument("--id", required=True, dest="local_id")

    pb = sub.add_parser("bench", help="run the benchmark")
    pb.add_argument("--scaling", action="store_true")

    pc_ = sub.add_parser("build-corpus", help="composed training-corpus "
                         "build (decode -> quality -> dedup -> split -> "
                         "PIP -> hive sink)")
    pc_.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pc_.add_argument("--out", required=True)

    pl = sub.add_parser("print-log", help="show the request audit log "
                        "(reference print_log command)")
    pl.add_argument("--log", default="/tmp/laji_ray_requests.jsonl")
    pl.add_argument("--limit", type=int, default=100)

    args = p.parse_args(argv)

    if args.cmd == "print-log":
        from .state.request_log import format_log, read_log
        print(format_log(read_log(args.log, args.limit)))
        return 0

    if args.cmd == "bench":
        import os
        import subprocess
        cmd = [sys.executable, "bench.py"] + (["--scaling"] if args.scaling else [])
        return subprocess.call(cmd, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

    _ensure_ray(args.num_cpus)
    import ray
    try:
        if args.cmd == "etl":
            from .pipelines.etl import run_etl
            m = run_etl(args.sf_dir, args.out, shards=args.shards,
                        resume=not args.no_resume)
            print(json.dumps({"shards_done": len(m.data["shards"]),
                              "manifest": m.path}))
        elif args.cmd == "maintenance":
            from .pipelines.etl import run_maintenance
            meta = run_maintenance(args.out)
            print(json.dumps({"total": meta["total"],
                              "collections": len(meta["collections"])}))
        elif args.cmd == "geometry-etl":
            from .pipelines.etl import run_geometry_etl
            print(json.dumps(run_geometry_etl(args.sf_dir, args.out)))
        elif args.cmd == "build-corpus":
            from .pipelines.corpus import build_training_corpus
            _, counters = build_training_corpus(args.sf_dir, args.out)
            print(json.dumps(counters))
        elif args.cmd == "ingest":
            from .pipelines.etl import run_incremental_ingest
            print(json.dumps(run_incremental_ingest(args.input, args.out)))
        elif args.cmd == "get":
            import datetime as _dt

            from .pipelines.filter_queries import fetch_by_local_id
            from .state.request_log import log_request
            log_request("/tmp/laji_ray_requests.jsonl",
                        path="/collections/items/" + args.local_id,
                        query_string="", date=_dt.datetime.now()
                        .isoformat(timespec="seconds"))
            rows = fetch_by_local_id(args.sf_dir, args.local_id).take_all()
            if not rows:
                print(json.dumps({"error": "not found",
                                  "id": args.local_id}))
                return 1
            print(json.dumps(rows[0], default=str))
        elif args.cmd == "query":
            import os

            import ray.data

            from .functions import cells as _cells
            from .pipelines.query import bbox_query, process_bbox
            from .pipelines.serving import Binding, apply_filters
            from .sources.parquet import read_cell_pruned
            merged = os.path.join(args.out, "merged")
            bbox = [float(v) for v in args.bbox.split(",")]
            x0, y0, x1, y1 = process_bbox(bbox)
            ds = read_cell_pruned(merged,
                                  _cells.cover_bbox(x0, y0, x1, y1, 7))
            if args.filter:
                props = [tuple(f.split("=", 1)) for f in args.filter]
                from .state import fixtures
                bindings = {
                    "biogeographicalProvinceId": Binding(
                        "province", decode=lambda v:
                        fixtures.PROVINCE_ID_MAPPING.get(v, v)),
                    "finnishMunicipalityId": Binding("municipality"),
                    "fmt": Binding("fmt"),
                }
                ds = apply_filters(ds, props, bindings)
            t = bbox_query(ds, bbox, limit=args.limit, offset=args.offset)
            if args.geojson:
                from .pipelines.features import to_feature_collection
                drop = [c for c in ("bytes",) if c in t.column_names]
                print(json.dumps(to_feature_collection(
                    t.drop_columns(drop) if drop else t,
                    id_col="local_id")))
            else:
                cols = [c for c in ("image_id", "x", "y", "province",
                                    "municipality") if c in t.column_names]
                sample = (t.select(cols).slice(0, 3).to_pylist()
                          if t.num_rows else [])
                print(json.dumps({"rows": t.num_rows, "sample": sample},
                                 default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
