"""ETL checkpoint/resume: a resumed run must produce exactly the same merged
output as a clean run (checkpoint commutes with dedup, SURVEY.md §7.4)."""
from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.parquet as pq

from laji_pygeoapi_ray.pipelines import etl
from tests.conftest import SF_UNIT

OUT_A = "/tmp/laji_etl_test_clean"
OUT_B = "/tmp/laji_etl_test_resume"


def _merged_table(out_dir):
    import pyarrow.dataset as pads
    t = pads.dataset(os.path.join(out_dir, "merged"), format="parquet",
                     partitioning="hive").to_table()
    # hive partition values come back dictionary-encoded; normalize
    t = t.set_column(t.schema.get_field_index("province"), "province",
                     t["province"].cast("string"))
    return t.sort_by([("image_id", "ascending")])


def test_etl_clean_then_resume_identical():
    for d in (OUT_A, OUT_B):
        shutil.rmtree(d, ignore_errors=True)

    # clean run
    m = etl.run_etl(SF_UNIT, OUT_A, shards=4)
    etl.run_maintenance(OUT_A)
    assert len(m.data["shards"]) == 4
    assert all(s["status"] == "done" for s in m.data["shards"].values())
    # lineage recorded
    any_shard = next(iter(m.data["shards"].values()))
    assert any_shard["input_files"] and any_shard["rows"] > 0

    # interrupted run: do a full run, then delete one shard + its marker to
    # simulate a crash mid-run; resume must redo ONLY that shard
    m2 = etl.run_etl(SF_UNIT, OUT_B, shards=4)
    victim = "shard_0002"
    shutil.rmtree(os.path.join(OUT_B, "shards", victim))
    m2.data["shards"].pop(victim)
    m2.save()
    before = {s: os.path.getmtime(os.path.join(OUT_B, "shards", s))
              for s in m2.data["shards"]}
    m3 = etl.run_etl(SF_UNIT, OUT_B, shards=4, resume=True)
    assert m3.is_done(victim)
    for s, t in before.items():  # untouched shards not rewritten
        assert os.path.getmtime(os.path.join(OUT_B, "shards", s)) == t
    etl.run_maintenance(OUT_B)

    a, b = _merged_table(OUT_A), _merged_table(OUT_B)
    assert a.equals(b), "resumed run differs from clean run"

    # metadata written with per-province bbox/count + PSNR floor
    meta = json.load(open(os.path.join(OUT_A, "metadata.json")))
    assert meta["total"] == a.num_rows
    assert all(c["min_psnr_db"] >= 40.0 for c in meta["collections"])
    # dedup keeps exactly one row per distinct phash (planted dups at
    # n%50==17 plus accidental ahash collisions — realistic perceptual-hash
    # behavior on smooth procedural images)
    import pyarrow.compute as pc
    from laji_pygeoapi_ray.sources.images import images_table
    src = images_table(400)
    assert a.num_rows == len(pc.unique(src["phash"]))
    kept = set(a["image_id"].to_pylist())
    family = [n for n in range(400) if n % 50 == 17]   # all share pixels
    ids = [f"http://tun.fi/IMG.{n}#{n % 7}" for n in family]
    keeper = min(ids)                                   # lexicographic min
    assert keeper in kept
    for i in ids:
        if i != keeper:
            assert i not in kept


def test_transform_version_invalidates():
    from laji_pygeoapi_ray.state.checkpoint import RunManifest
    d = "/tmp/laji_etl_test_tv"
    shutil.rmtree(d, ignore_errors=True)
    m = RunManifest(d, "v1")
    m.mark_done("shard_0000", input_files=["f"], rows=1)
    m2 = RunManifest(d, "v2")
    assert not m2.is_done("shard_0000")  # stale lineage → redo


def test_etl_degrade_dont_die_on_poisoned_shard(tmp_path):
    """A corrupt input file fails ITS shard only: the run completes the
    other shards, records the failure with lineage, and a resume after the
    input is repaired retries just that shard (reference behavior:
    failed pages are accounted and the job continues, load_data.py:231)."""
    import glob as _glob

    from laji_pygeoapi_ray.sources.images import materialize_images
    from laji_pygeoapi_ray.pipelines.image_queries import n_images_for

    src = materialize_images(n_images_for(SF_UNIT))
    work = tmp_path / "imgs"
    shutil.copytree(src, work)
    files = sorted(_glob.glob(str(work / "*.parquet")))
    good = files[0]
    poisoned = files[1]
    backup = poisoned + ".bak"
    shutil.copy(poisoned, backup)
    with open(poisoned, "wb") as f:
        f.write(b"not a parquet file")

    out = tmp_path / "out"
    import laji_pygeoapi_ray.pipelines.etl as etl_mod
    import laji_pygeoapi_ray.sources.images as imgs_mod
    orig = imgs_mod.materialize_images
    try:
        imgs_mod.materialize_images = lambda *a, **k: str(work)
        m = etl_mod.run_etl(SF_UNIT, str(out), shards=4)
        statuses = {k: v["status"] for k, v in m.data["shards"].items()}
        assert list(statuses.values()).count("failed") == 1
        assert list(statuses.values()).count("done") == 3
        failed_id = next(k for k, v in statuses.items() if v == "failed")
        assert "error" in m.data["shards"][failed_id]
        assert m.data["counters"]["shards_failed"] == 1
        # repair + resume: only the failed shard reruns
        shutil.copy(backup, poisoned)
        m2 = etl_mod.run_etl(SF_UNIT, str(out), shards=4)
        assert all(v["status"] == "done" for v in m2.data["shards"].values())
        assert m2.data["counters"]["shards_failed"] == 0
    finally:
        imgs_mod.materialize_images = orig


def test_geometry_etl_partitioned_sink(tmp_path):
    """(province, geom_group) hive layout, total preserved, groups correct."""
    import glob
    import os

    import pyarrow.parquet as pq

    from laji_pygeoapi_ray.pipelines.etl import run_geometry_etl
    from tests.conftest import SF_UNIT

    out = str(tmp_path / "geom_out")
    summary = run_geometry_etl(SF_UNIT, out)
    assert summary["rows"] == 500
    dirs = {os.path.relpath(os.path.dirname(f), out)
            for f in glob.glob(os.path.join(out, "**", "*.parquet"),
                               recursive=True)}
    # hive partition dirs province=<name>/geom_group=<type>
    assert all("province=" in d and "geom_group=" in d for d in dirs)
    groups = {d.split("geom_group=")[1] for d in dirs}
    assert groups <= {"Point", "LineString", "Polygon"}
    assert "LineString" in groups and "Polygon" in groups
    # re-read respects partition columns and preserves every record
    import duckdb
    con = duckdb.connect()
    back = con.sql(
        f"SELECT geom_group FROM read_parquet('{out}/**/*.parquet', "
        f"hive_partitioning=1)").arrow()
    assert back.num_rows == 500
    import collections
    got = collections.Counter(
        g for g in back["geom_group"].to_pylist())
    exp = collections.Counter(
        {"Point": sum(1 for i in range(500) if i % 10 in (0, 1, 2, 3, 4, 5, 9)),
         "LineString": sum(1 for i in range(500) if i % 10 == 6),
         "Polygon": sum(1 for i in range(500) if i % 10 in (7, 8))})
    assert got == exp


def test_incremental_watermark_ingest(tmp_path):
    """Incremental (half then rest-with-watermark) == one full ingest."""
    import duckdb

    from laji_pygeoapi_ray.pipelines.etl import run_incremental_ingest
    from tests.conftest import SF_UNIT

    src = f"{SF_UNIT}/events.parquet"
    con = duckdb.connect()
    cut = con.sql(f"SELECT median(ts) FROM read_parquet('{src}')").fetchone()[0]
    early = str(tmp_path / "early.parquet")
    con.sql(f"COPY (SELECT * FROM read_parquet('{src}') WHERE ts < "
            f"TIMESTAMP '{cut}') TO '{early}' (FORMAT PARQUET)")

    inc_dir = str(tmp_path / "inc")
    s1 = run_incremental_ingest(early, inc_dir)
    assert s1["watermark"] is not None
    # second run: full input, but only rows >= watermark are read
    s2 = run_incremental_ingest(src, inc_dir)
    total = con.sql(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    assert s2["delta_rows"] < total          # the watermark pruned the read
    assert s2["current_rows"] == total       # nothing lost, dups collapsed

    full_dir = str(tmp_path / "full")
    s3 = run_incremental_ingest(src, full_dir)
    a = con.sql(f"SELECT * FROM read_parquet('{inc_dir}/current/*.parquet') "
                f"ORDER BY event_id").df()
    b = con.sql(f"SELECT * FROM read_parquet('{full_dir}/current/*.parquet') "
                f"ORDER BY event_id").df()
    import pandas as pd
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_incremental_window_counts_equals_batch(tmp_path):
    """Folding 4 arbitrary micro-batch slices into the window-count view
    equals one batch recompute (incremental maintenance commutes)."""
    import duckdb
    import ray.data

    from laji_pygeoapi_ray.pipelines.etl import incremental_window_counts
    from tests.conftest import SF_UNIT

    src = f"{SF_UNIT}/events.parquet"
    state = str(tmp_path / "window_state")
    con = duckdb.connect()
    # 4 slices by event_id stripe (arbitrary, NOT time-ordered — order
    # independence is the point)
    for k in range(4):
        sl = str(tmp_path / f"slice{k}.parquet")
        con.sql(f"COPY (SELECT * FROM read_parquet('{src}') "
                f"WHERE event_id % 4 = {k}) TO '{sl}' (FORMAT PARQUET)")
        incremental_window_counts(ray.data.read_parquet(sl), state)

    got = con.sql(f'SELECT event_type, "window", n FROM '
                  f"read_parquet('{state}/*.parquet') ORDER BY 1, 2").df()
    exp = con.sql(f"""
        SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 3600000000
                 AS "window", CAST(COUNT(*) AS BIGINT) AS n
        FROM read_parquet('{src}') GROUP BY 1, 2 ORDER BY 1, 2""").df()
    import pandas as pd
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True),
                                  check_dtype=False)


def test_compact_parquet_preserves_content(tmp_path):
    """Compaction merges many small delta files into few, byte-identical
    content (the ingest path's small-files maintenance)."""
    import duckdb

    from laji_pygeoapi_ray.pipelines.etl import (compact_parquet,
                                                 run_incremental_ingest)
    from tests.conftest import SF_UNIT

    src = f"{SF_UNIT}/events.parquet"
    out = str(tmp_path / "inc")
    con = duckdb.connect()
    # several small deltas -> many small files under current/
    for k in range(3):
        sl = str(tmp_path / f"s{k}.parquet")
        con.sql(f"COPY (SELECT * FROM read_parquet('{src}') "
                f"WHERE event_id % 3 = {k}) TO '{sl}' (FORMAT PARQUET)")
        run_incremental_ingest(sl, out)
    cur = f"{out}/current"
    before = con.sql(f"SELECT * FROM read_parquet('{cur}/*.parquet') "
                     f"ORDER BY event_id").df()
    summary = compact_parquet(cur, target_mb=64)
    assert summary["files_after"] <= summary["files_before"]
    assert summary["files_after"] == 1        # tiny data -> one file
    after = con.sql(f"SELECT * FROM read_parquet('{cur}/*.parquet') "
                    f"ORDER BY event_id").df()
    import pandas as pd
    pd.testing.assert_frame_equal(before.reset_index(drop=True),
                                  after.reset_index(drop=True))


def test_error_report_rendering():
    from laji_pygeoapi_ray.state.checkpoint import render_error_report
    data = {"shards": {
        "shard_0000": {"status": "done"},
        "shard_0001": {"status": "failed",
                       "error": "ArrowInvalid: not a parquet file",
                       "input_files": ["a.parquet"]},
    }}
    rep = render_error_report(data, context="weekly run",
                              timestamp="2026-08-17T00:00:00")
    assert "[Laji-PyGeoAPI Error] weekly run" in rep
    assert "shard_0001" in rep and "ArrowInvalid" in rep
    assert "a.parquet" in rep
    # no failures -> None (reference skips sending)
    assert render_error_report({"shards": {"s": {"status": "done"}}}) is None


def test_serving_config_generation(tmp_path):
    """edit_config parity: one collection per (province, geom_type)
    partition with counts, bbox from Parquet stats, and the provider
    binding; occurrence-metadata heads the dict."""
    from laji_pygeoapi_ray.pipelines.etl import run_geometry_etl
    from laji_pygeoapi_ray.state.config_gen import generate_serving_config
    from tests.conftest import SF_UNIT

    out = str(tmp_path / "geom_out")
    run_geometry_etl(SF_UNIT, out)
    cfg = generate_serving_config(out)
    keys = list(cfg)
    assert keys[0] == "occurrence-metadata"
    # one entry per hive partition (+ the metadata record)
    import glob as _g
    import os as _os
    n_parts = len({_os.path.dirname(f) for f in _g.glob(
        _os.path.join(out, "**", "*.parquet"), recursive=True)})
    assert len(cfg) == n_parts + 1
    # pick a point collection and check its contract
    some = next(k for k in keys if k.endswith("_points"))
    c = cfg[some]
    assert c["providers"][0]["id_field"] == "Paikallinen_tunniste"
    assert c["providers"][0]["time_field"] == "Keruu_aloitus_pvm"
    assert "biogeographical area" in c["description"]
    x0, y0, x1, y1 = c["extents"]["spatial"]["bbox"]
    assert 19.0 < x0 <= x1 < 32.0 and 59.0 < y0 <= y1 < 71.0
    # counts in descriptions sum to the corpus size
    import re as _re
    total = sum(int(_re.match(r"(\d+) ", cfg[k]["description"]).group(1))
                for k in keys if k != "occurrence-metadata")
    assert total == 500


def test_retry_and_ttl_cache_semantics():
    """fetch_json_with_retry / load_or_update_cache parity (injected
    clock+sleep; no real waiting)."""
    from laji_pygeoapi_ray.sources.retry import TTLCache, with_retries

    calls = {"n": 0}
    slept = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return {"ok": True}

    out = with_retries(flaky, max_retries=5, delay=7,
                       sleep=slept.append)
    assert out == {"ok": True} and calls["n"] == 3
    assert slept == [7, 7]                      # delay between attempts
    # exhaustion -> None (reference returns None, caller degrades)
    assert with_retries(lambda: 1 / 0, max_retries=2, delay=1,
                        sleep=slept.append) is None

    t = {"now": 1000.0}
    cache = TTLCache(timeout=100, clock=lambda: t["now"])
    loads = {"n": 0}

    def loader():
        loads["n"] += 1
        return loads["n"]

    assert cache.load_or_update("k", loader) == 1
    t["now"] += 50
    assert cache.load_or_update("k", loader) == 1   # still valid
    t["now"] += 100
    assert cache.load_or_update("k", loader) == 2   # expired -> reload


def test_cell_index_prunes_files():
    """update_indexes analogue: tile-sorted sink + per-file cell ranges =>
    a bbox-cover read touches a strict subset of files, same rows."""
    import glob
    import os

    import ray.data

    from laji_pygeoapi_ray.functions import cells as C
    from laji_pygeoapi_ray.sources.parquet import (build_cell_index,
                                                   read_cell_pruned)

    # reuse the clean-run maintenance output (tile-sorted, hive by province)
    out = os.path.join(OUT_A, "merged")
    if not os.path.isdir(out):
        etl.run_etl(SF_UNIT, OUT_A, shards=4)
        etl.run_maintenance(OUT_A)
    idx = build_cell_index(out)
    assert idx["files"]
    cover = C.cover_bbox(24.6, 60.0, 25.3, 60.4, 7)
    pruned = read_cell_pruned(out, cover)
    full = ray.data.read_parquet(out)
    # correctness: pruned ⊇ the exact matching rows of the full read
    want = set(cover)
    def exact(ds):
        return sorted(r["image_id"] for r in ds.take_all()
                      if r["cell7"] in want)
    assert exact(pruned) == exact(full)
    # pruning is real: fewer input files than the directory holds
    n_all = len(glob.glob(os.path.join(out, "**", "*.parquet"),
                          recursive=True))
    assert pruned.input_files() and len(pruned.input_files()) < n_all


def test_etl_checksum_verifies_and_flags_corruption(tmp_path):
    """The manifest records a per-shard content checksum at write time;
    verify_etl_output recomputes it — all True on a clean run, False for
    a shard whose parquet was tampered with after the fact."""
    import glob
    import os

    import pyarrow.parquet as pq

    from laji_pygeoapi_ray.pipelines import etl

    out = str(tmp_path / "out")
    m = etl.run_etl(SF_UNIT, out, shards=4)
    done = [s for s, e in m.data["shards"].items() if e["status"] == "done"]
    assert done
    ok = etl.verify_etl_output(out)
    assert ok and all(ok.values()), ok

    # tamper: rewrite one shard file with one image_id changed
    victim = done[0]
    f = sorted(glob.glob(os.path.join(out, "shards", victim,
                                      "*.parquet")))[0]
    t = pq.read_table(f)
    ids = t["image_id"].to_pylist()
    ids[0] = ids[0] + "_corrupt"
    import pyarrow as pa
    t = t.set_column(t.schema.get_field_index("image_id"), "image_id",
                     pa.array(ids, pa.string()))
    pq.write_table(t, f)

    ok2 = etl.verify_etl_output(out)
    assert ok2[victim] is False
    assert all(v for s, v in ok2.items() if s != victim)

    # resume must NOT trust the corrupt shard: the verify-before-skip
    # path recomputes the checksum, rewrites the shard, and the output
    # verifies clean again
    etl.run_etl(SF_UNIT, out, shards=4, resume=True)
    ok3 = etl.verify_etl_output(out)
    assert ok3 and all(ok3.values()), ok3
