"""Property tests for the sixth-session kernels vs independent
brute-force references (complements the DuckDB oracle sweeps)."""
import numpy as np
import pandas as pd
import pytest
import ray.data

from laji_pygeoapi_ray.stages.join import (hash_join, range_boundaries,
                                           sort_merge_join)


def _run_length_pairs(ok: np.ndarray, pk: np.ndarray):
    """The vectorized expansion from basket_part_pairs_topk.per_order
    (sorted distinct input), re-stated here to test against a loop."""
    n = len(ok)
    change = np.empty(n, bool)
    change[:-1] = ok[1:] != ok[:-1]
    change[-1] = True
    ends = np.flatnonzero(change) + 1
    grp = np.cumsum(np.concatenate(([0], change[:-1].astype(np.int64))))
    tail = ends[grp] - np.arange(n) - 1
    total = int(tail.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    rep = np.repeat(np.arange(n), tail)
    cum = np.concatenate(([0], np.cumsum(tail)[:-1]))
    off = np.arange(total) - np.repeat(cum, tail) + 1
    return pk[rep], pk[rep + off]


def test_pair_expansion_matches_triu_loop():
    rng = np.random.default_rng(42)
    ok = np.sort(rng.integers(0, 50, 400))
    pk = rng.integers(0, 1000, 400)
    df = (pd.DataFrame({"o": ok, "p": pk}).drop_duplicates()
          .sort_values(["o", "p"], kind="mergesort"))
    a, b = _run_length_pairs(df["o"].to_numpy(np.int64),
                             df["p"].to_numpy(np.int64))
    got = sorted(zip(a.tolist(), b.tolist()))
    want = []
    for _, g in df.groupby("o"):
        parts = np.sort(g["p"].to_numpy(np.int64))
        iu = np.triu_indices(len(parts), 1)
        want += list(zip(parts[iu[0]].tolist(), parts[iu[1]].tolist()))
    assert got == sorted(want)
    assert all(x < y for x, y in got)


def test_sort_merge_join_equals_hash_join():
    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 200, 1000),
                         "lv": rng.integers(0, 10**6, 1000)})
    right = pd.DataFrame({"k": rng.integers(0, 200, 300),
                          "rv": rng.integers(0, 10**6, 300)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)
    sm = sort_merge_join(lds, rds, on="k", num_ranges=7).to_pandas()
    hj = hash_join(ray.data.from_pandas(left).repartition(4),
                   ray.data.from_pandas(right).repartition(3),
                   on=["k"], num_buckets=9).to_pandas()
    key = ["k", "lv", "rv"]
    sm = sm[key].sort_values(key).reset_index(drop=True)
    hj = hj[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(sm, hj)
    # reference: plain pandas merge
    ref = (left.merge(right, on="k")[key].sort_values(key)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(sm, ref, check_dtype=False)


def test_range_boundaries_monotone_and_balancing():
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.integers(0, 100, 5000),
                           rng.integers(900, 1000, 5000)])  # bimodal
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    b = range_boundaries(ds, "v", 8)
    assert (np.diff(b) > 0).all()
    parts = np.searchsorted(b, vals.astype(np.float64), side="right")
    counts = np.bincount(parts, minlength=len(b) + 1)
    # equal-count histogram boundaries: no range holds more than ~2x quota
    assert counts.max() <= 2 * len(vals) // (len(b) + 1) + 1


def test_rebalance_flow_feasibility_and_minimality():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(2, 12))
        sizes = rng.integers(0, 40, n).astype(np.int64)
        total = int(sizes.sum())
        target = np.full(n, total // n, np.int64)
        target[:total % n] += 1
        flow = np.cumsum(sizes - target)
        assert flow[-1] == 0
        # feasibility: applying boundary flows yields the target exactly
        inflow = np.concatenate(([0], flow[:-1]))
        outflow = flow
        assert ((sizes + inflow - outflow) == target).all()
        # minimality on a line: the true minimum total movement is the
        # 1-D optimal-transport cost — match surplus units to deficit
        # units in sorted position order (classic EMD on the line) and
        # sum the distances; the boundary-flow plan must achieve it
        surplus = np.maximum(sizes - target, 0)
        deficit = np.maximum(target - sizes, 0)
        s_pos = np.repeat(np.arange(n), surplus)
        d_pos = np.repeat(np.arange(n), deficit)
        emd = int(np.abs(s_pos - d_pos).sum())
        assert int(np.abs(flow).sum()) == emd


def test_audit_orphan_counts_vs_pandas():
    from laji_pygeoapi_ray.pipelines.join_queries import (
        _audit_partials, _keyed_counts)
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"k": rng.integers(0, 30, 500)})
    b = pd.DataFrame({"k": rng.integers(10, 40, 200)})
    want = int((~a["k"].isin(b["k"])).sum())

    import pyarrow as pa
    a_parts = _keyed_counts(
        ray.data.from_pandas(a).repartition(3), ["k"]).map_batches(
        lambda t: t.rename_columns(["k0", "a_cnt"]).append_column(
            "b_cnt", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow")
    b_parts = _keyed_counts(
        ray.data.from_pandas(b).repartition(2), ["k"]).map_batches(
        lambda t: pa.table({"k0": t[0],
                            "a_cnt": pa.array(
                                np.zeros(t.num_rows, np.int64)),
                            "b_cnt": t[1]}), batch_format="pyarrow")
    out = _audit_partials(
        a_parts.union(b_parts), ["k0"],
        lambda tot: int(tot.loc[tot["b_cnt"] == 0, "a_cnt"].sum()),
        "orphans").to_pandas()
    assert int(out["n"].sum()) == want


def test_d8_pit_branch_planted(tmp_path):
    """The pit branch (no lower in-lattice neighbor → dir −1) is never
    exercised by the testdata surface; plant a corpus where an interior
    cell's 8 occupied neighbors are all higher and run the FULL engine +
    oracle compare on it."""
    import os

    from laji_pygeoapi_ray.functions import cells, points
    from laji_pygeoapi_ray.pipelines.geoqueries import D8_RES
    from tests.conftest import SF_UNIT, TABLES, assert_query_matches_oracle

    # find one derivable doc_id per res-5 cell
    ids = np.arange(300_000, dtype=np.int64)
    x, y = points.derive_xy(ids)
    cell = cells.encode(x, y, D8_RES)
    ix = (cell & ((1 << cells.IY_SHIFT) - 1)).astype(np.int64)
    iy = ((cell >> cells.IY_SHIFT)
          & ((1 << cells.IY_SHIFT) - 1)).astype(np.int64)
    by = {}
    for i, cx, cy in zip(ids, ix, iy):
        by.setdefault((int(cx), int(cy)), int(i))

    cx0, cy0 = 10, 10
    block = [(cx0 + dx, cy0 + dy) for dx in (-1, 0, 1)
             for dy in (-1, 0, 1)]
    assert all(c in by for c in block)
    doc_ids = [by[(cx0, cy0)]]                       # center: height 1
    for c in block:
        if c != (cx0, cy0):
            doc_ids += [by[c]] * 5                   # ring: height 5

    d = tmp_path
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_UNIT}/{t}.parquet", d / f"{t}.parquet")
    n = len(doc_ids)
    pd.DataFrame({
        "doc_id": np.array(doc_ids, np.int64),
        "text": ["w"] * n, "lang": ["en"] * n,
        "source": ["s"] * n, "n_chars": np.ones(n, np.int64),
    }).to_parquet(d / "documents.parquet", index=False)

    assert_query_matches_oracle("d8_flow_directions", str(d))
    import __ray_entry__ as e
    out = e.queries()["d8_flow_directions"](str(d)).to_pandas()
    center = (D8_RES << cells.RES_SHIFT) | (cy0 << cells.IY_SHIFT) | cx0
    row = out[out["cell4"] == center].iloc[0]
    assert row["dir"] == -1 and row["drop"] == -4    # the pit
    # ring cells flow outward (toward empty neighbors), never inward
    assert (out[out["cell4"] != center]["dir"] != -1).all()


def test_skew_split_join_equals_plain_join():
    """skew_split_join (hot keys broadcast, cold keys hash-bucketed)
    equals a plain pandas merge on zipf-skewed keys, including when the
    hot set covers none / some / all rows. The dim carries an int column
    ABOVE 2^53 (a packed cell id shape): cold-row null-fill makes it a
    present-on-both-sides nullable int through the tagged union, where a
    pandas float64 conversion would silently round it — values must
    survive bit-exact (the force_nullable_int path)."""
    from laji_pygeoapi_ray.stages.join import skew_split_join

    rng = np.random.default_rng(13)
    keys = np.minimum((rng.zipf(1.3, 5000) - 1), 99).astype(np.int64)
    big = pd.DataFrame({"k": keys,
                        "v": rng.integers(0, 10**6, len(keys))})
    dim = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                        "name": [f"n{i}" for i in range(100)],
                        "cell": (1 << 60) + 2 * np.arange(100) + 1})
    want = (big.merge(dim, on="k")[["k", "v", "name", "cell"]]
            .sort_values(["k", "v"]).reset_index(drop=True))
    for hot in ([], [0, 1, 2], list(range(100))):
        got = skew_split_join(
            ray.data.from_pandas(big).repartition(4), dim, on="k",
            hot_keys=np.array(hot, np.int64)).to_pandas()
        got = (got[["k", "v", "name", "cell"]].sort_values(["k", "v"])
               .reset_index(drop=True))
        got["cell"] = got["cell"].astype(np.int64)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sort_merge_join_output_range_ordered():
    """sort_merge_join's documented extra property: block sequence is
    range-ordered by key (each block's keys ≥ the previous block's max
    is NOT guaranteed within a range, but range ids are non-overlapping:
    the set of keys in any two blocks from different ranges must not
    interleave across a boundary)."""
    rng = np.random.default_rng(23)
    left = pd.DataFrame({"k": rng.integers(0, 1000, 4000),
                         "lv": rng.integers(0, 10, 4000)})
    right = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                          "rv": np.ones(1000, np.int64)})
    from laji_pygeoapi_ray.stages.join import (range_boundaries,
                                               sort_merge_join)
    lds = ray.data.from_pandas(left).repartition(4)
    b = range_boundaries(lds, "k", 8)
    out = sort_merge_join(ray.data.from_pandas(left).repartition(4),
                          ray.data.from_pandas(right).repartition(2),
                          on="k", num_ranges=8)
    ranges = []
    for blk in out.iter_batches(batch_size=None, batch_format="pandas"):
        if len(blk):
            ranges.append(np.searchsorted(
                b, blk["k"].to_numpy(np.float64), side="right"))
    seq = np.concatenate(ranges)
    # the streamed output is RANGE-SORTED (Ray may pack several
    # consecutive groups into one block, but never out of order)
    assert (np.diff(seq) >= 0).all()
    assert len(np.unique(seq)) > 1


def test_default_num_buckets_tracks_cluster():
    """Shuffle fan-out derives from ray.cluster_resources(), not a
    sandbox constant: ~2x cores, floor 16, cap 4096 (VERDICT r4 #4)."""
    from laji_pygeoapi_ray.stages.shuffle import default_num_buckets

    cpus = int(ray.cluster_resources()["CPU"])
    assert default_num_buckets() == max(16, min(4096, 2 * cpus))
    # a 512-core cluster must not run sandbox-sized 16-bucket shuffles
    assert default_num_buckets(per_cpu=2, floor=16, cap=4096) >= 16
    assert max(16, min(4096, 2 * 512)) == 1024


def test_skew_split_join_single_scan_no_materialize():
    """The fact side's lineage executes exactly ONCE (tag-and-route):
    a counting pass inserted upstream of skew_split_join fires once per
    input block, not twice — the former full-fact materialize() and the
    dual-branch re-execution are both gone."""
    import os
    import tempfile
    import uuid

    from laji_pygeoapi_ray.stages.join import skew_split_join

    mark_dir = tempfile.mkdtemp(prefix="skewscan_")
    rng = np.random.default_rng(5)
    big = pd.DataFrame({"k": np.minimum(rng.zipf(1.3, 2000) - 1, 49)
                        .astype(np.int64),
                        "v": rng.integers(0, 10**6, 2000)})
    dim = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                        "name": [f"n{i}" for i in range(50)]})

    def count_pass(df: pd.DataFrame) -> pd.DataFrame:
        # single-node test: every worker shares the filesystem
        with open(os.path.join(mark_dir, uuid.uuid4().hex), "w"):
            pass
        return df

    import pyarrow as pa

    ds = (ray.data.from_pandas(big).repartition(4)
          .map_batches(count_pass, batch_format="pandas",
                       batch_size=None))
    out = skew_split_join(
        ds, dim, on="k", hot_keys=np.array([0, 1], np.int64),
        fact_schema=pa.schema([("k", pa.int64()),
                               ("v", pa.int64())])).to_pandas()
    want = (big.merge(dim, on="k").sort_values(["k", "v"])
            .reset_index(drop=True))
    out = out.sort_values(["k", "v"]).reset_index(drop=True)[want.columns]
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert len(os.listdir(mark_dir)) == 4  # once per block, once total


def test_spill_checkpoint_single_execution():
    """spill_checkpoint feeds two consumers from ONE producer run: the
    counting pass upstream fires once per block, and both re-reads see
    identical data (VERDICT r4 #3 — Parquet, not object-store
    materialize, is the dual-consumer checkpoint medium)."""
    import os
    import tempfile
    import uuid

    from laji_pygeoapi_ray.state.spill import spill_checkpoint

    mark_dir = tempfile.mkdtemp(prefix="spillscan_")
    df = pd.DataFrame({"a": np.arange(1000, dtype=np.int64),
                       "b": np.arange(1000, dtype=np.int64) * 3})

    def count_pass(d: pd.DataFrame) -> pd.DataFrame:
        with open(os.path.join(mark_dir, uuid.uuid4().hex), "w"):
            pass
        return d

    ds = (ray.data.from_pandas(df).repartition(4)
          .map_batches(count_pass, batch_format="pandas",
                       batch_size=None))
    read = spill_checkpoint(ds, "unit")
    one = read().to_pandas().sort_values("a").reset_index(drop=True)
    two = read(columns=["b"]).to_pandas()
    assert len(os.listdir(mark_dir)) == 4   # producer ran exactly once
    pd.testing.assert_frame_equal(one, df)
    assert two.columns.tolist() == ["b"]    # column-pruned re-read
    assert int(two["b"].sum()) == int(df["b"].sum())


def test_spill_checkpoint_empty_producer_keeps_schema():
    """Ray's parquet sink skips empty blocks (zero files written), which
    used to make every column-pruned re-read of an EMPTY spilled
    intermediate crash with KeyError — with schema= the checkpoint
    persists a zero-row typed file so consumers get a typed empty
    dataset (the knox/trajectory zero-pair edge); without it, read()
    raises a CLEAR error instead of the KeyError."""
    import pyarrow as pa
    import pytest

    from laji_pygeoapi_ray.state.spill import spill_checkpoint

    df = pd.DataFrame({"a": np.arange(100, dtype=np.int64),
                       "b": np.arange(100, dtype=np.float64)})
    ds = (ray.data.from_pandas(df).repartition(4)
          .filter(lambda r: r["a"] < 0))        # empty result
    read = spill_checkpoint(
        ds, "unit_empty",
        schema=pa.schema([("a", pa.int64()), ("b", pa.float64())]))
    pruned = read(columns=["a"])        # KeyError before the fix
    s = pruned.schema()
    assert s.names == ["a"] and str(s.types[0]) == "int64"
    assert pruned.count() == 0
    full = read()
    assert set(full.schema().names) == {"a", "b"} and full.count() == 0
    # schema unknowable (UDF lineage) and producer empty: loud error
    ds2 = (ray.data.from_pandas(df).repartition(4)
           .filter(lambda r: r["a"] < 0))
    read2 = spill_checkpoint(ds2, "unit_empty_untyped")
    with pytest.raises(RuntimeError, match="schema"):
        read2(columns=["a"])


def test_spill_checkpoint_cleans_up_at_exit():
    """Spill-dir lifecycle: atexit removal, OWNER-AWARE stale sweep (a
    dir whose owning pid is alive is never reaped no matter its age — a
    >6 h-running producer must not lose its checkpoint to a second
    process's sweep; a locally-dead owner's dir goes after a short grace
    on the node-local default root, but only after the 6 h age bound on
    a SHARED root, where the pid may belong to a live driver on another
    node; non-spill-named dirs are never touched at all), and same-tag
    re-spill reclamation (a long-lived serving process answering the
    same query repeatedly holds at most ONE live dir per tag)."""
    import os
    import time

    from laji_pygeoapi_ray.state import spill

    df = pd.DataFrame({"a": np.arange(10, dtype=np.int64)})
    read = spill.spill_checkpoint(ray.data.from_pandas(df), "unit_gc")
    # the fresh dir exists now and is registered with atexit
    live = [e.path for e in os.scandir(spill.SPILL_ROOT)
            if e.name.startswith("unit_gc-")]
    assert live and f"-{os.getpid()}-" in live[0]
    # same-tag re-spill supersedes: the old dir is reclaimed in-process
    read2 = spill.spill_checkpoint(ray.data.from_pandas(df), "unit_gc")
    assert not os.path.exists(live[0])
    assert read2().count() == 10
    # NON-spill-named dir (no embedded pid): a foreign artifact — e.g.
    # the persisted STR index nested under a user spill root — that the
    # sweep must NEVER touch, however old
    stale = os.path.join(spill.SPILL_ROOT, "unit_foreign-deadbeef")
    os.makedirs(stale, exist_ok=True)
    old = time.time() - 7 * 3600
    os.utime(stale, (old, old))
    # dead-owner dir: reaped after the grace period regardless of age
    dead = os.path.join(spill.SPILL_ROOT, "unit_dead-999999999-cafe")
    os.makedirs(dead, exist_ok=True)
    os.utime(dead, (time.time() - 120, time.time() - 120))
    # LIVE-owner dir OLDER than 6 h: must survive the sweep
    mine = os.path.join(spill.SPILL_ROOT,
                        f"unit_mine-{os.getpid()}-beef")
    os.makedirs(mine, exist_ok=True)
    os.utime(mine, (old, old))
    spill._sweep_stale()
    assert os.path.exists(stale)    # foreign name: never touched
    assert not os.path.exists(dead)
    assert os.path.exists(mine)     # alive owner: never reaped
    spill._cleanup(mine)
    spill._cleanup(stale)
    # on a SHARED root (LAJI_RAY_SPILL_DIR set) pid liveness is
    # cross-node-meaningless: a dead-LOOKING owner only goes after the
    # full 6 h age bound, never the short grace
    prev_root = os.environ.get("LAJI_RAY_SPILL_DIR")
    os.environ["LAJI_RAY_SPILL_DIR"] = spill.SPILL_ROOT
    try:
        recent_dead = os.path.join(spill.SPILL_ROOT,
                                   "unit_rdead-999999999-f00d")
        os.makedirs(recent_dead, exist_ok=True)
        os.utime(recent_dead, (time.time() - 120, time.time() - 120))
        old_dead = os.path.join(spill.SPILL_ROOT,
                                "unit_odead-999999999-f00e")
        os.makedirs(old_dead, exist_ok=True)
        os.utime(old_dead, (old, old))
        spill._sweep_stale()
        assert os.path.exists(recent_dead)   # maybe a live remote owner
        assert not os.path.exists(old_dead)  # ancient: reaped
        spill._cleanup(recent_dead)
    finally:
        if prev_root is None:
            del os.environ["LAJI_RAY_SPILL_DIR"]
        else:
            os.environ["LAJI_RAY_SPILL_DIR"] = prev_root
    # atexit hook removes the live dir when invoked
    cur = [e.path for e in os.scandir(spill.SPILL_ROOT)
           if e.name.startswith("unit_gc-")]
    spill._cleanup(cur[0])
    assert not os.path.exists(cur[0])


def test_cluster_pairs_ds_loop_fanout_is_data_sized():
    """The iterative CC loop sizes its per-round shuffles to the
    CONTRACTED edge set (floor 16, cap = cluster-derived default), not
    the cluster — per-round task overhead dominates tiny label tables —
    while a caller-passed num_buckets overrides both."""
    import pandas as pd

    from laji_pygeoapi_ray.stages.simdedup import cluster_pairs_ds

    pairs = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    ids = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(range(1, 12))}))

    stats = {}
    out = cluster_pairs_ds(pairs, ids, id_col="doc_id",
                           stats_out=stats).to_pandas()
    # tiny contracted edge set → the floor, regardless of cluster size
    assert stats["loop_num_buckets"] == 16
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[1] == lab[2] == lab[3] == 1 and lab[10] == lab[11] == 10

    stats = {}
    out2 = cluster_pairs_ds(pairs, ids, id_col="doc_id", num_buckets=2,
                            stats_out=stats).to_pandas()
    # explicit caller value wins (tests pin small fan-outs)
    assert stats["loop_num_buckets"] == 2
    assert out2.sort_values("doc_id").reset_index(drop=True).equals(
        out.sort_values("doc_id").reset_index(drop=True))
