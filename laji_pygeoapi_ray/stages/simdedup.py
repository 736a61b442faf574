"""Near-duplicate detection pipelines (training-data ops):
exact-hash dedup is in stages/dedup.py; here live the similarity families —
word-n-gram Jaccard, MinHash+LSH banding, SimHash — all built on the same
shuffle shape: explode (id, bucket_key) → groupby(bucket) → candidate pairs
→ exact verify → cluster.

Scale notes (documented per SURVEY.md §2 custom-operator rule):
- bucket groups larger than ``group_cap`` are skipped when
  ``group_cap`` is set (standard LSH stop-bucket pruning; emitted pair
  count is what the oracle checks for the capless n-gram query);
- candidate-pair clustering uses driver-side union-find — valid while
  candidates ≪ corpus (the LSH contract); an iterative min-label
  propagation via groupby is the cluster-scale fallback.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textkernels as tk
from .shuffle import default_num_buckets, grouped_apply


def shingle_explode(text_col: str = "text", id_col: str = "doc_id",
                    n: int = 3, counted: bool = False):
    """map_batches stage: one (id, gram) row per DISTINCT word n-gram, or —
    with ``counted=True`` — one (id, gram, cnt) row per distinct gram with
    its within-doc occurrence count (the repetition/span-dedup input shape).

    Fully vectorized: one Arrow split per batch, numpy index arithmetic to
    address the n tokens of every gram, ``binary_join_element_wise`` to
    build the gram strings, and an Arrow group_by for the per-doc DISTINCT
    — no Python loop over rows or tokens."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        counts = np.maximum(lens - n + 1, 0)
        total = int(counts.sum())
        doc = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), counts)
        starts = np.cumsum(counts) - counts           # per-doc gram offset
        tok0 = np.cumsum(lens) - lens                 # per-doc token offset
        pos = np.arange(total) - np.repeat(starts, counts)
        base = np.repeat(tok0, counts) + pos
        parts = [flat.take(pa.array(base + j)) for j in range(n)]
        gram = pc.binary_join_element_wise(*parts, " ")
        t = pa.table({id_col: pa.array(doc, pa.int64()), "gram": gram})
        if counted:
            out = t.group_by([id_col, "gram"]).aggregate([([], "count_all")])
            return out.rename_columns([id_col, "gram", "cnt"])
        return t.group_by([id_col, "gram"]).aggregate([])
    return fn


def _pairs_from_groups(df: pd.DataFrame, key: str, id_col: str,
                       group_cap: int | None) -> pd.DataFrame:
    """Within a bucket: for every bucket-key group, all unordered id pairs."""
    outs_a, outs_b = [], []
    for _, g in df.groupby(key, sort=False):
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2 or (group_cap and len(ids) > group_cap):
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        outs_a.append(ids[ia])
        outs_b.append(ids[ib])
    if not outs_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    return pd.DataFrame({"id_a": np.concatenate(outs_a),
                         "id_b": np.concatenate(outs_b)})


def ngram_pair_intersections(ds, *, id_col: str = "doc_id",
                             num_buckets: int | None = None,
                             group_cap: int | None = None):
    """(id, gram) rows → (id_a, id_b, inter) with inter = |shared grams|.
    One shuffle on the gram hash; pair counts summed in a second small
    groupby."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        pairs = _pairs_from_groups(df, "gram", id_col, group_cap)
        if pairs.empty:
            pairs["inter"] = pd.Series([], dtype="int64")
            return pairs
        return (pairs.groupby(["id_a", "id_b"], sort=False)
                .size().rename("inter").reset_index())

    partial = grouped_apply(ds, ["gram"], bucket_fn, num_buckets=num_buckets)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["id_a", "id_b"], sort=False)["inter"]
                .sum().reset_index())

    return grouped_apply(partial, ["id_a", "id_b"], combine,
                         num_buckets=max(8, num_buckets // 4))


def jaccard_pairs(ds, counts: dict[int, int], *, id_col: str = "doc_id",
                  threshold: float = 0.0, num_buckets: int | None = None):
    """Full n-gram Jaccard: intersections + broadcast per-doc shingle counts
    → jaccard = inter / (|A| + |B| − inter); keeps pairs > threshold.

    ``counts`` is broadcast ONCE via ``ray.put`` (not pickled into the
    map function — a corpus-sized dict in the closure ships with every
    task and can exceed the serialized-function limit); an id missing
    from ``counts`` raises instead of silently dropping the pair
    through a NaN comparison."""
    import ray

    inter = ngram_pair_intersections(ds, id_col=id_col,
                                     num_buckets=num_buckets)
    counts_ref = ray.put(counts)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(counts_ref)
        na = df["id_a"].map(c).to_numpy(np.float64)
        nb = df["id_b"].map(c).to_numpy(np.float64)
        if np.isnan(na).any() or np.isnan(nb).any():
            bad = df.loc[np.isnan(na) | np.isnan(nb),
                         ["id_a", "id_b"]].head(3)
            raise KeyError(
                f"jaccard_pairs: pair ids missing from counts: {bad}")
        i = df["inter"].to_numpy(np.float64)
        df = df.copy()
        df["jaccard"] = i / (na + nb - i)
        return df[df["jaccard"] > threshold]

    return inter.map_batches(finish, batch_format="pandas")


def minhash_lsh_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      shingle_n: int = 3, bands: int = 16,
                      group_cap: int | None = 256,
                      num_buckets: int | None = None,
                      dedupe: bool = True):
    """MinHash+LSH candidate pairs: signature → band buckets → explode
    (id, band_key) → groupby(band bucket) → pairs (deduped).

    ``dedupe=False`` skips the final pair-dedup shuffle — correct whenever
    the consumer is idempotent under duplicate edges (min-label clustering
    is), saving one full exchange."""
    from .text import minhash_stage

    nb = num_buckets if num_buckets is not None else default_num_buckets()

    sigs = ds.map_batches(minhash_stage(text_col, shingle_n, bands),
                          batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bl = batch["bands"]
        if isinstance(bl, pa.ChunkedArray):
            bl = bl.combine_chunks()
        flat = bl.flatten().to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(bl).to_numpy(zero_copy_only=False)
        return pa.table({id_col: np.repeat(ids, reps), "band_key": flat})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_groups(df, "band_key", id_col, group_cap)

    pairs = grouped_apply(exploded, ["band_key"], bucket_fn,
                          num_buckets=nb)

    if not dedupe:
        return pairs

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return grouped_apply(pairs, ["id_a", "id_b"], dedup,
                         num_buckets=max(8, nb // 4))


def hamming_pairs(hashed_ds, *, id_col: str, hash_col: str,
                  max_hamming: int = 8, band_bits: int = 16,
                  num_buckets: int | None = None):
    """Band-blocked Hamming near-dup pairs over an EXISTING int64 hash
    column (pigeonhole: Hamming < 64/band_bits bands ⇒ some band equal) —
    the generic core behind simhash_pairs, reusable for any 64-bit
    fingerprint (e.g. the image table's phash)."""
    n_bands = 64 // band_bits
    mask = np.uint64((1 << band_bits) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for b in range(n_bands):
            band = ((sh >> np.uint64(band_bits * b)) & mask).astype(np.int64)
            parts.append(pa.table({
                id_col: ids, "__hash": sh.astype(np.int64),
                "band_key": (np.int64(b) << 48) | band}))
        return pa.concat_tables(parts)

    exploded = hashed_ds.map_batches(explode, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("band_key", sort=False):
            g = g.drop_duplicates(subset=[id_col])
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            hs = g["__hash"].to_numpy(np.int64)
            ia, ib = np.triu_indices(len(ids), k=1)
            ham = tk.hamming64(hs[ia], hs[ib])
            keep = ham <= max_hamming
            if keep.any():
                outs.append(pd.DataFrame({
                    "id_a": np.minimum(ids[ia][keep], ids[ib][keep]),
                    "id_b": np.maximum(ids[ia][keep], ids[ib][keep]),
                    "hamming": ham[keep].astype(np.int64)}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    pairs = grouped_apply(exploded, ["band_key"], bucket_fn,
                          num_buckets=num_buckets)
    # the surviving pair stream is far smaller than the banded explode
    # but still corpus-proportional: scale the caller's fan-out down the
    # same way minhash_lsh_pairs does (derived default when unset)
    nb = num_buckets if num_buckets is not None else default_num_buckets()
    return grouped_apply(pairs, ["id_a", "id_b"],
                         lambda df: df.drop_duplicates(),
                         num_buckets=max(8, nb // 4))


def simhash_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 8, band_bits: int = 16,
                  num_buckets: int | None = None):
    """SimHash near-dup pairs: 64-bit simhash per doc, then the generic
    band-blocked :func:`hamming_pairs` (pigeonhole recall guarantee for
    Hamming < 64/band_bits; band_bits trades recall vs bucket size: 16
    bits/4 bands for web-scale corpora, 8 bits/8 bands for high recall)."""
    from .text import simhash_stage

    hashed = ds.map_batches(simhash_stage(text_col), batch_format="pyarrow")
    return hamming_pairs(hashed, id_col=id_col, hash_col="simhash",
                         max_hamming=max_hamming, band_bits=band_bits,
                         num_buckets=num_buckets)


def cluster_pairs(pairs_df: pd.DataFrame, all_ids: np.ndarray) -> pd.DataFrame:
    """Driver-side union-find over candidate pairs → (id, cluster_id) where
    cluster_id = min id of the component. Valid while |pairs| ≪ corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return pd.DataFrame({
        "doc_id": all_ids,
        "cluster_id": np.asarray([find(int(i)) for i in all_ids], dtype=np.int64),
    })


def cluster_pairs_ds(pairs_ds, ids_ds, *, id_col: str = "doc_id",
                     max_iters: int = 50, num_buckets: int | None = None,
                     jump_from: int = 2, stats_out: dict | None = None):
    """Distributed near-dup clustering — iterative min-label propagation
    over the candidate-pair graph, all shuffles, NO driver-side pair
    materialization (the scale fallback to :func:`cluster_pairs`).

    Labels live ONLY on edge endpoints (nodes that appear in some pair) —
    singleton records never enter the loop and get ``cluster_id = id``
    attached in one final pass, so each iteration's label side is sized by
    the dup population, not the corpus. Per iteration (two hash shuffles):

      1. key = src: join both edge directions with current labels →
         candidate label for each neighbor;
      2. key = id: min over (own label, neighbor candidates) → new labels.

    Labels only ever decrease, so the global label SUM is strictly
    monotone; the loop stops when the sum is unchanged (fixpoint) — the
    convergence check is a cheap aggregate, not a diff join. Dup clusters
    are shallow (family diameter ≪ corpus), so iterations ≈ cluster
    diameter. Returns a Dataset of (id_col, cluster_id = min id of the
    connected component).

    Ids MUST be non-negative int64: the side tags in the internal unions
    use a -1 sentinel instead of typed nulls so every label column stays
    numpy int64 through the pandas buckets — typed nulls would upcast the
    column to float64, which is LOSSY above 2^53 (packed cell ids with
    resolution bits at 58+ were corrupted by exactly this).
    """
    import ray.data as rd

    caller_buckets = num_buckets
    if num_buckets is None:
        # fan-out for the single-pass stages over the raw (possibly
        # corpus-proportional) pair stream: cluster-derived
        num_buckets = default_num_buckets()
    # the final singleton-resolve pass shuffles the FULL ids_ds (corpus-
    # proportional), so it must keep this wide fan-out even after the
    # loop below downsizes num_buckets to the contracted edge set
    wide_buckets = num_buckets

    def _check_nonneg(a: np.ndarray, b: np.ndarray) -> None:
        # the -1 side-tag sentinel requires non-negative ids; fail loudly
        # (signed hashes passed as ids would silently corrupt clusters)
        if (len(a) and a.min() < 0) or (len(b) and b.min() < 0):
            raise ValueError(
                "cluster_pairs_ds requires non-negative int64 ids (the "
                "internal unions tag sides with a -1 sentinel); got a "
                "negative id — remap signed hashes (e.g. simhash int64) "
                "to uint-range ids first")

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        _check_nonneg(a, b)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    def both_dirs_pairs(t) -> pa.Table:
        if isinstance(t, pd.DataFrame):
            a = t["src"].to_numpy(np.int64)
            b = t["dst"].to_numpy(np.int64)
        else:
            a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        _check_nonneg(a, b)
        keep = a != b                      # self-loops carry no information
        a, b = a[keep], b[keep]
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow") \
        if not isinstance(pairs_ds, pd.DataFrame) else \
        rd.from_pandas(pairs_ds).map_batches(both_dirs,
                                             batch_format="pyarrow")

    # ---- contraction pre-pass (one shuffle): per-bucket IN-MEMORY
    # connected components over the bucket's edge partition, emitting one
    # (node → local min-root) star edge per node. Dup-family graphs are
    # stars already (no-op), but SPATIAL eps-graphs have long chains —
    # diameter-many distributed rounds at ~seconds of fixed cost each.
    # Local contraction collapses every chain that lands in one bucket, so
    # the loop below runs on shallow star edges and converges in a few
    # rounds regardless of the original diameter (the two-level design of
    # MR connected-components). Per-bucket work is vectorized min-label +
    # pointer doubling: O(E/B · log d) numpy, memory-bounded by the edge
    # partition.
    def local_cc(df: pd.DataFrame) -> pd.DataFrame:
        a = df["src"].to_numpy(np.int64)
        b = df["dst"].to_numpy(np.int64)
        ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ia, ib = inv[:len(a)], inv[len(a):]
        lbl = np.arange(len(ids), dtype=np.int64)
        while True:
            new = lbl.copy()
            np.minimum.at(new, ia, lbl[ib])
            np.minimum.at(new, ib, lbl[ia])
            new = new[new]                      # pointer doubling
            if np.array_equal(new, lbl):
                break
            lbl = new
        # index order == id order, so min index root == min id root
        return pd.DataFrame({"src": ids, "dst": ids[lbl]})

    contracted = grouped_apply(edges, ["src"], local_cc,
                               num_buckets=num_buckets)
    edges = contracted.map_batches(both_dirs_pairs,
                                   batch_format="pyarrow")
    edges = edges.materialize()           # static across iterations

    # The ITERATIVE stages pay per-task overhead every round, so size
    # their fan-out to the contracted edge set (known: just materialized)
    # rather than the cluster — ~100k rows per bucket, floored at 16 and
    # capped at the cluster-derived default. Star-contracted dup graphs
    # are tiny next to the corpus; a 4096-bucket loop over a few million
    # label rows would be dominated by scheduling, not work. A
    # caller-passed num_buckets overrides (tests pin small values).
    if caller_buckets is None:
        num_buckets = max(16, min(default_num_buckets(),
                                  edges.count() // 100_000 + 1))
    if stats_out is not None:
        stats_out["loop_num_buckets"] = num_buckets

    # initial labels = min(self, direct neighbors), endpoints only — one
    # shuffle; star-shaped dup families are already at their fixpoint here
    def init_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("src", as_index=False)["dst"].min()
        return pd.DataFrame({
            "id": m["src"].astype("int64"),
            "label": np.minimum(m["src"].to_numpy(np.int64),
                                m["dst"].to_numpy(np.int64))})

    lab = grouped_apply(edges, ["src"], init_bucket,
                        num_buckets=num_buckets).materialize()
    prev_sum = lab.sum("label")

    rounds, converged = 0, False
    for _ in range(max_iters):
        rounds += 1
        # ---- shuffle 1: neighbor candidates (edges ⋈ labels on src)
        tagged = edges.map_batches(
            lambda t: t.append_column(
                "label", pa.array(np.full(len(t), -1, np.int64))),
            batch_format="pyarrow").union(
            lab.map_batches(
                lambda t: pa.table({
                    "src": t["id"],
                    "dst": pa.array(np.full(len(t), -1, np.int64)),
                    "label": t["label"]}),
                batch_format="pyarrow"))

        def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
            lpart = df[df["dst"] == -1][["src", "label"]]
            epart = df[df["label"] == -1][["src", "dst"]]
            if epart.empty or lpart.empty:
                return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                     "label": pd.Series([], dtype="int64")})
            m = epart.merge(lpart, on="src")
            return pd.DataFrame({"id": m["dst"].astype("int64"),
                                 "label": m["label"].astype("int64")})

        cands = grouped_apply(tagged, ["src"], join_bucket,
                              num_buckets=num_buckets)

        # ---- shuffle 2: new label = min(own, neighbor candidates)
        def min_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("id", as_index=False)["label"].min()

        # materialize: the jump stage consumes `lab` TWICE (query side +
        # lookup side); without a checkpoint the whole min pipeline would
        # re-execute for each consumer
        # repartition: union concatenates block lists and groupby mirrors
        # the input block count, so without coalescing the label dataset
        # DOUBLES its blocks every round (3→7→15→…) and round cost grows
        # geometrically (measured). repartition(shuffle=False) is a cheap
        # split/merge, no exchange.
        lab = grouped_apply(lab.union(cands).repartition(num_buckets),
                            ["id"], min_bucket,
                            num_buckets=num_buckets).materialize()

        # ---- pointer jumping (label doubling): label(v) ← label(label(v)).
        # Every label value is itself an endpoint id, so the lookup always
        # resolves; distances to the component minimum HALVE each round —
        # convergence in O(log diameter) rounds instead of O(diameter)
        # (path graphs would otherwise need one full two-shuffle round per
        # hop). Two more hash exchanges per round, exponentially fewer
        # rounds. ADAPTIVE: dup graphs are usually stars that converge in
        # 1-2 rounds, so jumping starts only at round ``jump_from`` —
        # shallow graphs never pay for it, deep ones still get O(log d).
        if _ < jump_from:
            s = lab.sum("label")
            if s == prev_sum:
                break
            prev_sum = s
            continue
        queries_side = lab.map_batches(
            lambda t: pa.table({"k": t["label"], "qid": t["id"],
                                "lbl": pa.array(
                                    np.full(len(t), -1, np.int64))}),
            batch_format="pyarrow")
        lookup_side = lab.map_batches(
            lambda t: pa.table({"k": t["id"],
                                "qid": pa.array(
                                    np.full(len(t), -1, np.int64)),
                                "lbl": t["label"]}),
            batch_format="pyarrow")

        def jump_bucket(df: pd.DataFrame) -> pd.DataFrame:
            lk = df[df["lbl"] != -1][["k", "lbl"]]
            q = df[df["qid"] != -1][["k", "qid"]]
            if q.empty:
                return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                     "label": pd.Series([], dtype="int64")})
            # left-merge misses produce NA: carry lbl as nullable Int64
            # through the merge (masked int64 — exact at full width), not
            # float64
            m = q.merge(lk.assign(lbl=lk["lbl"].astype("Int64")),
                        on="k", how="left")
            lbl = m["lbl"].fillna(m["k"]).astype("int64")
            return pd.DataFrame({"id": m["qid"].astype("int64"),
                                 "label": lbl})

        lab = grouped_apply(
            queries_side.union(lookup_side).repartition(num_buckets),
            ["k"], jump_bucket,
            num_buckets=num_buckets).materialize()
        s = lab.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s

    if stats_out is not None:
        stats_out["rounds"] = rounds         # per-partition metrics surface
        stats_out["converged"] = converged   # False = max_iters truncation
        stats_out["label_sum"] = prev_sum

    # attach singletons (ids with no pair): one anti-join shuffle at the END
    tagged_ids = ids_ds.map_batches(
        lambda t: pa.table({"id": pc_cast_i64(t[id_col]),
                            "label": pa.array(
                                np.full(len(t), -1, np.int64))}),
        batch_format="pyarrow").union(lab)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        labelled = df[df["label"] != -1]
        agg = labelled.groupby("id", as_index=False)["label"].min()
        out = df[["id"]].drop_duplicates().merge(
            agg.assign(label=agg["label"].astype("Int64")),
            on="id", how="left")
        lbl = out["label"].fillna(out["id"]).astype("int64")
        return pd.DataFrame({"id": out["id"].astype("int64"),
                             "label": lbl})

    final = grouped_apply(tagged_ids, ["id"], resolve,
                          num_buckets=wide_buckets)
    return final.map_batches(
        lambda t: pa.table({id_col: t["id"], "cluster_id": t["label"]}),
        batch_format="pyarrow")


def pc_cast_i64(col):
    import pyarrow.compute as pc
    return pc.cast(col, pa.int64())
