"""Text ops: oracle parity + planted near-dup fixtures for the rows-only
(minhash/simhash/langid) operators."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from laji_pygeoapi_ray.functions import textkernels as tk
from laji_pygeoapi_ray.stages import simdedup
from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", [
    "text_stats", "doc_fingerprint_dedup", "ngram_jaccard_pairs",
])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)


def _planted_corpus() -> pd.DataFrame:
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    texts, ids = [], []
    for i in range(40):
        toks = list(rng.choice(vocab, 60))
        texts.append(" ".join(toks))
        ids.append(i)
    # planted near-dups: docs 100+i = doc i with one token changed
    for i in range(5):
        toks = texts[i].split(" ")
        toks[20] = "CHANGED"
        texts.append(" ".join(toks))
        ids.append(100 + i)
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_minhash_finds_planted_dups():
    df = _planted_corpus()
    ds = ray.data.from_pandas(df)
    pairs = simdedup.minhash_lsh_pairs(ds, num_buckets=8).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    for i in range(5):
        assert (i, 100 + i) in found, f"planted pair {i} missed: {found}"
    # false-positive rate bounded: random 60-token docs shouldn't collide
    assert len(found) <= 15, found

    clusters = simdedup.cluster_pairs(pairs, df["doc_id"].to_numpy())
    c = clusters.set_index("doc_id")["cluster_id"]
    for i in range(5):
        assert c[100 + i] == c[i] == i


def test_simhash_finds_planted_dups():
    df = _planted_corpus()
    ds = ray.data.from_pandas(df)
    pairs = simdedup.simhash_pairs(ds, max_hamming=10, band_bits=8,
                                   num_buckets=8).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    hits = sum((i, 100 + i) in found for i in range(5))
    assert hits >= 4, (hits, found)  # 8 bands: Hamming<8 pigeonhole-found


def test_langid_profile_classifier():
    train = {
        "en": ["the quick brown fox jumps over the lazy dog and runs away",
               "this is a sentence with common english words and letters"],
        "fi": ["tämä on suomenkielinen lause jossa on yleisiä sanoja",
               "metsässä kävelee karhu ja syö mustikoita aina välillä"],
        "de": ["der schnelle braune fuchs springt über den faulen hund",
               "dies ist ein deutscher satz mit häufigen wörtern und zeichen"],
    }
    texts = [t for v in train.values() for t in v]
    labels = [k for k, v in train.items() for _ in v]
    model = tk.LangProfile().fit(texts, labels)
    preds = model.predict([
        "the fox and the dog are friends",
        "karhu kävelee metsässä mustikoita syöden",
        "der hund springt über den zaun",
    ])
    assert preds == ["en", "fi", "de"], preds


def test_simhash_hamming_kernel():
    a = np.array([0b1011, 0], dtype=np.int64)
    b = np.array([0b0001, -1], dtype=np.int64)
    assert tk.hamming64(a, b).tolist() == [2, 64]


def test_cluster_pairs_ds_equals_union_find():
    """Distributed min-label propagation == driver union-find on both the
    planted fixture and the real unit corpus."""
    import ray

    df = _planted_corpus()
    ds = ray.data.from_pandas(df)
    pairs_ds = simdedup.minhash_lsh_pairs(ds, num_buckets=8)
    pairs_df = pairs_ds.to_pandas()
    ids = np.sort(df["doc_id"].to_numpy())
    exp = (simdedup.cluster_pairs(pairs_df, ids)
           .sort_values("doc_id").reset_index(drop=True))
    got = (simdedup.cluster_pairs_ds(
               ray.data.from_pandas(pairs_df),
               ray.data.from_pandas(df[["doc_id"]]), num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got["cluster_id"].to_numpy()
            == exp["cluster_id"].to_numpy()).all()
    # chain topology (0-1, 1-2, 2-3): propagation needs >1 iteration
    chain = pd.DataFrame({"id_a": [0, 1, 2], "id_b": [1, 2, 3]})
    got2 = (simdedup.cluster_pairs_ds(
                ray.data.from_pandas(chain),
                ray.data.from_pandas(pd.DataFrame({"doc_id": range(5)})),
                num_buckets=4)
            .to_pandas().sort_values("doc_id"))
    assert got2["cluster_id"].tolist() == [0, 0, 0, 0, 4]


def test_rolling_fingerprint_edges():
    import pyarrow as pa

    from laji_pygeoapi_ray.stages.text import rolling_fingerprint_stage
    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["a b c d e", "ab cd", ""]})
    out = rolling_fingerprint_stage()(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[0]["n_windows"] == 2          # 5 tokens, window 4
    assert rows[1] == {"doc_id": 1, "fingerprint": -1, "n_windows": 0}
    # "" splits to one empty token -> still < window
    assert rows[2]["n_windows"] == 0
    # hand-computed hash for the first window of doc 0: v('a')=256+97
    v = 256 + 97

    def tv(c):
        return 256 + ord(c)
    h0 = ((tv('a') * 33 + tv('b')) * 33 + tv('c')) * 33 + tv('d')
    h1 = ((tv('b') * 33 + tv('c')) * 33 + tv('d')) * 33 + tv('e')
    assert rows[0]["fingerprint"] == min(h0, h1)


def test_token_values_all_empty_batch():
    """Regression: a batch whose EVERY text is empty/null has no Arrow
    data buffer to index — token_values used to IndexError (the earlier
    edge test passed only because one non-empty string kept the buffer
    non-empty). A 100-TB corpus has all-empty blocks."""
    import pyarrow as pa

    from laji_pygeoapi_ray.stages.text import (rolling_fingerprint_stage,
                                               token_values)
    for texts in (["", ""], [None, None], [None, ""]):
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(texts, pa.string())})
        v, lens = token_values(t["text"])
        assert v.tolist() == [0, 0] and lens.tolist() == [1, 1]
        out = rolling_fingerprint_stage()(t)
        assert out["n_windows"].to_pylist() == [0, 0]
        assert out["fingerprint"].to_pylist() == [-1, -1]


def test_poly_mix_hash_sql_parity():
    """The SQL-twinnable gram hash: numpy (poly_mix_hash) must equal the
    DuckDB expression chain (sql_poly_hash + sql_mix64_ctes) byte-for-byte
    — the contract the simhash_near_pairs oracle rests on."""
    import duckdb
    import pyarrow as pa

    strs = ["tok1 tok2 tok3", "a b c", "hello world foo", "x y z",
            "Z", "  ", "a" * 300, "0 1 2 3 4 5"]
    got = [int(x) for x in tk.poly_mix_hash(pa.array(strs))]
    lits = ", ".join("'" + s + "'" for s in strs)
    q = f"""
    WITH g(gram) AS (SELECT unnest([{lits}])),
    ph AS (SELECT gram, CAST({tk.sql_poly_hash('gram')} AS HUGEINT) AS z0
           FROM g),
    {tk.sql_mix64_ctes('ph', 'gram')}
    SELECT gram, CAST(h AS UBIGINT) AS h FROM mx3
    """
    con = duckdb.connect()
    want = dict(con.sql(q).fetchall())
    assert [want[s] for s in strs] == got


def test_simhash_near_pairs_oracle():
    assert_query_matches_oracle("simhash_near_pairs", SF_UNIT)


def test_minhash_dedup_clusters_oracle():
    """The flagship near-dup pipeline vs the from-scratch SQL twin
    (signatures, band fold, stop-bucket pruning, recursive closure)."""
    assert_query_matches_oracle("minhash_dedup_clusters", SF_UNIT)


def test_repetition_stats_planted():
    """Known repetition structure: 'x y x y x y' has 5 2-grams, top one
    ('x y') occurring 3 times; all 4 3-grams occur twice-ish."""
    from laji_pygeoapi_ray.functions.textkernels import repetition_stats
    s = repetition_stats(["x y x y x y", "a b c", "solo", ""])
    # doc 0: 2-grams [xy, yx, xy, yx, xy] → n=5, top=3
    assert s["n_2grams"].tolist() == [5, 2, 0, 0]
    assert s["top_2gram_n"].tolist() == [3, 1, 0, 0]
    assert s["top_2gram_frac"][0] == 3 / 5
    # doc 0: 3-grams [xyx, yxy, xyx, yxy] → all duplicated → dup=4/4
    assert s["n_3grams"].tolist() == [4, 1, 0, 0]
    assert s["dup_3gram_n"].tolist() == [4, 0, 0, 0]
    assert s["dup_3gram_frac"].tolist() == [1.0, 0.0, 0.0, 0.0]


def test_contamination_stage_planted():
    """A training doc sharing a 4-gram with the benchmark doc is flagged;
    one with no shared 4-gram is not; benchmark docs are excluded."""
    import pandas as pd
    import ray
    import ray.data
    from laji_pygeoapi_ray.functions.textkernels import gram_hash_arrays
    from laji_pygeoapi_ray.stages.text import (ContaminationStage,
                                               bench_gram_stage)
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),  # 0 is benchmark
        "text": ["the quick brown fox jumps",
                 "a lazy quick brown fox jumps high",   # shares 4-grams
                 "entirely different words here now"]})
    ds = ray.data.from_pandas(docs)
    pdf = ds.map_batches(bench_gram_stage(4, 3),
                         batch_format="pyarrow").to_pandas()
    import numpy as np
    ref = ray.put(np.unique(pdf["gram_h"].to_numpy(dtype=np.uint64)))
    out = (ds.map_batches(ContaminationStage,
                          fn_constructor_args=(ref, 4, 3),
                          batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2]
    # doc 1 contains "quick brown fox jumps" = 1 shared 4-gram instance
    assert out["contaminated_n"].tolist() == [1, 0]
    assert out["is_contaminated"].tolist() == [True, False]
    # kernel sanity: doc 1 has 7 tokens → 4 4-grams
    n, _, _ = gram_hash_arrays(docs["text"].tolist(), 4)
    assert n.tolist() == [2, 4, 2]
