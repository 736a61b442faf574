"""Content-scanning queries over the documents table: regex PII audit,
URL/domain extraction, and token↔language association (chi-square).

The training-data-compliance slice of the LLM-pipeline surface: before a
corpus ships, it gets scanned for contact info (emails / phone numbers),
its link graph is profiled (who do documents cite?), and per-language
token skew is measured for mixture debugging. All three are pure
map_batches scans — regex kernels run inside Arrow (pyarrow.compute is
RE2; DuckDB's regexp functions are ALSO RE2, so the oracles share exact
match semantics), aggregation is batch-partial, and the wide text column
never shuffles.

The synthetic corpus carries no organic contact info, so both scan
queries PLANT deterministic fixtures derived from doc_id — planted
identically in the engine (vectorized string concat) and the oracle
(SQL ``||``), the same planted-fixture pattern as the image dup family
(FIXTURES.md F1): the regex machinery is exercised against known truth,
not against an all-zero degenerate answer.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from ..sources.parquet import read_table
from .registry import register

EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_RE = r"0\d{2}-\d+"
URL_RE = r"https://([a-z0-9.]+)/"
URL_RE_NAMED = r"https://(?P<dom>[a-z0-9.]+)/"

# planting rule (shared by engine + oracle): every 7th doc gains an
# email, every 11th a phone number, every 5th a URL
EMAIL_MOD, PHONE_MOD, URL_MOD = 7, 11, 5

_PLANT_SQL = f"""
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % {EMAIL_MOD} = 0
                   THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org'
                   ELSE '' END
           || CASE WHEN doc_id % {PHONE_MOD} = 0
                   THEN ' tel 040-' || CAST(doc_id AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % {URL_MOD} = 0
                   THEN ' see https://h' || CAST(doc_id % 13 AS VARCHAR)
                        || '.ex' || CAST(doc_id % 3 AS VARCHAR)
                        || '.org/p/' || CAST(doc_id AS VARCHAR)
                   ELSE '' END AS text
    FROM documents"""


def _planted(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """(planted text, doc_id) for one batch — numpy twin of _PLANT_SQL."""
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    ds = d.astype("U20")
    email = np.where(d % EMAIL_MOD == 0,
                     np.char.add(np.char.add(" mail u", ds), "@ex.org"), "")
    phone = np.where(d % PHONE_MOD == 0, np.char.add(" tel 040-", ds), "")
    url = np.where(
        d % URL_MOD == 0,
        np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
            " see https://h", (d % 13).astype("U2")), ".ex"),
            (d % 3).astype("U1")), ".org/p/"), ds), "")
    text = pc.binary_join_element_wise(
        pc.fill_null(pc.cast(t["text"], pa.string()), ""),
        pa.array(email), pa.array(phone), pa.array(url), "")
    return text, d


@register("pii_scan_counts", sql=lambda: f"""
    WITH p AS ({_PLANT_SQL}),
    m AS (SELECT source,
                 len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
                 len(regexp_extract_all(text, '{PHONE_RE}')) AS np
          FROM p)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_email,
           CAST(SUM(ne) AS BIGINT) AS n_emails,
           CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_phone,
           CAST(SUM(np) AS BIGINT) AS n_phones
    FROM m GROUP BY source""")
def pii_scan_counts(sf_dir: str):
    """PII audit per source: email / phone match counts via RE2 regex
    kernels (``pc.count_substring_regex`` — Arrow-native, zero Python in
    the row path). Per-batch pre-aggregation to ≤ |sources| rows; the
    text column is scanned once and dropped at the stage boundary."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def scan(t: pa.Table) -> pa.Table:
        text, _ = _planted(t)
        ne = pc.count_substring_regex(text, EMAIL_RE)
        nph = pc.count_substring_regex(text, PHONE_RE)
        df = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "n_docs": 1,
            "docs_with_email": (ne.to_numpy() > 0).astype(np.int64),
            "n_emails": ne.to_numpy().astype(np.int64),
            "docs_with_phone": (nph.to_numpy() > 0).astype(np.int64),
            "n_phones": nph.to_numpy().astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False)

    cols = ["n_docs", "docs_with_email", "n_emails",
            "docs_with_phone", "n_phones"]
    agg = ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("source").aggregate(
            *[Sum(c, alias_name=c) for c in cols])
    return agg.map_batches(lambda t: t.rename_columns(["source"] + cols),
                           batch_format="pyarrow")


@register("url_domain_counts", sql=lambda: f"""
    WITH p AS ({_PLANT_SQL}),
    d AS (SELECT doc_id, regexp_extract(text, '{URL_RE}', 1) AS domain
          FROM p)
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(doc_id) AS first_doc
    FROM d WHERE domain <> '' GROUP BY domain""")
def url_domain_counts(sf_dir: str):
    """Outbound-link profile: first URL's domain per document
    (``pc.extract_regex``, leftmost RE2 match — identical to DuckDB's
    ``regexp_extract``), counted per domain with the earliest citing
    doc. Batch-partial counts + min; one tiny domain-keyed groupby."""
    from ray.data.aggregate import Min

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        text, d = _planted(t)
        ext = pc.extract_regex(text, URL_RE_NAMED)
        valid = pc.is_valid(ext)
        dom = pc.struct_field(ext, "dom")
        df = pd.DataFrame({"domain": dom.to_pandas(), "doc_id": d})
        df = df[valid.to_numpy(zero_copy_only=False)]
        g = df.groupby("domain", as_index=False).agg(
            n=("doc_id", "size"), first_doc=("doc_id", "min"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("domain").aggregate(
            Sum("n", alias_name="n"), Min("first_doc", alias_name="first_doc"))
    return agg.map_batches(
        lambda t: t.rename_columns(["domain", "n", "first_doc"]),
        batch_format="pyarrow")


CHI2_MIN_DF = 5          # report tokens appearing in ≥ 5 docs
CHI2_TARGET = "en"


@register("chi2_token_lang", sql=lambda: f"""
    WITH ex AS (SELECT doc_id, lang = '{CHI2_TARGET}' AS is_en,
                       unnest(string_split(text, ' ')) AS token
                FROM documents),
    d AS (SELECT DISTINCT doc_id, is_en, token FROM ex WHERE token <> ''),
    tot AS (SELECT CAST(SUM(CASE WHEN lang = '{CHI2_TARGET}' THEN 1
                                 ELSE 0 END) AS BIGINT) AS nen,
                   CAST(SUM(CASE WHEN lang = '{CHI2_TARGET}' THEN 0
                                 ELSE 1 END) AS BIGINT) AS noth
            FROM documents),
    c AS (SELECT token,
                 CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS b
          FROM d GROUP BY token)
    SELECT token, a AS n_en, b AS n_other,
           CASE WHEN (a + b) * (nen + noth - a - b) * nen * noth = 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE CAST((nen + noth)
                          * (a * (noth - b) - b * (nen - a))
                          * (a * (noth - b) - b * (nen - a)) AS DOUBLE)
                     / CAST((a + b) * (nen + noth - a - b)
                            * nen * noth AS DOUBLE) END AS chi2
    FROM c, tot WHERE a + b >= {CHI2_MIN_DF}""")
def chi2_token_lang(sf_dir: str):
    """Token ↔ language association: chi-square of the 2×2 presence table
    (docs containing the token × lang == '{target}') per vocabulary
    token, the classic feature-selection / corpus-drift statistic. All
    counts are exact int64; chi2 is ONE identically-written division of
    integer numerator / denominator, so the float is bit-equal to the
    oracle's (the Theil–Sen rule: a single division has no summation-
    order sensitivity). Result is vocabulary-bounded — same scale
    contract as vocab_top_tokens. Int range: N·(ad−bc)² needs
    N·(N²/4)² < 2⁶³ → N ≲ 10⁵ docs per language pair; beyond that,
    switch the numerator to float128 partials or pre-scale."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang"])

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(pc.cast(t["text"], pa.string()), ""), " ")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        tok = flat.to_numpy(zero_copy_only=False)
        keep = tok != ""
        is_en = (t["lang"].to_numpy(zero_copy_only=False) == CHI2_TARGET)
        df = pd.DataFrame({"d": doc_idx[keep], "token": tok[keep]})
        df = df.drop_duplicates()
        df["is_en"] = is_en[df["d"].to_numpy()]
        g = df.groupby("token", as_index=False).agg(
            a=("is_en", "sum"), b=("is_en", lambda s: int((~s).sum())))
        g["a"] = g["a"].astype(np.int64)
        g["b"] = g["b"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def lang_totals(t: pa.Table) -> pa.Table:
        en = (t["lang"].to_numpy(zero_copy_only=False)
              == CHI2_TARGET).astype(np.int64)
        return pa.table({"nen": pa.array([int(en.sum())]),
                         "noth": pa.array([int(len(en) - en.sum())])})

    tot = read_table(sf_dir, "documents", ["lang"]) \
        .map_batches(lang_totals, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(None).aggregate(Sum("nen", alias_name="nen"),
                                 Sum("noth", alias_name="noth")).take_all()
    nen, noth = int(tot[0]["nen"]), int(tot[0]["noth"])

    agg = ds.map_batches(pairs, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("token").aggregate(Sum("a", alias_name="a"),
                                    Sum("b", alias_name="b"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["token", "a", "b"])
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.int64(nen + noth)
        diff = a * (np.int64(noth) - b) - b * (np.int64(nen) - a)
        num = n * diff * diff
        den = (a + b) * (n - a - b) * np.int64(nen) * np.int64(noth)
        chi2 = np.where(den == 0, 0.0,
                        num.astype(np.float64)
                        / np.where(den == 0, 1, den).astype(np.float64))
        out = pa.table({"token": t["token"], "n_en": pa.array(a),
                        "n_other": pa.array(b), "chi2": pa.array(chi2)})
        return out.filter(pa.array(a + b >= CHI2_MIN_DF))

    return agg.map_batches(finish, batch_format="pyarrow")


KS_TARGET = "en"


@register("ks_drift_doc_lengths", sql=f"""
    WITH l AS (SELECT n_chars AS len,
                      CASE WHEN lang = '{KS_TARGET}' THEN 1 ELSE 0 END AS e
               FROM documents),
    g AS (SELECT len, CAST(SUM(e) AS BIGINT) AS a,
                 CAST(SUM(1 - e) AS BIGINT) AS b
          FROM l GROUP BY len),
    t AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                 CAST(SUM(b) AS BIGINT) AS nb FROM g),
    c AS (SELECT len, CAST(SUM(a) OVER (ORDER BY len) AS BIGINT) AS ca,
                 CAST(SUM(b) OVER (ORDER BY len) AS BIGINT) AS cb
          FROM g),
    d AS (SELECT len, CAST(abs(ca * nb - cb * na) AS BIGINT) AS dnum
          FROM c, t)
    SELECT d.len AS at_len, d.dnum AS ks_num,
           t.na AS n_en, t.nb AS n_other
    FROM d, t ORDER BY d.dnum DESC, d.len LIMIT 1""")
def ks_drift_doc_lengths(sf_dir: str):
    """Distribution-drift gate: the two-sample Kolmogorov–Smirnov
    statistic between the '{en}' and non-'{en}' document-length
    distributions, kept EXACT by cross-multiplication — D·n_a·n_b =
    max|cum_a·n_b − cum_b·n_a| is pure int64, no ECDF floats (the
    rational-output rule); ties broken toward the smallest attaining
    length. The pre-training drift check between corpus slices.

    Shape: per-batch (length, a, b) partials → one tiny length-keyed
    groupby; the ordered ECDF fold runs on the driver over the
    LENGTH DOMAIN, which is bounded by max document length (same
    scale contract as the vocabulary ops) — never over rows."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["n_chars", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        ln = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        en = (t["lang"].to_numpy(zero_copy_only=False)
              == KS_TARGET).astype(np.int64)
        df = pd.DataFrame({"len": ln, "a": en, "b": 1 - en})
        return pa.Table.from_pandas(
            df.groupby("len", as_index=False).sum(), preserve_index=False)

    g = ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True) \
        .groupby("len").aggregate(Sum("a", alias_name="a"),
                                  Sum("b", alias_name="b")).take_all()
    g.sort(key=lambda r: r["len"])
    lens = np.array([r["len"] for r in g], dtype=np.int64)
    a = np.array([r["a"] for r in g], dtype=np.int64)
    b = np.array([r["b"] for r in g], dtype=np.int64)
    na, nb = a.sum(), b.sum()
    dnum = np.abs(np.cumsum(a) * nb - np.cumsum(b) * na)
    i = int(np.lexsort((lens, -dnum))[0])
    return pd.DataFrame([{"at_len": lens[i], "ks_num": dnum[i],
                          "n_en": na, "n_other": nb}])


@register("source_vocab_overlap", sql="""
    WITH ex AS (SELECT source, unnest(string_split(text, ' ')) AS token
                FROM documents),
    d AS (SELECT DISTINCT source, token FROM ex WHERE token <> ''),
    v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM d
          GROUP BY source),
    p AS (SELECT a.source AS src_a, b.source AS src_b
          FROM d a JOIN d b ON a.token = b.token AND a.source < b.source),
    c AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_common
          FROM p GROUP BY 1, 2)
    SELECT c.src_a, c.src_b, c.n_common, va.nv AS n_a, vb.nv AS n_b
    FROM c JOIN v va ON va.source = c.src_a
           JOIN v vb ON vb.source = c.src_b""")
def source_vocab_overlap(sf_dir: str):
    """Pairwise corpus-slice similarity: vocabulary overlap between every
    source pair (n_common + both vocab sizes — Jaccard is the consumer's
    one division). Shape: distinct (source, token) pairs pre-deduped per
    batch, ONE token-keyed shuffle; each token bucket emits its source
    PAIRS pre-counted (a token's source list is bounded by |sources|),
    plus per-source vocab marks — the final groupby handles
    ≤ |sources|² + |sources| rows. The corpus never materializes a
    token × token join."""
    from ray.data.aggregate import Sum

    from ..stages.shuffle import grouped_apply

    ds = read_table(sf_dir, "documents", ["text", "source"])

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(pc.cast(t["text"], pa.string()), ""), " ")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        tok = flat.to_numpy(zero_copy_only=False)
        keep = tok != ""
        df = pd.DataFrame({"token": tok[keep], "source": src[keep]})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    def per_token(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("token", sort=False):
            srcs = np.unique(g["source"].to_numpy())
            # vocab mark rows: (source, "") counts this token once
            out_a.append(srcs)
            out_b.append(np.full(len(srcs), "", dtype=object))
            if len(srcs) > 1:
                iu = np.triu_indices(len(srcs), 1)
                out_a.append(srcs[iu[0]])
                out_b.append(srcs[iu[1]])
        if not out_a:
            return pd.DataFrame({"src_a": pd.Series([], dtype="object"),
                                 "src_b": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"src_a": np.concatenate(out_a),
                           "src_b": np.concatenate(out_b)})
        return df.groupby(["src_a", "src_b"], as_index=False).size() \
            .rename(columns={"size": "n"})

    dedup = ds.map_batches(pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    partials = grouped_apply(dedup, ["token"], per_token)
    agg = partials.groupby(["src_a", "src_b"]).aggregate(
        Sum("n", alias_name="n")).take_all()     # ≤ |sources|² rows
    vocab = {r["src_a"]: int(r["n"]) for r in agg if r["src_b"] == ""}
    rows = [{"src_a": r["src_a"], "src_b": r["src_b"],
             "n_common": np.int64(r["n"]),
             "n_a": np.int64(vocab[r["src_a"]]),
             "n_b": np.int64(vocab[r["src_b"]])}
            for r in agg if r["src_b"] != ""]
    return pd.DataFrame(rows)


# ------------------------------------------------------ k-anonymity audit

KANON_K = 5      # groups smaller than K are re-identification risks
KANON_RES = 5


def _kanon_sql() -> str:
    from ..functions import cells, points

    x, y = points.sql_xy("doc_id")
    return f"""
    WITH q AS (SELECT lang, source,
                      {cells.sql_cell(x, y, KANON_RES)} AS cell
               FROM documents),
    g AS (SELECT lang, source, cell, CAST(COUNT(*) AS BIGINT) AS c
          FROM q GROUP BY 1, 2, 3)
    SELECT c AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(CASE WHEN c < {KANON_K} THEN 1 ELSE 0 END AS BIGINT)
               AS risky
    FROM g GROUP BY 1"""


@register("k_anonymity_audit", sql=_kanon_sql)
def k_anonymity_audit(sf_dir: str):
    """k-anonymity audit over the quasi-identifier tuple
    (lang, source, res-{KANON_RES} cell) — the privacy-compliance sibling
    of pii_scan_counts: the group-size histogram of the equivalence
    classes, each size flagged risky when below k={KANON_K} (rows in such
    groups are re-identifiable; a release pipeline suppresses or
    generalizes them). Scale shape: quasi-identifiers derive inside the
    scan; per-batch (lang, source, cell) partial counts are the only
    shuffle; the size histogram folds per-batch partials of the
    (bounded) group table — documents themselves never move."""
    from ..functions import cells as _  # noqa: F401 (sql twin symmetry)
    from ..sources.parquet import read_table
    from ..stages.derive import derive_and_encode
    from ..stages.shuffle import partial_group_counts

    ds = read_table(sf_dir, "documents", ["doc_id", "lang", "source"])
    ds = ds.map_batches(derive_and_encode("doc_id", (KANON_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: t.select(["lang", "source", f"cell{KANON_RES}"])
        .rename_columns(["lang", "source", "cell"]),
        batch_format="pyarrow")
    groups = partial_group_counts(ds, ["lang", "source", "cell"],
                                  count_col="c")

    def hist_part(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        return (pa.table({"group_size": pa.array(c),
                          "n_groups": pa.array(np.ones(len(c), np.int64)),
                          "n_docs": pa.array(c)})
                .group_by(["group_size"])
                .aggregate([("n_groups", "sum"), ("n_docs", "sum")])
                .rename_columns(["group_size", "n_groups", "n_docs"]))

    from ray.data.aggregate import Sum
    agg = (groups.map_batches(hist_part, batch_format="pyarrow")
           .groupby("group_size")
           .aggregate(Sum("n_groups", alias_name="n_groups"),
                      Sum("n_docs", alias_name="n_docs")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["group_size", "n_groups", "n_docs"])
        gs = t["group_size"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "risky", pa.array((gs < KANON_K).astype(np.int64)))

    return agg.map_batches(finish, batch_format="pyarrow")


LDIV_L = 3       # classes with fewer distinct sensitive values are risky


def _ldiv_sql() -> str:
    from ..functions import cells, points

    x, y = points.sql_xy("doc_id")
    return f"""
    WITH q AS (SELECT lang, {cells.sql_cell(x, y, KANON_RES)} AS cell,
                      source
               FROM documents),
    d AS (SELECT DISTINCT lang, cell, source FROM q),
    g AS (SELECT lang, cell, CAST(COUNT(*) AS BIGINT) AS ndist
          FROM d GROUP BY 1, 2)
    SELECT ndist AS n_distinct_sensitive,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(CASE WHEN ndist < {LDIV_L} THEN 1 ELSE 0 END AS BIGINT)
               AS risky
    FROM g GROUP BY 1"""


@register("l_diversity_audit", sql=_ldiv_sql)
def l_diversity_audit(sf_dir: str):
    """l-diversity audit — k-anonymity's companion (a k-anonymous class
    is still disclosive if everyone in it shares the sensitive value):
    per (lang, res-{KANON_RES} cell) equivalence class, the number of
    DISTINCT sensitive values (source), histogrammed with a risky flag
    below l={LDIV_L}. Shape: per-batch distinct (quasi-id, sensitive)
    partials → one dedup shuffle of distinct triples → per-class distinct
    counts → bounded histogram fold; text never moves."""
    from ..sources.parquet import read_table
    from ..stages.derive import derive_and_encode
    from ..stages.shuffle import partial_group_counts
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["doc_id", "lang", "source"])
    ds = ds.map_batches(derive_and_encode("doc_id", (KANON_RES,)),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: t.select(["lang", f"cell{KANON_RES}", "source"])
        .rename_columns(["lang", "cell", "source"]),
        batch_format="pyarrow")
    # distinct triples (counts discarded — the shuffle IS the dedup)
    trip = partial_group_counts(ds, ["lang", "cell", "source"],
                                count_col="_c")

    def per_class(t: pa.Table) -> pa.Table:
        return (t.select(["lang", "cell"])
                .append_column("d", pa.array(np.ones(t.num_rows, np.int64)))
                .group_by(["lang", "cell"]).aggregate([("d", "sum")])
                .rename_columns(["lang", "cell", "ndist"]))

    # triples arrive deduped (one row per triple after the groupby), so
    # per-batch partial distinct-counts sum exactly
    cls = (trip.map_batches(per_class, batch_format="pyarrow")
           .groupby(["lang", "cell"])
           .aggregate(Sum("ndist", alias_name="ndist")))

    def hist_part(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["lang", "cell", "ndist"])
        nd = t["ndist"].to_numpy(zero_copy_only=False)
        return (pa.table({"n_distinct_sensitive": pa.array(nd),
                          "n_classes": pa.array(np.ones(len(nd), np.int64))})
                .group_by(["n_distinct_sensitive"])
                .aggregate([("n_classes", "sum")])
                .rename_columns(["n_distinct_sensitive", "n_classes"]))

    agg = (cls.map_batches(hist_part, batch_format="pyarrow")
           .groupby("n_distinct_sensitive")
           .aggregate(Sum("n_classes", alias_name="n_classes")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["n_distinct_sensitive", "n_classes"])
        nd = t["n_distinct_sensitive"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "risky", pa.array((nd < LDIV_L).astype(np.int64)))

    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------- URL canonicalization + dedup (tracking params)

CANON_PATH_MOD = 41      # shared page paths → real dup groups
CANON_HOST_MOD = 13


@register("url_canonical_dedup", sql=lambda: f"""
    WITH u AS (SELECT doc_id,
                      'https://h' || CAST(doc_id % {CANON_HOST_MOD}
                                          AS VARCHAR)
                      || '.ex.org/page/'
                      || CAST(doc_id % {CANON_PATH_MOD} AS VARCHAR)
                      || CASE WHEN doc_id % 2 = 0
                              THEN '?utm=x' || CAST(doc_id AS VARCHAR)
                              ELSE '' END AS url
               FROM documents),
    c AS (SELECT doc_id, url,
                 CASE WHEN strpos(url, '?') > 0
                      THEN substr(url, 1, strpos(url, '?') - 1)
                      ELSE url END AS canonical
          FROM u)
    SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE url <> canonical) AS BIGINT)
               AS n_tracked,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc
    FROM c GROUP BY 1""")
def url_canonical_dedup(sf_dir: str):
    """URL canonicalization + dedup — the web-crawl preprocessing step
    (the SAME page arrives under many tracking-parameter variants;
    naive exact-URL dedup misses them all): strip the query string,
    group by canonical form, keep the earliest citing doc. Planted
    deterministic URLs (shared page paths + utm params on every even
    doc, identical on both sides — the content_queries fixture pattern)
    give real dup groups at every sf. Shape: URLs derive + canonicalize
    inside the scan (vectorized Arrow string kernels); only
    (canonical, counts, min-doc) partials shuffle."""
    from ray.data.aggregate import Min, Sum

    ds = read_table(sf_dir, "documents", ["doc_id"])

    def scan(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        canonical = np.char.add(np.char.add(np.char.add(
            "https://h", (d % CANON_HOST_MOD).astype("U2")),
            ".ex.org/page/"), (d % CANON_PATH_MOD).astype("U2"))
        tracked = (d % 2 == 0).astype(np.int64)
        g = pd.DataFrame({"canonical": canonical, "doc_id": d,
                          "tracked": tracked})
        out = (g.groupby("canonical", as_index=False)
               .agg(n_docs=("doc_id", "size"),
                    n_tracked=("tracked", "sum"),
                    keeper_doc=("doc_id", "min")))
        for c in ("n_docs", "n_tracked", "keeper_doc"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (ds.map_batches(scan, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("canonical")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tracked", alias_name="n_tracked"),
                      Min("keeper_doc", alias_name="keeper_doc")))
    return agg.map_batches(
        lambda t: t.rename_columns(["canonical", "n_docs", "n_tracked",
                                    "keeper_doc"]),
        batch_format="pyarrow")
