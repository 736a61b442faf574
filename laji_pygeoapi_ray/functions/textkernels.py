"""Text-analysis kernels for the training-data pipeline operators:
token statistics, content fingerprinting, shingling, MinHash, SimHash and a
char-n-gram language-ID profile classifier.

Tokenization contract (shared with the DuckDB oracles): a token is a
``' '``-separated field — ``string_split(text, ' ')`` in SQL, ``str.split(' ')``
in Python — including empty fields, so both sides agree on every input.
"""
from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np

STOPWORDS = ("the", "a")

# MinHash parameters: 64 permutations h_i(g) = (a_i·g + b_i) mod PRIME
MINHASH_PERMS = 64
_PRIME = (1 << 61) - 1
_rng = np.random.default_rng(12345)
_A = _rng.integers(1, _PRIME, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _PRIME, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)


def token_stats(texts) -> dict[str, np.ndarray]:
    """Per-text token statistics (all exactly reproducible in DuckDB):
    n_tokens, distinct_tokens, stop_tokens, ttr (=distinct/n),
    stop_ratio (=stop/n). Vectorized: one Arrow split, token counts from
    list lengths, distinct via a (doc, token-hash) sort+dedup, stopword
    hits via ``is_in`` — no per-doc Python loop."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), pa.string())
    toks = pc.split_pattern(pc.fill_null(pc.cast(col, pa.string()), ""), " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    doc_of = np.repeat(np.arange(len(n)), n)
    th = pd.util.hash_array(flat.to_numpy(zero_copy_only=False)) \
        .astype(np.uint64)
    order = np.lexsort((th, doc_of))
    ds_, hs_ = doc_of[order], th[order]
    uniq = np.ones(len(hs_), dtype=bool)
    uniq[1:] = (hs_[1:] != hs_[:-1]) | (ds_[1:] != ds_[:-1])
    d = np.bincount(ds_[uniq], minlength=len(n)).astype(np.int64)
    stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))) \
        .to_numpy(zero_copy_only=False)
    s_ = np.bincount(doc_of[stop], minlength=len(n)).astype(np.int64)
    nf = n.astype(np.float64)
    return {"n_tokens": n, "distinct_tokens": d, "stop_tokens": s_,
            "ttr": d.astype(np.float64) / nf,
            "stop_ratio": s_.astype(np.float64) / nf}


def md5_fingerprint(texts: list[str]) -> list[str]:
    """Content fingerprint = hex MD5 of the UTF-8 text (DuckDB ``md5``)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def word_shingles(text: str, n: int = 3) -> set[str]:
    """Distinct word n-gram shingles, joined with single spaces (SQL:
    ``t[g] || ' ' || t[g+1] || ' ' || t[g+2]``)."""
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def shingle_hashes(shingles: set[str]) -> np.ndarray:
    """Stable 61-bit hash per shingle (blake2b-8; deterministic across
    processes, unlike Python's salted ``hash``)."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "little") % _PRIME for g in shingles),
        dtype=np.uint64, count=len(shingles))


def minhash_signature(hashes: np.ndarray) -> np.ndarray:
    """(G,) shingle hashes → (MINHASH_PERMS,) uint64 signature."""
    if hashes.size == 0:
        return np.full(MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (G, P): (a*g + b) mod p — uint64 wraparound is fine for min-comparison
    # consistency as long as both sides use the same arithmetic (we only ever
    # compare engine-side signatures with engine-side signatures)
    m = (hashes[:, None] * _A[None, :] + _B[None, :]) % _PRIME
    return m.min(axis=0)


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into ``bands`` bands and hash each band → the LSH
    bucket keys (band_id in high bits)."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        h = hashlib.blake2b(sig[b * rows:(b + 1) * rows].tobytes(),
                            digest_size=8).digest()
        out.append((b << 56) | (int.from_bytes(h, "little") >> 8))
    return out


def simhash64(hashes: np.ndarray) -> np.int64:
    """64-bit SimHash of the shingle hash set (sign of per-bit vote sums)."""
    if hashes.size == 0:
        return np.int64(0)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    v = np.uint64(0)
    for i in range(64):
        if votes[i] >= 0:
            v |= np.uint64(1) << np.uint64(i)
    return v.astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 simhashes."""
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


class LangProfile:
    """Char-trigram cosine language-ID (the 'n-gram heuristic' op).
    ``fit`` builds per-language trigram frequency profiles from labelled
    text; ``predict`` classifies by max cosine; deterministic tie-break by
    language name."""

    def __init__(self, n: int = 3, top: int = 300):
        self.n, self.top = n, top
        self.profiles: dict[str, dict[str, float]] = {}

    @staticmethod
    def _grams(text: str, n: int) -> Counter:
        t = f" {text.lower()} "
        return Counter(t[i:i + n] for i in range(len(t) - n + 1))

    def fit(self, texts: list[str], labels: list[str]) -> "LangProfile":
        agg: dict[str, Counter] = {}
        for t, l in zip(texts, labels):
            agg.setdefault(l, Counter()).update(self._grams(t, self.n))
        for l, c in agg.items():
            topg = dict(c.most_common(self.top))
            norm = np.sqrt(sum(v * v for v in topg.values()))
            self.profiles[l] = {g: v / norm for g, v in topg.items()}
        return self

    def predict(self, texts: list[str]) -> list[str]:
        langs = sorted(self.profiles)
        out = []
        for t in texts:
            g = self._grams(t, self.n)
            norm = np.sqrt(sum(v * v for v in g.values())) or 1.0
            best, best_s = langs[0], -1.0
            for l in langs:
                prof = self.profiles[l]
                s = sum(v * prof.get(k, 0.0) for k, v in g.items()) / norm
                if s > best_s:
                    best, best_s = l, s
            out.append(best)
        return out


def minhash_signature_batch(gram_hashes: np.ndarray,
                            starts: np.ndarray) -> np.ndarray:
    """Batched minhash: flat per-doc gram-hash segments (``starts`` = first
    index of each doc's segment, docs with 0 grams excluded) →
    (n_docs, MINHASH_PERMS) uint64 signatures. One vectorized
    ``minimum.reduceat`` per permutation — no per-doc Python loop; memory
    stays O(total_grams) because permutations stream one at a time.
    Duplicate grams within a doc are harmless (min is idempotent), so no
    per-doc distinct pass is needed."""
    n = len(starts)
    sig = np.empty((n, MINHASH_PERMS), dtype=np.uint64)
    if len(gram_hashes) == 0 or n == 0:
        return sig
    for j in range(MINHASH_PERMS):
        v = (gram_hashes * _A[j] + _B[j]) % _PRIME
        sig[:, j] = np.minimum.reduceat(v, starts)
    return sig


_BANDMIX = np.uint64(0x9E3779B97F4A7C15)


def minhash_bands_batch(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n, PERMS) signatures → (n, bands) int64 LSH bucket keys. Each
    band's rows fold through a multiply-xor mix (uint64 wraparound;
    deterministic, vectorized — replaces the per-band blake2b of
    :func:`minhash_bands`, same band-id-in-high-bits layout)."""
    n, perms = sig.shape
    rows = perms // bands
    out = np.empty((n, bands), dtype=np.int64)
    for b in range(bands):
        h = np.full(n, _BANDMIX, dtype=np.uint64)
        for r in range(rows):
            h = (h * _BANDMIX) ^ sig[:, b * rows + r]
        h ^= h >> np.uint64(29)
        h = h * _BANDMIX
        h ^= h >> np.uint64(32)
        out[:, b] = ((np.uint64(b) << np.uint64(56))
                     | (h >> np.uint64(8))).astype(np.int64)
    return out


# --- SQL-twinnable 64-bit string hash (simhash family) ----------------------
# Byte-wise polynomial mod POLY_P (Horner, B=257) spread to 64 bits by the
# splitmix64 finalizer (Vigna's public-domain mix constants).  Chosen over a
# keyed siphash precisely because every step is reproducible in DuckDB SQL:
# the polynomial via list_reduce over codepoints (ASCII corpus: unicode ==
# byte, the rolling-fingerprint contract), the wrap-around uint64 multiply
# via HUGEINT 32-bit-split arithmetic (sql_wrap_mul), xor-shift via UBIGINT
# (sql_xor_shift).  numpy side wraps natively in uint64.
POLY_P = 2147483647            # 2^31 - 1
POLY_B = 257
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_TWO32 = 1 << 32
_TWO64 = 1 << 64


def mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (wrap-around semantics)."""
    z = np.asarray(z, dtype=np.uint64).copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(_MIX1)
    z ^= z >> np.uint64(27)
    z *= np.uint64(_MIX2)
    z ^= z >> np.uint64(31)
    return z


def poly_mix_hash(strings) -> np.ndarray:
    """uint64 hash per string: polynomial-mod-POLY_P over the raw bytes,
    then :func:`mix64`.  Fully vectorized straight off the Arrow string
    buffers (offsets + data; no per-row Python).  Safe bounds: per-byte
    contribution < 2^39 and a 2^24-byte string's segment sum < 2^55 —
    both inside int64."""
    import pyarrow as pa

    arr = strings
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset:              # sliced view (rare): rebuild so the raw
        arr = pa.array(arr.to_pylist(), pa.string())  # buffers index from 0
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                        count=n + 1).astype(np.int64)
    base = off[0]
    off = off - base
    nbytes = int(off[-1])
    if nbytes:
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                             count=nbytes + int(base))[int(base):]
    else:
        data = np.empty(0, np.uint8)
    slen = np.diff(off)
    sums = np.zeros(n, dtype=np.int64)
    if nbytes:
        sid = np.repeat(np.arange(n), slen)
        from_end = off[sid + 1] - 1 - np.arange(nbytes)
        maxlen = int(slen.max())
        pow_ = np.empty(maxlen, dtype=np.int64)
        pow_[0] = 1
        for k in range(1, maxlen):
            pow_[k] = (pow_[k - 1] * POLY_B) % POLY_P
        contrib = (data.astype(np.int64) * pow_[from_end]) % POLY_P
        has = slen > 0
        sums[has] = np.add.reduceat(contrib, off[:-1][has]) % POLY_P
    return mix64(sums.astype(np.uint64))


def sql_wrap_mul(expr: str, m: int) -> str:
    """HUGEINT SQL expression: ``(expr * m) mod 2^64`` for expr in
    [0, 2^64) — DuckDB integer multiply raises on overflow, so split the
    multiplicand at 32 bits (every partial product fits HUGEINT)."""
    mlo = m % _TWO32
    return (f"((({expr}) % {_TWO32}) * {m} + "
            f"((({expr}) // {_TWO32}) * {mlo} % {_TWO64}) * {_TWO32})"
            f" % {_TWO64}")


def sql_xor_shift(expr: str, k: int) -> str:
    """HUGEINT SQL expression: ``expr XOR (expr >> k)`` for expr in
    [0, 2^64) (xor through UBIGINT; shift as floor division)."""
    return (f"CAST(xor(CAST(({expr}) AS UBIGINT), "
            f"CAST(({expr}) // {1 << k} AS UBIGINT)) AS HUGEINT)")


def sql_poly_hash(col: str) -> str:
    """BIGINT SQL expression: the polynomial-mod-POLY_P of string column
    ``col`` — byte-for-byte the numpy Horner loop (ASCII: unicode(c) ==
    byte value)."""
    return (f"list_reduce(list_transform(range(1, length({col}) + 1), "
            f"i -> CAST(unicode(({col})[i]) AS BIGINT)), "
            f"(a, c) -> (a * {POLY_B} + c) % {POLY_P})")


def sql_mix64_ctes(src: str, carry: str, z0: str = "z0", out: str = "h",
                   prefix: str = "mx") -> str:
    """Three chained CTE definitions applying :func:`mix64` to HUGEINT
    column ``z0`` of CTE ``src``; the last CTE (``{prefix}3``) exposes
    ``carry`` columns plus ``out``.  Splice into a WITH list."""
    s1 = sql_wrap_mul(sql_xor_shift(z0, 30), _MIX1)
    s2 = sql_wrap_mul(sql_xor_shift("z1", 27), _MIX2)
    s3 = sql_xor_shift("z2", 31)
    return (f"{prefix}1 AS (SELECT {carry}, {s1} AS z1 FROM {src}),\n"
            f"{prefix}2 AS (SELECT {carry}, {s2} AS z2 FROM {prefix}1),\n"
            f"{prefix}3 AS (SELECT {carry}, {s3} AS {out} FROM {prefix}2)")


def sql_xor2(x: str, y: str) -> str:
    """HUGEINT SQL expression: ``x XOR y`` for both in [0, 2^64)."""
    return (f"CAST(xor(CAST(({x}) AS UBIGINT), CAST(({y}) AS UBIGINT)) "
            f"AS HUGEINT)")


def sql_wrap_mul_col(g: str, a: str) -> str:
    """HUGEINT SQL expression: ``(g * a) mod 2^64`` where BOTH operands are
    columns in [0, 2^64) (32-bit split keeps every partial in HUGEINT)."""
    return (f"((({g}) % {_TWO32}) * ({a}) + "
            f"((({g}) // {_TWO32}) * (({a}) % {_TWO32}) % {_TWO64}) "
            f"* {_TWO32}) % {_TWO64}")


def minhash_perm_constants() -> list[tuple[int, int, int]]:
    """The (j, a_j, b_j) minhash permutation constants — exported so the
    DuckDB twin recomputes signatures with the exact same parameters."""
    return [(j, int(_A[j]), int(_B[j])) for j in range(MINHASH_PERMS)]


def repetition_stats(texts) -> dict[str, np.ndarray]:
    """Gopher-style per-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1): the fraction of word-2-grams
    occupied by the single most frequent 2-gram, and the fraction of
    word-3-gram instances whose gram occurs more than once in the doc.
    Counts are exact and reproducible in SQL (grams compare as strings in
    the DuckDB twin; here as 64-bit combined token hashes — same
    negligible-collision contract as ``token_stats``'s distinct count).
    Fully vectorized: one Arrow split, consecutive-token hash combines,
    one lexsort per gram size; no per-doc Python loop."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), pa.string())
    toks = pc.split_pattern(pc.fill_null(pc.cast(col, pa.string()), ""), " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ndocs = len(n)
    doc_of = np.repeat(np.arange(ndocs), n)
    th = pd.util.hash_array(flat.to_numpy(zero_copy_only=False)) \
        .astype(np.uint64)
    starts = np.cumsum(n) - n
    pos = np.arange(len(th)) - np.repeat(starts, n)
    doc_len = np.repeat(n, n)
    mix = np.uint64(0x9E3779B97F4A7C15)

    def gram_counts(k: int):
        """(per-doc instance count, per-distinct-gram run doc + count)."""
        idx = np.nonzero(pos <= doc_len - k)[0]
        if len(idx) == 0:
            z = np.zeros(ndocs, np.int64)
            return z, np.empty(0, np.int64), np.empty(0, np.int64)
        h = th[idx].copy()
        for j in range(1, k):
            h = h * mix + th[idx + j]
        d = doc_of[idx]
        order = np.lexsort((h, d))
        ds_, hs_ = d[order], h[order]
        new = np.ones(len(hs_), bool)
        new[1:] = (hs_[1:] != hs_[:-1]) | (ds_[1:] != ds_[:-1])
        run_id = np.cumsum(new) - 1
        cnt = np.bincount(run_id).astype(np.int64)
        total = np.bincount(d, minlength=ndocs).astype(np.int64)
        return total, ds_[new], cnt

    n2, rd2, c2 = gram_counts(2)
    top2 = np.zeros(ndocs, np.int64)
    np.maximum.at(top2, rd2, c2)
    n3, rd3, c3 = gram_counts(3)
    dup3 = np.bincount(rd3, weights=c3 * (c3 >= 2),
                       minlength=ndocs).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        f2 = np.where(n2 > 0, top2 / np.maximum(n2, 1), 0.0)
        f3 = np.where(n3 > 0, dup3 / np.maximum(n3, 1), 0.0)
    return {"n_2grams": n2, "top_2gram_n": top2, "top_2gram_frac": f2,
            "n_3grams": n3, "dup_3gram_n": dup3, "dup_3gram_frac": f3}


def gram_hash_arrays(texts, k: int):
    """Per-document word-k-gram combined hashes (same tokenizer and
    hash-combine contract as ``repetition_stats``). Returns
    ``(n_grams per doc int64, doc index per gram, uint64 hash per gram)``
    — one Arrow split, vectorized position mask, no per-doc loop."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(texts), pa.string())
    toks = pc.split_pattern(pc.fill_null(pc.cast(col, pa.string()), ""), " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ndocs = len(n)
    doc_of = np.repeat(np.arange(ndocs), n)
    th = pd.util.hash_array(flat.to_numpy(zero_copy_only=False)) \
        .astype(np.uint64)
    starts = np.cumsum(n) - n
    pos = np.arange(len(th)) - np.repeat(starts, n)
    idx = np.nonzero(pos <= np.repeat(n, n) - k)[0]
    if len(idx) == 0:
        return (np.zeros(ndocs, np.int64), np.empty(0, np.int64),
                np.empty(0, np.uint64))
    h = th[idx].copy()
    mix = np.uint64(0x9E3779B97F4A7C15)
    for j in range(1, k):
        h = h * mix + th[idx + j]
    d = doc_of[idx]
    return np.bincount(d, minlength=ndocs).astype(np.int64), d, h
