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
