"""Property tests for the fifth-session kernels, each against an
INDEPENDENT reference implementation (the oracle sweep already proves the
query-level SQL twins; these pin the kernels themselves)."""
from __future__ import annotations

import numpy as np
import pandas as pd

from laji_pygeoapi_ray.functions import geohash as gh
from laji_pygeoapi_ray.functions import points


def _ref_geohash(x: float, y: float) -> str:
    """Textbook geohash by interval halving (no bit twiddling) — an
    algorithmically independent twin of gh.encode."""
    x0, x1 = points.FIN_X0, points.FIN_X0 + points._W
    y0, y1 = points.FIN_Y0, points.FIN_Y0 + points._H
    # match the kernel's clip-to-extent quantization exactly: quantize
    # first, then subdivide the integer range (pure-int halving)
    bx = min(max(int(np.floor((x - x0) / points._W * 32768.0)), 0), 32767)
    by = min(max(int(np.floor((y - y0) / points._H * 32768.0)), 0), 32767)
    bits = []
    for i in range(15):
        bits.append((bx >> (14 - i)) & 1)
        bits.append((by >> (14 - i)) & 1)
    out = []
    for j in range(6):
        v = 0
        for b in bits[5 * j:5 * j + 5]:
            v = (v << 1) | b
        out.append(gh.ALPHABET[v])
    return "".join(out)


def test_geohash_matches_reference():
    keys = np.arange(0, 4000, 7, dtype=np.int64)
    x, y = points.derive_xy(keys)
    got = gh.encode(x, y)
    for i in range(len(keys)):
        assert got[i] == _ref_geohash(float(x[i]), float(y[i]))


def test_geohash_prefix_is_coarser_cell():
    """Truncating chars truncates bits: two points sharing a k-char prefix
    sit in the same 5k-bit interleaved cell (the prefix property the
    rollup query relies on)."""
    keys = np.arange(2000, dtype=np.int64)
    x, y = points.derive_xy(keys)
    z = gh.interleave(gh.axis_bits(x, points.FIN_X0, points._W),
                      gh.axis_bits(y, points.FIN_Y0, points._H))
    enc = gh.encode(x, y)
    for k in (2, 4):
        pref = {}
        for i in range(len(keys)):
            pref.setdefault(enc[i][:k], set()).add(int(z[i]) >> (30 - 5 * k))
        for cells in pref.values():
            assert len(cells) == 1


def test_pigeonhole_band_guarantee():
    """Any two 64-bit words at Hamming distance ≤ 7 agree on at least one
    of the 8 disjoint 8-bit bands (the candidate-completeness invariant of
    image_phash_hamming_pairs)."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 63, 500, dtype=np.int64).view(np.uint64)
    nbits = rng.integers(0, 8, 500)            # 0..7 flipped bits
    flip = np.zeros(500, dtype=np.uint64)
    for i in range(500):
        pos = rng.choice(64, int(nbits[i]), replace=False)
        m = np.uint64(0)
        for p in pos:
            m |= np.uint64(1) << np.uint64(p)
        flip[i] = m
    other = base ^ flip
    any_band_eq = np.zeros(500, dtype=bool)
    for b in range(8):
        sh = np.uint64(8 * b)
        any_band_eq |= ((base >> sh) & np.uint64(0xFF)) \
            == ((other >> sh) & np.uint64(0xFF))
    assert any_band_eq.all()


def test_compaction_rule_matches_window_reference():
    """Greedy sorted-run packing: engine rule (exclusive prefix // target)
    == pandas window recompute; fragments never split; group ids are
    nondecreasing in key order."""
    rng = np.random.default_rng(3)
    sizes = rng.integers(1, 4000, 300).astype(np.int64)
    target = 5000
    prefix = np.cumsum(sizes) - sizes
    groups = prefix // target
    ref = (pd.Series(sizes).cumsum().shift(fill_value=0) // target).to_numpy()
    assert (groups == ref).all()
    assert (np.diff(groups) >= 0).all()


def test_chi2_formula_matches_contingency_reference():
    """Engine chi2 (single-division integer rational) == the classic
    sum((O-E)^2/E) over the 2x2 presence table, within float tolerance."""
    rng = np.random.default_rng(11)
    for _ in range(200):
        nen, noth = int(rng.integers(5, 400)), int(rng.integers(5, 400))
        a, b = int(rng.integers(0, nen + 1)), int(rng.integers(0, noth + 1))
        n = nen + noth
        diff = a * (noth - b) - b * (nen - a)
        den = (a + b) * (n - a - b) * nen * noth
        got = 0.0 if den == 0 else (n * diff * diff) / den
        # independent: expected counts
        exp = 0.0
        row = [a + b, n - a - b]
        col = [nen, noth]
        obs = [[a, b], [nen - a, noth - b]]
        if den != 0:
            for i in range(2):
                for j in range(2):
                    e = row[i] * col[j] / n
                    exp += (obs[i][j] - e) ** 2 / e
            assert abs(got - exp) < 1e-8 * max(1.0, exp)
