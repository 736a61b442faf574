"""Deterministic occurrence-point derivation.

The reference ingests real occurrence coordinates from the laji.fi warehouse
(``/root/reference/pygeoapi/scripts/load_data.py:184-202``). The new engine's
synthetic input tables carry no coordinates, so every record's point is
*derived deterministically from its integer key* with a Knuth multiplicative
hash — the same rule is emitted as DuckDB SQL so the oracle reproduces the
exact float64 values (every constant is formatted with ``repr`` and cast to
DOUBLE; every arithmetic op appears in the same order in numpy and SQL).

Points land in the Finland-like bbox used by the reference's collection
metadata (``edit_config.py:79``), with a planted dense "Helsinki" cluster
(~30 % of rows around 24.94 E / 60.17 N — the coordinate used throughout the
reference tests, e.g. ``test_compute_variables.py:49``) to exercise skew
handling (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

# Finland-ish bbox (WGS84 lon/lat), per the reference collection extent
# (/root/reference/pygeoapi/scripts/edit_config.py:79).
FIN_X0, FIN_Y0, FIN_X1, FIN_Y1 = 19.08, 59.45, 31.59, 70.09
# Dense "Helsinki" cluster box around 24.94 E / 60.17 N.
HEL_X0, HEL_Y0, HEL_X1, HEL_Y1 = 24.6, 59.95, 25.4, 60.45
# Fraction of rows in the cluster: hx % 10 < 3  →  30 %.
CLUSTER_MOD, CLUSTER_LT = 10, 3

MULT_X = 2654435761          # Knuth multiplicative hash constants
MULT_Y = 2246822519
M32 = 4294967296             # 2**32

# float64 spans, computed once in Python so numpy and SQL share the exact value
_W = FIN_X1 - FIN_X0
_H = FIN_Y1 - FIN_Y0
_HW = HEL_X1 - HEL_X0
_HH = HEL_Y1 - HEL_Y0


def _d(v: float) -> str:
    """Exact float64 literal for SQL. The repr is passed as a STRING cast:
    DuckDB parses bare numeric literals through DECIMAL, which rounds the
    17th significant digit away (measured: 0.09773437500000001 → 0.097734375);
    ``CAST('…' AS DOUBLE)`` uses the correctly-rounded strtod path and
    round-trips bit-exactly."""
    return f"CAST('{v!r}' AS DOUBLE)"


def hash_xy(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """32-bit hashes (hx, hy) of an int64 key column. Valid for keys < 2**31
    (key * MULT stays within int64; the synthetic tables' keys are far below).
    ``% 2**32`` is computed as ``& (2**32-1)`` — identical for non-negative
    values and ~20× cheaper than int64 division in the hot path."""
    k = keys.astype(np.int64, copy=False)
    mask = np.int64(M32 - 1)
    hx = (k * MULT_X) & mask
    hy = ((k + 1) * MULT_Y) & mask
    return hx, hy


_CHUNK = 16384  # keep temporaries below glibc's mmap threshold: at 10⁸-row
                # scale, full-array temps cause a concurrent page-fault storm
                # across the actor pool (measured 10× per-core slowdown)


def derive_xy(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """key → (x, y) float64 point; ~30 % of keys fall in the Helsinki box."""
    n = len(keys)
    if n > _CHUNK:
        x = np.empty(n, dtype=np.float64)
        y = np.empty(n, dtype=np.float64)
        for i in range(0, n, _CHUNK):
            x[i:i + _CHUNK], y[i:i + _CHUNK] = derive_xy(keys[i:i + _CHUNK])
        return x, y
    hx, hy = hash_xy(keys)
    ux = hx.astype(np.float64) / np.float64(M32)
    uy = hy.astype(np.float64) / np.float64(M32)
    cluster = (hx % CLUSTER_MOD) < CLUSTER_LT
    x = np.where(cluster, HEL_X0 + ux * _HW, FIN_X0 + ux * _W)
    y = np.where(cluster, HEL_Y0 + uy * _HH, FIN_Y0 + uy * _H)
    return x, y


def sql_hx(key: str) -> str:
    # explicit BIGINT: an INT32-typed key column would overflow in k*MULT
    # (hypothesis-found edge at k = 2^31 - 1)
    return f"((CAST({key} AS BIGINT) * {MULT_X}) % {M32})"


def sql_hy(key: str) -> str:
    return f"(((CAST({key} AS BIGINT) + 1) * {MULT_Y}) % {M32})"


def sql_xy(key: str) -> tuple[str, str]:
    """DuckDB expressions for (x, y) given an integer key column expression.

    Mirrors :func:`derive_xy` op-for-op on float64.
    """
    hx, hy = sql_hx(key), sql_hy(key)
    ux = f"(CAST({hx} AS DOUBLE) / {_d(float(M32))})"
    uy = f"(CAST({hy} AS DOUBLE) / {_d(float(M32))})"
    cond = f"(({hx}) % {CLUSTER_MOD}) < {CLUSTER_LT}"
    x = (f"(CASE WHEN {cond} THEN {_d(HEL_X0)} + {ux} * {_d(_HW)} "
         f"ELSE {_d(FIN_X0)} + {ux} * {_d(_W)} END)")
    y = (f"(CASE WHEN {cond} THEN {_d(HEL_Y0)} + {uy} * {_d(_HH)} "
         f"ELSE {_d(FIN_Y0)} + {uy} * {_d(_H)} END)")
    return x, y
