"""Stateless map_batches stages: point derivation + cell encoding.

These are zero-copy Arrow transforms (``batch_format="pyarrow"``): the numpy
kernels read Arrow columns without copies and the derived columns are
appended to the same table. The reference's equivalent step is the
coordinate interpretation done upstream by the warehouse plus the
province-table routing (``/root/reference/pygeoapi/scripts/main.py:193-198``);
here both collapse into `derive point → encode cell` (SURVEY.md §7.1, the
minimum end-to-end slice).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import cells, points


def derive_points(key_col: str):
    """Stage factory: append float64 ``x``/``y`` derived from ``key_col``."""
    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(keys)
        return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))
    return fn


def encode_cells(res: int, out_col: str | None = None):
    """Stage factory: append int64 ``cell{res}`` from existing x/y columns."""
    name = out_col or f"cell{res}"
    def fn(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        return batch.append_column(name, pa.array(cells.encode(x, y, res)))
    return fn


def derive_and_encode_s2(key_col: str, levels: tuple[int, ...] = (11,)):
    """Fused stage: key → point → REAL S2 cell id (``functions/s2.py``) at
    each requested level. The sphere→Hilbert encode runs ONCE at leaf
    level; every coarser level is integer parent arithmetic on the leaf id
    (no re-projection)."""
    from ..functions import s2

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(keys)
        leaf = s2.encode_lonlat(x, y)
        for lv in levels:
            col = leaf if lv >= s2.MAX_LEVEL else s2.parent(leaf, lv)
            batch = batch.append_column(f"s2_{lv}", pa.array(col))
        return batch
    return fn


def derive_and_encode_hex(key_col: str, res: int = 7):
    """Fused stage: key → point → HEX cell id (``functions/hexgrid.py`` —
    the H3-analogue hexagonal lattice). One kernel per batch; only the
    packed int64 hex id is appended."""
    from ..functions import hexgrid

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(keys)
        return batch.append_column(f"hex{res}",
                                   pa.array(hexgrid.hex_id(x, y, res)))
    return fn


def derive_and_encode(key_col: str, resolutions: tuple[int, ...] = (7,)):
    """Fused stage: key → x, y, cell{r} for each requested resolution.
    One kernel invocation per batch; Ray Data would fuse the separate stages
    anyway, but fusing here avoids re-reading x/y from Arrow."""
    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        x, y = points.derive_xy(keys)
        batch = batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))
        for r in resolutions:
            batch = batch.append_column(f"cell{r}", pa.array(cells.encode(x, y, r)))
        return batch
    return fn
