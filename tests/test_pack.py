"""Unit tests for sequence packing (stages/pack.py): layout arithmetic on
a planted corpus with known token counts, boundary straddling, window
coverage, and block-count invariance."""
from __future__ import annotations

import pandas as pd
import ray.data

from laji_pygeoapi_ray.stages.pack import (pack_layout, token_counts,
                                           window_coverage)

# doc_id: tokens — window=4 → stream offsets 0,3,8,10,17
_DOCS = pd.DataFrame({
    "doc_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
    "text": ["a b c",            # 3 tokens  [0,3)   → window 0
             "d e f g h",        # 5 tokens  [3,8)   → windows 0-1
             "i j",              # 2 tokens  [8,10)  → window 2
             "k l m n o p q",    # 7 tokens  [10,17) → windows 2-4
             ""],                # 1 token (empty field) [17,18) → window 4
})


def _layout(blocks: int) -> pd.DataFrame:
    ds = ray.data.from_pandas(_DOCS).repartition(blocks)
    out = pack_layout(token_counts(ds), 4, width=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_layout_offsets_and_window_spans():
    for blocks in (1, 3):
        out = _layout(blocks)
        assert out["n_tokens"].tolist() == [3, 5, 2, 7, 1]
        assert out["start_offset"].tolist() == [0, 3, 8, 10, 17]
        assert out["first_window"].tolist() == [0, 0, 2, 2, 4]
        assert out["last_window"].tolist() == [0, 1, 2, 4, 4]
        assert out["n_windows"].tolist() == [1, 2, 1, 3, 1]


def test_window_coverage_counts():
    ds = ray.data.from_pandas(_DOCS)
    layout = pack_layout(token_counts(ds), 4, width=2)
    cov = (window_coverage(layout).to_pandas()
           .sort_values("window_id").reset_index(drop=True))
    # w0: docs 0,1 (doc 0 full); w1: doc 1; w2: docs 2,3 (doc 2 full);
    # w3: doc 3; w4: docs 3,4 (doc 4 full)
    assert cov["window_id"].tolist() == [0, 1, 2, 3, 4]
    assert cov["n_docs"].tolist() == [2, 1, 2, 1, 2]
    assert cov["n_full_docs"].tolist() == [1, 0, 1, 0, 1]
