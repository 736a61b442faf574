"""Oracle-parity tests for the shuffle queries (sf0.001)."""
from __future__ import annotations

import pytest

from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", [
    "dedup_events_latest", "dedup_docs_first",
    "merge_similar_lineitem", "quality_freq_events",
    "table_dates_events",
])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)
