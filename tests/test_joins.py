"""Join queries vs oracles."""
from __future__ import annotations

import pytest

from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", [
    "orders_by_mktsegment", "supplier_nation_broadcast",
    "distinct_event_types",
])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)
