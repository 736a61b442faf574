"""Oracle-parity tests for the geospatial queries (sf0.001 for speed; the
driver re-runs the same comparisons at sf0.01)."""
from __future__ import annotations

import pytest

from tests.conftest import SF_UNIT, assert_query_matches_oracle


@pytest.mark.parametrize("name", [
    "cell_assign", "tile_counts", "tile_bbox",
    "pip_province", "pip_municipality_ely", "province_counts",
    "pip_lineitem_province_counts", "hot_cells", "tile_counts_salted",
])
def test_query_matches_oracle(name):
    assert_query_matches_oracle(name, SF_UNIT)
