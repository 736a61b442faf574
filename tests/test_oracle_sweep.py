"""Full oracle sweep — the driver's correctness gate, in pytest.

The driver's CORRECTNESS_r{N}.json window covers at most ~50 registered
queries per round; this sweep runs EVERY oracle-bearing query against
its DuckDB twin at the driver's own scale factor (sf0.01), so each one
carries machine-checkable proof regardless of where it lands in the
driver's window. One parametrized test per query — a failure names the
query directly.
"""
from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, assert_query_matches_oracle


def _oracle_names() -> list[str]:
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return sorted(e.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_sweep(name: str):
    assert_query_matches_oracle(name, SF_ORACLE)
