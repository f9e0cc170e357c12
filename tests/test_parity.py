"""Every declared query must hash-match its DuckDB oracle (driver gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.util import assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    if name not in _ORACLES:
        df = _QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_matches_oracle(_QUERIES[name](spark, sf_dir), duck, _ORACLES[name])
