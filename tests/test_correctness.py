"""Golden-query corpus vs DuckDB oracle (SURVEY.md §5 strategy #1).

Every oracle-bearing registry entry is exercised at sf0.001 with EXACT
value equality — the strictest local gate for the driver's
value-hash comparison. Rows-only entries are smoke-checked for
non-empty, stable schemas.
"""

from __future__ import annotations

import pytest

from clickhouse_realtime_analytics_demo_spark.queries import all_queries
from tests.conftest import SF_DIR, compare_with_oracle

_ALL = all_queries()
_WITH_ORACLE = sorted(n for n, q in _ALL.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, name):
    compare_with_oracle(spark, name)


# rows-only queries that must produce output (no zero-row escape
# hatch): embedding_near_dups carries planted near-dup pairs
_MIN_ROWS = {"embedding_near_dups": 5}


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = _ALL[name]
    df = q.fn(spark, SF_DIR)
    rows = df.collect()
    assert df.schema is not None
    assert len(rows) >= _MIN_ROWS.get(name, 0)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
