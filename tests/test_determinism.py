"""Cross-partitioning determinism gate (VERDICT r6 #7).

``queries/_det.py`` promises order-independent results: decimal money
sums (not float partial-sum order), sorted collect_lists, unique
window tie-breaks. This locks that promise operationally: every
oracle-backed query is executed twice in one session under DIFFERENT
``spark.sql.shuffle.partitions`` (the session's 8, then a co-prime 7)
and the normalized result sets must be IDENTICAL — bit-exact, the
same comparison the driver's value-hash uses. A regression like an
unsorted collect_list or a float sum without the decimal detour shows
up here as a cross-run diff even when each individual run still
matches DuckDB by luck of scheduling.
"""

from __future__ import annotations

import pytest

from clickhouse_realtime_analytics_demo_spark.queries import all_queries
from tests.conftest import SF_DIR, normalize

_WITH_ORACLE = sorted(n for n, q in all_queries().items() if q.oracle is not None)


def _run_normalized(spark, name: str):
    df = all_queries()[name].fn(spark, SF_DIR)
    return normalize([tuple(r) for r in df.collect()], df.columns)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_partitioning_invariant(spark, name):
    conf = spark.conf
    orig = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.shuffle.partitions", "8")
        first = _run_normalized(spark, name)
        conf.set("spark.sql.shuffle.partitions", "7")
        second = _run_normalized(spark, name)
    finally:
        conf.set("spark.sql.shuffle.partitions", orig)
    assert first == second, (
        f"{name}: result depends on shuffle partitioning "
        f"({len(first)} vs {len(second)} rows; first diff: "
        f"{next(((a, b) for a, b in zip(first, second) if a != b), None)})"
    )
