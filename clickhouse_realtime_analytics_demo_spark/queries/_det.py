"""Determinism helpers for oracle-compared floating aggregates.

Summing doubles is order-dependent; Spark's partial aggregation over N
partitions and DuckDB's single-threaded fold would differ in the last
bits and break exact value-hash comparison. The fix used throughout:
cast each row's (deterministic, IEEE-identical) double expression to
DECIMAL(18,2), sum exactly (order-independent), cast the final sum
back to double. Averages divide that exact sum by the exact count in
one deterministic double division.

This also mirrors the reference's semantics: its money columns are
``Decimal(10,2)`` (01-create-tables.sql:29,48,59,74), so decimal-exact
revenue sums are the *correct* behavior, not just a test convenience.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def money_sum(expr: Column) -> Column:
    """Order-independent SUM of a money-like double expression."""
    return F.sum(expr.cast(DEC)).cast("double")


def money_avg(expr: Column) -> Column:
    """Order-independent AVG: exact decimal sum / exact count."""
    return money_sum(expr) / F.count(expr).cast("double")


def oracle_money_sum(sql_expr: str) -> str:
    """DuckDB-side mirror of :func:`money_sum`."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL(18,2))) AS DOUBLE)"


def oracle_money_avg(sql_expr: str) -> str:
    """DuckDB-side mirror of :func:`money_avg`."""
    return f"({oracle_money_sum(sql_expr)} / CAST(COUNT({sql_expr}) AS DOUBLE))"


def lineitem_revenue() -> Column:
    """Exact-decimal lineitem revenue: price × (1 − discount).

    Both factors carry ≤2 decimals, so per-factor decimal casts are
    lossless and the product is EXACT (scale 4) — no per-row rounding
    at all, unlike casting the double product. Pair with
    ``F.sum(...).cast("double")``.
    """
    return F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


ORACLE_LINEITEM_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)
