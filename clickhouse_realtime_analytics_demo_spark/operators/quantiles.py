"""Exact per-group quantiles — ClickHouse ``quantileExact`` analog.

ClickHouse's exact-quantile family materializes each group's values
and selects by rank (quantileExact/quantileExactLow); the sketch
family (``quantile``/t-digest) trades exactness for state. Spark has
only the sketch path built in (``percentile_approx``); this operator
supplies the exact path with the same cost floor ClickHouse pays: one
sort per group.

Definition pinned here (and mirrored verbatim in SQL oracles):
``quantile(p)`` of a group of n values = the element at 1-based rank
``floor(p * (n - 1)) + 1`` under ``ORDER BY value, tie`` — the
"lower nearest-rank" element, always an actual data value, never an
interpolation. Ties on value cannot change the result (equal rank ↔
equal value); the tie column only makes row numbering total.

Scale shape: ONE shuffle on the group key; both windows (row_number
and group count) share the same partitioning, so Catalyst plans a
single exchange + sort. Probes ride in a literal array filtered per
row (no probe-side join, no row expansion before the final filter).
The per-group sort is the information floor for EXACT quantiles — at
100 TB prefer ``percentile_approx`` unless exactness is contractual,
which is exactly ClickHouse's quantile vs quantileExact split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_group_quantiles"]


def exact_group_quantiles(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    tie_col: str,
    probs: Sequence[float],
) -> DataFrame:
    """Exact quantiles of ``value_col`` per group, one output row per
    (group, prob) — ``(group_cols..., prob, quantile)``."""
    if not probs:
        raise ValueError("probs must be non-empty")
    gcols = [F.col(c) for c in group_cols]
    w_rank = Window.partitionBy(*gcols).orderBy(F.col(value_col).asc(), F.col(tie_col).asc())
    w_all = Window.partitionBy(*gcols)

    probs_arr = F.array(*[F.lit(float(p)) for p in probs])
    n = F.count("*").over(w_all)
    rn = F.row_number().over(w_rank)

    def _is_hit(p: Column) -> Column:
        return (F.floor(p * (F.col("_q_n") - 1)) + 1) == F.col("_q_rn")

    return (
        df.select(*gcols, F.col(value_col), F.col(tie_col))
        .withColumn("_q_n", n)
        .withColumn("_q_rn", rn)
        .withColumn("_q_hits", F.filter(probs_arr, _is_hit))
        .filter(F.size("_q_hits") > 0)
        .select(
            *gcols,
            F.explode("_q_hits").alias("prob"),
            F.col(value_col).alias("quantile"),
        )
    )
