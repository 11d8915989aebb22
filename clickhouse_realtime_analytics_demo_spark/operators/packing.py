"""Token-offset sharding: pack a document stream into fixed token
budgets (the GPT-style "concatenate then cut every N tokens" layout a
training pipeline materializes before tokenizer sharding).

Contract: documents are laid out in a deterministic global order
(``order_col`` ascending, unique); each doc's ``token_offset`` is the
EXCLUSIVE prefix sum of token counts before it, and its ``shard_id``
is ``floor(token_offset / budget)`` — the cut index where the doc
STARTS. Docs may straddle a cut (exactly like GPT-style context
packing, where a document can span two contexts); greedy
no-straddling bin-packing is a sequential recurrence with no
distributed form and is deliberately not this operator.

Scale shape (the reason this file exists): a naive
``SUM(...) OVER (ORDER BY id)`` is an UNPARTITIONED window — every
row through one task. Here the prefix sum is computed distributed,
the ``operators/ranking.py`` pattern applied to sums instead of
counts:

1. order-aligned bucket id from ``percentile_approx`` split points on
   the (unique) order column, collected ONCE to driver literals
   (≤ num_buckets-1 doubles — the bounded IVF-centroid pattern, not a
   data-sized collect) so every plan branch sees identical boundaries
   — approximate boundaries, EXACT sums: boundary quality affects
   only balance;
2. per-bucket token sums (one small aggregate, ≤ num_buckets rows);
3. bucket offsets = sums of strictly-earlier buckets via a triangular
   self-join over that BOUNDED aggregate (≤ num_buckets² pairs
   regardless of table size), broadcast-joined back;
4. within-bucket running sum — a partitioned window.

Beyond that bounded bounds collect, everything is one lazy plan — no
unpartitioned window over data-sized input. Like ``operators/ranking.py``, the plan scans
its input from several branches (bounds sketch, per-bucket sums,
final join) — callers whose upstream is expensive should persist the
input DataFrame first; the registered query's upstream is a plain
column projection, where re-scan beats cache-write (measured for the
ranking twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_prefix_sum", "pack_token_budget"]


def exact_prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "prefix_sum",
    num_buckets: int = 32,
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE prefix sum of ``val_col`` under the
    total order ``order_col`` ASC (which must be unique — document ids
    are). Distributed-exact: see the module docstring."""
    o = F.col(order_col)
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # Bucket boundaries come from percentile_approx, whose sketch merge
    # is partition-order nondeterministic — and the bounds feed MULTIPLE
    # plan branches (per-bucket sums vs the final probe side). Left
    # in-plan, identical boundaries on both branches would rest on
    # Spark's exchange-reuse optimization; if reuse is disabled or
    # defeated, divergent bounds could silently drop rows through the
    # _bucket equi-join. Collect ONCE to driver literals instead
    # (≤ num_buckets-1 doubles — bounded at any corpus size), so every
    # branch sees the same boundaries by construction. Boundary values
    # affect only bucket BALANCE; the prefix sums stay exact.
    row = df.agg(
        F.percentile_approx(o.cast("double"), probs, 1_000).alias("_bounds")
    ).first()
    bounds = [float(b) for b in (row["_bounds"] or [])]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(o.cast("double") > F.lit(b), 1).otherwise(0)
    bucketed = df.withColumn("_bucket", bucket)
    per_bucket = bucketed.groupBy("_bucket").agg(F.sum(val_col).alias("_bsum"))
    # Bucket offsets via a triangular self-join over the BOUNDED
    # (≤ num_buckets+1 row) aggregate — sum of strictly-earlier bucket
    # sums. Not a window: a constant-partitioned window gets its
    # foldable partition spec optimized away by Catalyst, becoming a
    # real unpartitioned WindowExec (observed on 4.1.2); the tiny
    # inequality join is optimizer-proof and equally bounded.
    earlier = per_bucket.select(
        F.col("_bucket").alias("_b2"), F.col("_bsum").alias("_s2")
    )
    offsets = (
        per_bucket.join(F.broadcast(earlier), F.col("_b2") < F.col("_bucket"), "left")
        .groupBy("_bucket")
        .agg(F.coalesce(F.sum("_s2"), F.lit(0)).alias("_boff"))
    )
    w_run = Window.partitionBy("_bucket").orderBy(order_col)
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col,
            (
                F.col("_boff")
                + F.coalesce(F.sum(val_col).over(w_run) - F.col(val_col), F.lit(0))
            ).cast("bigint"),
        )
        .drop("_bucket", "_boff")
    )


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    token_count: Column,
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> DataFrame:
    """Assign (n_tokens, token_offset, shard_id) to every doc: the
    token-offset sharding layout (module docstring). ``token_count``
    is the token-count expression (e.g. ``text.bpe_token_count``)."""
    with_tokens = docs.withColumn("n_tokens", token_count.cast("bigint"))
    ps = exact_prefix_sum(
        with_tokens, id_col, "n_tokens", out_col="token_offset", num_buckets=num_buckets
    )
    # integer DIV: bit-exact at any corpus size (a double floor would
    # wobble past 2^53 cumulative tokens)
    return ps.withColumn("shard_id", F.expr(f"token_offset DIV {int(budget)}"))
