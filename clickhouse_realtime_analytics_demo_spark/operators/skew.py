"""Skew-handling join utilities for 100 TB-scale keys.

AQE's skew-join splitting (on in session defaults) handles moderate
skew at runtime by splitting oversized shuffle partitions. These
helpers cover the cases AQE can't:

- ``salted_join``: explicit N-way salting for a *known* hot-key join —
  the fact side gets a random-but-deterministic salt in [0, N), the
  dim side is exploded N ways, and the join key becomes (key, salt).
  One hot key's rows spread across N tasks instead of one straggler.
- ``write_bucketed`` / co-located reads: pre-shuffle both sides of a
  recurring join ONCE at write time (`bucketBy` on the join key); every
  later join on that key is exchange-free (verified by plan assertion
  in tests/test_skew.py). This is the Spark analog of the reference
  keeping both tables sorted by the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with N-way key salting.

    ``fact`` (large, possibly skewed) gets salt = xxhash64(row id-ish
    columns) % N — deterministic, no RNG, stable under retries; ``dim``
    (smaller) is replicated N ways via posexplode of a literal range.
    Output columns = fact columns + dim columns (minus its key copy),
    exactly like ``fact.join(dim, key, how)``.
    """
    salt = (F.abs(F.xxhash64(*fact.columns)) % num_salts).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode_outer(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>"))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 8,
    sort_key: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join
    key. Joins between two tables bucketed identically on the key are
    planned WITHOUT a shuffle exchange — the write pays the shuffle
    once, every recurring join skips it.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_key)
    if sort_key:
        w = w.sortBy(sort_key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed saved tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def cap_group_size(
    df: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    max_rows: int,
) -> DataFrame:
    """Drop groups larger than ``max_rows`` before a quadratic
    expansion (self-join pair generation, basket mining, LSH
    buckets) — the generic form of the MinHash bucket cap
    (operators/dedup.py:minhash_lsh_candidates).

    Why this exists (measured, SCALEPROBE.md "Skewed-key probe"): a
    hot key whose JOIN OUTPUT explodes quadratically is invisible to
    AQE's skew-join split, which keys on shuffle-INPUT partition
    bytes — a 10^4-row basket is ~160 KB in, 5·10^7 pairs out, and
    its shuffle partition looks perfectly uniform. No runtime
    re-planner can save a computation whose correct output is
    quadratic; the scale-safe options are bounding the group (this)
    or broadcasting one side so the expansion spreads across input
    splits. Pathological groups (boilerplate buckets, degenerate
    mega-baskets) carry little analytic signal, so dropping them is
    the standard trade.

    The count aggregate shuffles on the same keys as the downstream
    join, so AQE reuses the exchange; only the count itself is extra.
    """
    keys = list(key_cols)
    sizes = df.groupBy(*keys).agg(F.count("*").alias("__group_n"))
    return (
        df.join(sizes, keys)
        .filter(F.col("__group_n") <= max_rows)
        .drop("__group_n")
    )
