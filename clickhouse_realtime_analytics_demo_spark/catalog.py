"""Table catalog: load the driver's parquet tables as DataFrames/views.

The reference declares fixed DDL per table and lets ClickHouse resolve
names (init-scripts/01-create-tables.sql); here the analog is
``spark.read.parquet`` + temp-view registration so both the DataFrame
and ``spark.sql`` surfaces see the same relations.

Scale notes: reads are plain parquet scans — Catalyst handles column
pruning and predicate pushdown, so callers must NOT pre-collect or
cache these. Small dimensions (region, nation, supplier, part,
customer at low SF) broadcast automatically under
``spark.sql.autoBroadcastJoinThreshold``; fact tables (lineitem,
orders, events) stay distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions that are always safe to broadcast (bounded cardinality
# regardless of scale factor — mirrors the reference's in-RAM
# dictionaries, 06-add-dictionaries.sql.disabled:17-128).
BOUNDED_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects; read it as nanos-since-epoch long and truncate to
        # micros (same conversion DuckDB applies). Integer `div` —
        # a double roundtrip would lose precision above 2^53 ns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in names}


def register(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so ``spark.sql`` queries resolve table names."""
    for name, df in load(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
