"""Generator determinism + writer partitioning/sorting (SURVEY §5 #4)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.sources import generator, schemas, writer


def test_generator_deterministic_across_parallelism(spark):
    a = generator.events(spark, n=2000, n_users=100, partitions=2).collect()
    b = generator.events(spark, n=2000, n_users=100, partitions=16).collect()
    assert sorted(a) == sorted(b)


def _shape(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_generator_schema_matches(spark):
    # names + types must match the declared DDL schemas (nullability is
    # loosened by expression derivation — acceptable)
    assert _shape(generator.events(spark, n=10).schema) == _shape(schemas.EVENTS)
    assert _shape(generator.users(spark, n=10).schema) == _shape(schemas.USERS)
    assert _shape(generator.products(spark, n=10).schema) == _shape(schemas.PRODUCTS)
    assert _shape(generator.orders(spark, n=10).schema) == _shape(schemas.ORDERS)


def test_generator_domains(spark):
    ev = generator.events(spark, n=5000, n_users=50)
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert types <= set(generator.EVENT_TYPES)
    # page_view should dominate (40% weight)
    counts = dict(ev.groupBy("event_type").count().collect())
    assert counts["page_view"] == max(counts.values())
    # revenue only on purchases
    assert ev.filter((F.col("event_type") != "purchase") & (F.col("revenue") != 0)).count() == 0


def test_writer_month_partitions_and_sort(spark, tmp_path):
    ev = generator.events(spark, n=3000, n_users=100)
    writer.write_table(ev, str(tmp_path), "events")
    parts = sorted(p.name for p in Path(tmp_path, "events").glob("yyyymm=*"))
    assert parts, "expected yyyymm=... partition dirs"
    back = writer.read_table(spark, str(tmp_path), "events")
    assert back.count() == 3000
    # partition pruning: filtering one month must read a subset
    one_month = int(parts[0].split("=")[1])
    pruned = back.filter(F.col("yyyymm") == one_month)
    assert 0 < pruned.count() < 3000


def test_writer_bloom_filters(spark, tmp_path):
    """Bloom-filter columns (X3 analog) round-trip and are physically
    written (same deterministic data, bloom files strictly larger —
    pyarrow doesn't expose bloom offsets directly)."""
    ev = generator.events(spark, n=2000, n_users=100)
    writer.write_table(ev, str(tmp_path / "plain"), "events")
    writer.write_table(ev, str(tmp_path / "bloom"), "events", bloom_cols=("session_id",))
    back = writer.read_table(spark, str(tmp_path / "bloom"), "events")
    sid = back.select("session_id").first()[0]
    assert back.filter(F.col("session_id") == sid).count() >= 1

    def total(d):
        return sum(f.stat().st_size for f in Path(d).rglob("*.parquet"))

    assert total(tmp_path / "bloom") > total(tmp_path / "plain")


def test_catalog_normalizes_events_ts_forms(spark, tmp_path):
    """The driver's events.ts physical parquet type has drifted across
    testdata generations (TIMESTAMP(NANOS) in some rounds, tz-naive
    micros -> TIMESTAMP_NTZ in round 5). catalog.table() must present
    session-UTC TIMESTAMP for every form so unix_micros-based
    consumers (gap sessions) never break at a round boundary."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_realtime_analytics_demo_spark.catalog import table

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [base + datetime.timedelta(seconds=i) for i in range(4)]
    for unit in ("us", "ns"):  # tz-naive micros (NTZ) and nanos forms
        d = tmp_path / f"sf_{unit}"
        (d / "events.parquet").mkdir(parents=True)
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(rows, pa.timestamp(unit)),
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            }
        )
        pq.write_table(
            t, str(d / "events.parquet" / "part-0.parquet"),
            use_deprecated_int96_timestamps=False,
            coerce_timestamps=None,
            store_schema=False,
        )
        df = table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", unit
        got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
        assert got == rows, unit
        # strict consumers work on the normalized column
        micros = df.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()
        assert micros[1].us - micros[0].us == 1_000_000
