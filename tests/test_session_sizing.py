"""Engine-owned shuffle sizing (VERDICT r14 #1): the session pins a
data-proportional AQE ceiling — shuffles START high and coalesce DOWN
by bytes — replacing the fixed ``shuffle.partitions = cores`` that the
sf6 as-of rung outgrew (spill, 8.5x wall for 6x data; hand-swept 256
restored sub-linear). These tests pin the rule and the conf wiring so
a refactor can't silently regress back to the hand sweep; the probe
side (`scale_probe.py asofsf6`) asserts the resulting behavior."""

from __future__ import annotations

from clickhouse_realtime_analytics_demo_spark import session as session_mod


def test_initial_partition_rule():
    # 8 x cores: the local bench box (32 cores) lands exactly on the
    # sf6 swept optimum (256); the test session (8 cores) on 64
    assert session_mod.initial_shuffle_partitions(32, 32) == 256
    assert session_mod.initial_shuffle_partitions(8, 8) == 64
    assert session_mod.initial_shuffle_partitions("32", "32") == 256
    # an explicit larger SPARK_GRAFT_SHUFFLE pin raises the ceiling too
    assert session_mod.initial_shuffle_partitions(4, 512) == 512


def test_initial_partition_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INITIAL_SHUFFLE", "1024")
    assert session_mod.initial_shuffle_partitions(32, 32) == 1024


def test_session_sets_aqe_ceiling(spark):
    """The shared test session (get_spark cpus=8, shuffle=8) must carry
    the rule's conf: AQE on, coalescing on, ceiling = rule(8, 8)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    got = int(
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    )
    assert got == session_mod.initial_shuffle_partitions(8, 8) == 64


def test_spread_partitions_data_proportional(spark, tmp_path):
    """Explicit-repartition sizing follows the source bytes with the
    core floor at small scale, and falls back to the floor for frames
    with no measurable file source."""
    path = str(tmp_path / "t")
    spark.range(50_000).write.parquet(path)
    df = spark.read.parquet(path)
    size = session_mod.source_bytes(df)
    assert size and size > 0

    # small data: the floor wins
    assert session_mod.spread_partitions(df, floor=16) == 16
    # data-proportional once bytes exceed floor * target
    tiny_target = max(size // 64, 1)
    got = session_mod.spread_partitions(df, floor=16, target_bytes=tiny_target)
    assert 16 < got <= 8192
    assert got == -(-size // tiny_target)  # ceil
    # ceiling clamps
    assert session_mod.spread_partitions(df, floor=16, target_bytes=1, ceiling=64) == 64

    # no file source (literal frame): floor fallback
    lit = spark.createDataFrame([(1,)], "x int")
    assert session_mod.spread_partitions(lit, floor=16) == 16
