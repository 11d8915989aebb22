"""Mergeable approximate quantile state (streaming/tdigest_state.py)
— the quantileTDigestState/Merge analog (VERDICT r11 #3). Pins:

- BOUNDED state: centroid count stays O(compression) no matter the
  row count (the property the exact histogram state lacks on
  continuous domains);
- ACCURACY: rank error of every estimated quantile vs the pinned
  nearest-rank truth within tolerance, on uniform + heavy-tailed
  (lognormal-ish) continuous data;
- MERGE LAWS: merging in any batching/order yields estimates within
  tolerance (sketch merge is associative/commutative w.r.t. the
  error bound, not bit-wise — Dunning & Ertl §2.2), and the same
  merge repeated is bit-deterministic;
- the parts contract: replay idempotence, crash-safe compaction
  equivalence, streaming end-to-end;
- the extraction plan: partitioned windows, no joins, no
  row-count-sized Python input.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.streaming import tdigest_state

PROBS = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
COMPRESSION = 200
# k1-scale rank error is ~O(1/δ) mid-range and tighter at tails;
# 2/δ = 1% at δ=200 carries ~2× headroom over observed (~0.4%).
RANK_TOL = 2.0 / COMPRESSION


def _rank_error(values: list[float], estimate: float, p: float) -> float:
    """|empirical CDF position of the estimate − p| (the sketch
    accuracy metric — value-space error is meaningless without
    density)."""
    n = len(values)
    below = sum(1 for v in values if v < estimate)
    at_or_below = sum(1 for v in values if v <= estimate)
    lo, hi = below / n, at_or_below / n
    if lo <= p <= hi:
        return 0.0
    return min(abs(p - lo), abs(p - hi))


def _mk_rows(rng, n, dist):
    if dist == "uniform":
        return [rng.uniform(0, 1000) for _ in range(n)]
    # heavy-tailed: exp of a normal — the continuous-domain shape the
    # exact histogram state can't bound
    return [math.exp(rng.gauss(0, 1.5)) for _ in range(n)]


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_accuracy_and_bounded_state(spark, dist):
    rng = random.Random(29)
    groups = {"a": _mk_rows(rng, 20_000, dist), "b": _mk_rows(rng, 5_000, dist)}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    state = tdigest_state.tdigest_partial(df, ["g"], F.col("v"), COMPRESSION)
    collected = state.collect()
    assert len(collected) == 2
    for r in collected:
        n_centroids = len(r["means"])
        assert n_centroids <= 2 * COMPRESSION, n_centroids
        assert abs(sum(r["weights"]) - len(groups[r["g"]])) < 1e-6
    got = tdigest_state.quantiles_from_state(state, ["g"], PROBS).collect()
    assert len(got) == 2 * len(PROBS)
    for r in got:
        err = _rank_error(groups[r["g"]], r["quantile"], r["prob"])
        assert err <= RANK_TOL, (dist, r["g"], r["prob"], err)


def test_merge_laws_order_insensitive_and_deterministic(spark):
    rng = random.Random(7)
    values = _mk_rows(rng, 12_000, "lognormal")
    chunks = [values[i::3] for i in range(3)]
    digests = [
        tdigest_state.tdigest_partial(
            spark.createDataFrame([("g", v) for v in c], "g string, v double"),
            ["g"], F.col("v"), COMPRESSION,
        )
        for c in chunks
    ]

    def q_of(df):
        return {
            (r["g"], r["prob"]): r["quantile"]
            for r in tdigest_state.quantiles_from_state(df, ["g"], PROBS).collect()
        }

    ab_c = tdigest_state.merge_states(
        tdigest_state.merge_states(digests[0].unionByName(digests[1]), ["g"], COMPRESSION)
        .unionByName(digests[2]),
        ["g"], COMPRESSION,
    )
    a_bc = tdigest_state.merge_states(
        digests[0].unionByName(
            tdigest_state.merge_states(digests[1].unionByName(digests[2]), ["g"], COMPRESSION)
        ),
        ["g"], COMPRESSION,
    )
    flat = tdigest_state.merge_states(
        digests[0].unionByName(digests[1]).unionByName(digests[2]), ["g"], COMPRESSION
    )
    for merged in (ab_c, a_bc, flat):
        for (g, p), est in q_of(merged).items():
            err = _rank_error(values, est, p)
            assert err <= RANK_TOL, (g, p, err)
    # the SAME merge repeated is bit-deterministic
    again = q_of(
        tdigest_state.merge_states(
            digests[0].unionByName(digests[1]).unionByName(digests[2]), ["g"], COMPRESSION
        )
    )
    assert q_of(flat) == again


def test_replay_and_crash_safe_compact(spark, tmp_path):
    from clickhouse_realtime_analytics_demo_spark.streaming import parts as parts_store

    rng = random.Random(5)
    rows = [("g", rng.uniform(0, 100)) for _ in range(6_000)]
    path = str(tmp_path / "state")
    chunk = 2_000
    for i in range(3):
        b = spark.createDataFrame(rows[i * chunk : (i + 1) * chunk], "g string, v double")
        tdigest_state.write_batch(b, ["g"], F.col("v"), path, batch_id=i)
    once = tdigest_state.read_quantiles(spark, path, ["g"], PROBS).collect()
    # replay batch 1 (idempotent overwrite — no double counting)
    b1 = spark.createDataFrame(rows[chunk : 2 * chunk], "g string, v double")
    tdigest_state.write_batch(b1, ["g"], F.col("v"), path, batch_id=1)
    replay = tdigest_state.read_quantiles(spark, path, ["g"], PROBS).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in replay]
    # crash-safe fold via the shared store; post-fold estimates stay
    # within tolerance of the raw data (a re-compress pass may shift
    # centroids — the bound, not bit-equality, is the contract)
    assert tdigest_state.compact(spark, path, ["g"])
    assert len(parts_store.live_part_dirs(path)) == 1
    vals = [v for _, v in rows]
    for r in tdigest_state.read_quantiles(spark, path, ["g"], PROBS).collect():
        err = _rank_error(vals, r["quantile"], r["prob"])
        assert err <= RANK_TOL, (r["prob"], err)
    # no-op below two live parts
    assert not tdigest_state.compact(spark, path, ["g"])


def test_streaming_state_within_tolerance(spark, tmp_path):
    from clickhouse_realtime_analytics_demo_spark.sources import generator

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    offset = 0
    for n in (400, 300, 300):
        generator.events(spark, n=n, n_users=60, id_offset=offset, partitions=2).write.mode(
            "append"
        ).parquet(src)
        offset += n
    q = tdigest_state.start_incremental(
        spark, src, state, ["country"], "duration_seconds", ckpt,
        max_files_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = tdigest_state.read_quantiles(spark, state, ["country"], [0.5, 0.9]).collect()
    raw: dict[str, list[float]] = {}
    for r in spark.read.parquet(src).select("country", "duration_seconds").collect():
        raw.setdefault(r["country"], []).append(float(r["duration_seconds"]))
    assert got and len({r["country"] for r in got}) == len(raw)
    for r in got:
        # small per-group n (~100): rank tolerance loosened to the
        # discrete-rank floor 1/n + the sketch term
        tol = RANK_TOL + 1.0 / len(raw[r["country"]])
        err = _rank_error(raw[r["country"]], r["quantile"], r["prob"])
        assert err <= tol, (r["country"], r["prob"], err)


def test_extraction_plan_partitioned_windows_no_join(spark):
    from tests.test_plan_snapshots import _walk

    rows = [("g%d" % (i % 2), float(i % 977)) for i in range(4_000)]
    df = spark.createDataFrame(rows, "g string, v double")
    state = tdigest_state.tdigest_partial(df, ["g"], F.col("v"), COMPRESSION)
    out = tdigest_state.quantiles_from_state(state, ["g"], PROBS)
    out.collect()
    for node in _walk(out._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        assert "Join" not in cls, cls
        if cls == "WindowExec":
            assert node.partitionSpec().size() > 0


def test_registered_query_tolerance_vs_exact_twin(spark):
    """The registered ``order_status_quantiles_tdigest`` (rows-only at
    the driver, the A3/uniq handling) vs the EXACT nearest-rank twin
    ``order_status_quantiles_state``: same groups and probs, every
    estimate within the sketch rank tolerance of the truth — and the
    query is run-to-run deterministic (the registry-wide determinism
    gate also covers this; asserted here so a failure localizes)."""
    from clickhouse_realtime_analytics_demo_spark.queries import all_queries
    from tests.conftest import SF_DIR

    sketch = all_queries()["order_status_quantiles_tdigest"]
    got = sketch.fn(spark, SF_DIR).collect()
    again = sketch.fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]

    from clickhouse_realtime_analytics_demo_spark.catalog import table

    raw: dict[str, list[float]] = {}
    for r in (
        table(spark, SF_DIR, "orders").select("o_orderstatus", "o_totalprice").collect()
    ):
        raw.setdefault(r["o_orderstatus"], []).append(float(r["o_totalprice"]))
    assert {r["status"] for r in got} == set(raw)
    for r in got:
        err = _rank_error(raw[r["status"]], r["quantile"], r["prob"])
        assert err <= RANK_TOL, (r["status"], r["prob"], err)


def test_single_value_and_identical_values(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] + [("b", 7.5)] * 100, "g string, v double"
    )
    state = tdigest_state.tdigest_partial(df, ["g"], F.col("v"))
    got = tdigest_state.quantiles_from_state(state, ["g"], [0.5, 0.99]).collect()
    for r in got:
        assert r["quantile"] == (5.0 if r["g"] == "a" else 7.5)
