"""Bench-harness instrument tests (r10, VERDICT r9 #1): the BENCH
artifact's trustworthiness now rests on these instruments — load
capture, steal accounting, quiesce gating, and the effective-core-
speed spin sampler — so they get the same regression protection as
the queries they measure. All Spark-free and sub-second.

The spin-sampler test specifically pins the Thread._stop shadowing
regression found at introduction: naming the stop Event `self._stop`
overrides threading.Thread's internal `_stop()` method, which
`join()` calls via `_wait_for_tstate_lock`, raising
"'Event' object is not callable" — i.e. the sampler worked until you
tried to stop it.
"""

from __future__ import annotations

import json
import time

import pytest

from bench import (
    HEADLINE,
    _SpinSampler,
    _load_bands,
    _read_cpu,
    _read_load,
    _retry_reason,
    _steal_pct,
    _wait_for_quiesce,
    compact_result,
    over_band_queries,
    quiet_spin_baseline,
    spin_contamination,
    update_bands,
)


def test_read_load_shape():
    load = _read_load()
    assert set(load) == {"load1", "load5", "load15", "uptime_sec"}
    assert all(isinstance(v, float) for v in load.values())
    assert load["uptime_sec"] > 0  # /proc exists on this box


def test_read_cpu_and_steal_pct():
    before = _read_cpu()
    assert len(before) == 2 and all(isinstance(v, int) for v in before)
    time.sleep(0.05)
    after = _read_cpu()
    assert after[1] >= before[1]  # total jiffies monotonic
    pct = _steal_pct(before, after)
    assert 0.0 <= pct <= 100.0
    # degenerate window must not divide by zero
    assert _steal_pct(before, before) == 0.0


def test_wait_for_quiesce_immediate_pass():
    # a threshold no real box exceeds -> returns immediately, clean
    load, contaminated = _wait_for_quiesce(threshold=10_000.0, max_wait_sec=0.1)
    assert contaminated is False
    assert "load1" in load


def test_wait_for_quiesce_flags_contamination():
    # a threshold no box satisfies -> flagged contaminated after the
    # (tiny) wait budget, never an exception
    load, contaminated = _wait_for_quiesce(threshold=-1.0, max_wait_sec=0.2)
    assert contaminated is True
    assert load["load1"] >= 0.0


def test_spin_sampler_start_stop_stats():
    s = _SpinSampler(interval=0.05, n=20_000)
    s.start()
    time.sleep(0.35)
    stats = s.stop()  # the Thread._stop shadowing bug died HERE
    assert not s.is_alive()
    assert stats["n"] >= 2
    assert 0 < stats["p50_ms"] <= stats["p95_ms"] <= stats["max_ms"]


def test_spin_sampler_window_max():
    s = _SpinSampler(interval=0.05, n=20_000)
    t0 = time.perf_counter()
    s.start()
    time.sleep(0.4)
    t1 = time.perf_counter()
    s.stop()
    # samples landed inside the window, none outside it
    wmax = s.window_max(t0, t1)
    assert wmax is not None and wmax > 0
    assert wmax == round(max(ms for (ts, ms) in s.samples_ts if t0 <= ts <= t1), 2)
    # an empty window (before the sampler started) reports None, the
    # "no evidence either way" value the retry valve must not fire on
    assert s.window_max(t0 - 10.0, t0 - 5.0) is None


def test_window_max_counts_overlapping_sample():
    # ADVICE r10: a sample that STARTED before the window but spun
    # through its opening must count — that's host contamination at the
    # query's start. Containment-only matching attributed it to the
    # previous window and let it evade the retry valve.
    s = _SpinSampler(interval=60.0, n=1)
    # hand-build the record: one 80 ms sample starting at t=9.95
    s.samples_ts = [(9.95, 80.0)]
    assert s.window_max(10.0, 12.0) == 80.0  # overlaps [10, 10.03]
    assert s.window_max(10.04, 12.0) is None  # fully before this window
    # a sample starting inside the window still counts, unchanged
    s.samples_ts = [(10.5, 5.0)]
    assert s.window_max(10.0, 12.0) == 5.0
    # and one starting after the window does not
    assert s.window_max(8.0, 10.4) is None


def test_retry_reason_spin_and_band():
    bands = {"q1": 1.0}
    # spin trigger: in-window max above the absolute threshold
    assert _retry_reason("q1", 1.1, 30.0, bands, 25.0, 2.0) == "spin"
    # band trigger: clean instruments but >2x the committed min — the
    # "2-5x slow at ~0 steal" mode the absolute threshold missed in r10
    assert _retry_reason("q1", 2.5, 10.0, bands, 25.0, 2.0) == "band"
    assert _retry_reason("q1", 2.5, None, bands, 25.0, 2.0) == "band"
    # inside band, clean spin -> no retry
    assert _retry_reason("q1", 1.9, 10.0, bands, 25.0, 2.0) is None
    # unknown query (no anchor yet) -> band valve can't fire
    assert _retry_reason("new_q", 99.0, 10.0, bands, 25.0, 2.0) is None
    # spin wins when both would fire (so the artifact names the direct evidence)
    assert _retry_reason("q1", 2.5, 30.0, bands, 25.0, 2.0) == "spin"
    # degenerate committed min of 0 must not make every run a retry
    assert _retry_reason("z", 0.5, None, {"z": 0.0}, 25.0, 2.0) is None


def test_over_band_queries_selection():
    bands = {"a": 1.0, "b": 2.0, "z": 0.0}
    timings = {"a": 2.5, "b": 3.9, "c": 50.0, "z": 9.0}
    # a: 2.5 > 2x1.0 -> over; b: 3.9 < 2x2.0 -> in band; c: no anchor;
    # z: degenerate 0 anchor never fires
    assert over_band_queries(timings, bands, 2.0) == ["a"]
    assert over_band_queries(timings, {}, 2.0) == []


def test_spin_contamination_matrix():
    """VERDICT r11 #2 trigger matrix: contaminated only when queries
    stay over band AND the run's spin p95 says the box was slow (or the
    instruments are missing, which must not pass as clean)."""
    # nothing over band -> clean regardless of spin
    assert spin_contamination([], spin_p95_ms=999.0, quiet_ms=9.0) is False
    # over band + noisy run (p95 > 2x quiet) -> contaminated
    assert spin_contamination(["q"], spin_p95_ms=25.0, quiet_ms=9.0) is True
    # over band + quiet run -> an honest regression, NOT contamination
    assert spin_contamination(["q"], spin_p95_ms=12.0, quiet_ms=9.0) is False
    # boundary: exactly 2x is still quiet
    assert spin_contamination(["q"], spin_p95_ms=18.0, quiet_ms=9.0) is False
    # missing instruments + over band -> conservative contaminated
    assert spin_contamination(["q"], spin_p95_ms=None, quiet_ms=9.0) is True
    assert spin_contamination(["q"], spin_p95_ms=12.0, quiet_ms=0.0) is True


def test_quiet_spin_baseline_sane():
    ms = quiet_spin_baseline(samples=3, pause_s=0.0)
    assert 0.5 < ms < 5000.0  # a real timing, not a degenerate 0/inf


def test_load_bands_missing_and_roundtrip(tmp_path):
    p = tmp_path / "BENCH_BANDS.json"
    assert _load_bands(p) == {}  # missing file -> valve disarmed, no crash
    p.write_text("not json")
    assert _load_bands(p) == {}  # corrupt file -> same
    update_bands({"queries": {"a": 1.5, "b": 0.4}, "contaminated": False}, p)
    assert _load_bands(p) == {"a": 1.5, "b": 0.4}
    # merge keeps the min per query and admits new queries
    update_bands({"queries": {"a": 1.2, "c": 9.0}, "contaminated": False}, p)
    assert _load_bands(p) == {"a": 1.2, "b": 0.4, "c": 9.0}
    # a later slower clean run must NOT loosen an anchor
    update_bands({"queries": {"a": 3.0}, "contaminated": False}, p)
    assert _load_bands(p)["a"] == 1.2


def test_update_bands_refuses_contaminated(tmp_path):
    p = tmp_path / "BENCH_BANDS.json"
    with pytest.raises(ValueError):
        update_bands({"queries": {"a": 1.0}, "contaminated": True}, p)
    assert not p.exists()


def test_compact_result_fits_driver_tail_window():
    # VERDICT r10 #1: the driver tail-captures ~2 KB; BENCH_r10.json was
    # parsed:null because the combined line outgrew it. Pin the encoded
    # size of the driver-parsed line at FULL headline width with
    # worst-case retry lists so the regression can't silently return.
    timings = {name: 123.456 for name in HEADLINE}
    longest = sorted(HEADLINE, key=len, reverse=True)
    line = json.dumps(
        compact_result(
            timings,
            total=9999.999,
            runs=3,
            sf=0.1,
            run_steal=99.99,
            spin={"n": 400, "p50_ms": 99.99, "p95_ms": 999.99, "max_ms": 9999.99},
            spin_retried=list(HEADLINE[:3]),
            band_retried=list(HEADLINE[3:6]),
            contaminated=True,
            quiet_ms=99.99,
            # worst case: every query re-queued AND still over band —
            # compact_result must cap the lists so the line still fits
            end_requeued=longest,
            over_band=longest,
        )
    )
    assert len(line.encode()) < 1900, f"driver line too big: {len(line)}B"
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_query_wall_clock_total"
    assert set(parsed["queries"]) == set(HEADLINE)
    assert parsed["contaminated"] is True
    assert len(parsed["end_requeued"]) <= 5 and len(parsed["over_band"]) <= 4
    assert len(parsed["spin_retried"]) <= 4 and len(parsed["band_retried"]) <= 4
    assert parsed["over_band_n"] == len(HEADLINE)
    # the keys cross-round tooling reads must stay present
    for key in (
        "value", "unit", "sf", "steal_pct", "spin_p95_ms", "band_retried",
        "quiet_spin_ms", "over_band", "over_band_n",
    ):
        assert key in parsed


def test_spin_sampler_stop_mid_first_sample():
    # stop() while the first sample is still spinning: the halt flag is
    # honored at the loop boundary, join() succeeds once the in-flight
    # sample lands, and the record is well-formed either way
    s = _SpinSampler(interval=60.0, n=5_000_000)
    s.start()
    out = s.stop()
    assert out == {"n": 0} or out["n"] >= 1
