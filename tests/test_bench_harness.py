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

import time

from bench import _SpinSampler, _read_cpu, _read_load, _steal_pct, _wait_for_quiesce


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


def test_spin_sampler_stop_mid_first_sample():
    # stop() while the first sample is still spinning: the halt flag is
    # honored at the loop boundary, join() succeeds once the in-flight
    # sample lands, and the record is well-formed either way
    s = _SpinSampler(interval=60.0, n=5_000_000)
    s.start()
    out = s.stop()
    assert out == {"n": 0} or out["n"] >= 1
