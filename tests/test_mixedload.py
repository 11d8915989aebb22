"""Mixed-workload gate (VERDICT r5 next-round #1): ingest at the
reference rate + all 5 incremental MVs + a live dashboard query loop,
SIMULTANEOUSLY, asserting sustained rates and end-to-end freshness —
the reference's defining "ingest -> MV update -> query sees fresh
aggregates" loop (ARCHITECTURE.md:85-89,145-147).

Gates are sustained-style (percentiles over the whole window), never
per-tick zero-overrun asserts — same discipline as the ingest
headroom test. The full 60 s measurement lives in mixed_load_probe.py
/ MIXEDLOAD.md; this is a shortened run of the same harness.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import mixed_load_probe as mlp

FLAKES = Path(__file__).resolve().parent.parent / "FLAKES.md"


def _one_window(spark, workdir):
    return mlp.run_mixed_load(
        spark, workdir, seconds=30.0, rate_mult=1, quiesced_seconds=5.0,
        # 1 s triggers + 0.4 s sampling on this 8-core session: the
        # probe's 0.5 s triggers cost this smaller box ~10-15% ingest
        # rate (measured 100 -> 85-91 ev/s) for freshness it doesn't
        # need to gate
        trigger_seconds=1.0, freshness_sample_s=0.4,
    )


def _log_flake(first_res) -> None:
    """Greppable retry record (VERDICT r9 #6): every time the rate-gate
    retry window fires, the first window's numbers land in FLAKES.md so
    flakiness is trackable across rounds instead of hidden by the
    retry. Host load is captured because every observed miss so far
    coincided with host-level load spikes."""
    load = "?"
    try:
        load = Path("/proc/loadavg").read_text().split()[0]
    except OSError:
        pass
    line = (
        f"- {time.strftime('%Y-%m-%d %H:%M:%S')} test_mixedload retry fired: "
        f"{json.dumps({'events_per_s': round(first_res.events_per_s, 2), 'uncovered_ticks': first_res.uncovered_ticks, 'load1': load, 'spin_ms': first_res.spin_ms})}\n"
    )
    try:
        if not FLAKES.exists():
            FLAKES.write_text(
                "# FLAKES — gate-retry occurrences\n\n"
                "One line per firing of a documented test retry valve, appended\n"
                "by the test itself (VERDICT r9 #6): the trend is auditable here\n"
                "instead of via archaeology through commit messages.\n\n"
            )
        with FLAKES.open("a") as f:
            f.write(line)
    except OSError:
        pass  # a read-only checkout must not turn the valve into a failure


def test_mixed_load_freshness_and_rates(spark, tmp_path):
    res = _one_window(spark, str(tmp_path / "w1"))
    if res.events_per_s < 90.0 or res.uncovered_ticks:
        # One documented retry: this VM shows HOST-level load spikes
        # (load-avg 7+ with zero local processes — COVERAGE.md r9
        # evidence) and inside a full-suite run the session shares its
        # 8 cores with lingering executor work; a single missed 30 s
        # window under those conditions is noise, two in a row is a
        # regression. Same sustained-not-per-tick philosophy as the
        # assertions themselves. (Observed once in 3 frozen-code full-
        # suite runs, r9; passes in isolation immediately after.)
        # Every firing is recorded in FLAKES.md (ADVICE r9) so the
        # valve can't silently absorb a partial regression trend; the
        # gate below then runs on the RETRY window only — a persistent
        # regression still has to clear a full fresh window.
        _log_flake(res)
        res = _one_window(spark, str(tmp_path / "w2"))
    s = res.summary()
    # ingest held the reference rate (100 ev/s) under full mixed load.
    # Sustained-rate gate at 90% on this 8-core test session (the
    # 32-core probe run sustains 100%, MIXEDLOAD.md) — same
    # whole-window shape as test_ingest_headroom, never per-tick.
    assert res.events_per_s >= 90.0, s
    assert res.ingested_events >= 25 * 100, s
    # every write-side tick became visible in the MV read path (the
    # drain window bounds the wait; uncovered ticks = lost freshness)
    assert res.uncovered_ticks == 0, s
    assert len(res.freshness_lag_s) >= 20, s
    # end-to-end freshness: event written -> visible in the MV read
    # path, measured from outside (includes real reader cost).
    # Reference dashboards poll at 1-5 s. The 60 s / 32-core probe
    # measures p95 < 5 s (MIXEDLOAD.md); this shortened 8-core gate
    # gets an explicit budget: p50 well under the dashboard poll
    # cadence, p95 bounded at 6.5 s (1 s trigger discovery + batch +
    # sampling granularity, with jitter headroom on a shared box).
    assert s["freshness_p50_s"] < 3.0, s
    assert s["freshness_p95_s"] < 6.5, s
    # the dashboard mix kept answering under load at interactive
    # latency (reference dashboard refreshes are 1-5 s polls)
    assert s["query_loaded"]["n"] >= 20, s
    assert s["query_loaded"]["p95"] < 5.0, s
