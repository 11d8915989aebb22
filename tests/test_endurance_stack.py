"""Bounded-runtime endurance gate (VERDICT r14 #6): the full deployed
topology — producer + 5 MVs + Compactors + TTLService (checkpoint
parity gate ON) + dashboard polls — through ONE simulated week on a
compressed clock, asserting at every day boundary (freshness, sliding
horizon, flat state at the horizon cap, streams alive) and MV≡batch
bit-exactly at week's end. The longer-day form lives in
endurance_probe.py; this runs the same code with short days so the
suite stays bounded (~2-3 min)."""

from __future__ import annotations

from endurance_probe import endurance_run

from tests.conftest import SF_DIR


def test_full_stack_simulated_week(spark, tmp_path):
    report = endurance_run(
        spark,
        str(tmp_path / "lake"),
        sf_dir=SF_DIR,
        days=7,
        day_wall_s=8.0,
        events_per_tick=30,
        orders_per_tick=8,
        tick_seconds=0.25,
        grace_seconds=3.0,
    )
    assert len(report["days"]) == 7
    assert report["final"]["mv_equals_batch"] is True
    assert len(report["final"]["specs_compared"]) == 5
    # the horizon slid across a month boundary and physically reaped it
    ttl_events = next(v for k, v in report["final"]["ttl"].items() if "events" in k)
    assert ttl_events["reaped"] >= 1 and ttl_events["errors"] == 0
