"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock of all headline queries (each timed to
full materialization via collect). A warmup query runs first so JVM/
codegen startup isn't billed to the first headline entry.

Load-awareness (round 10, VERDICT r9 #1): the r9 bench artifact drifted
+14% uniformly across unchanged, snapshot-locked plans on a box whose
host-level load spikes were measured but not recorded, making
contamination indistinguishable from regression after the fact. The
harness now records /proc/loadavg + uptime before and after the run in
the JSON. Before starting Spark it polls the 1-min load-avg; if it
exceeds $SPARK_GRAFT_BENCH_LOAD_MAX (default 2.0) it waits up to
$SPARK_GRAFT_BENCH_LOAD_WAIT seconds (default 120) for the box to
quiesce, then proceeds anyway but stamps "contaminated": true so the
artifact self-reports that its numbers are not comparable. Post-run
load is recorded for forensics only (Spark itself drives it up).

The decisive instrument is CPU STEAL, not load-avg: this Firecracker
VM shows load-avg 5-8 with ZERO local compute processes and busy
`migration/N` kernel threads — the host reassigning vCPUs. Load-avg
can't separate "my Spark job" from "the host took my cores", but
/proc/stat's steal counter can: it counts exactly the time the
hypervisor ran someone else on a vCPU this guest wanted. The harness
records steal%% PER QUERY (over each query's full best-of-N timing
window) in "queries_steal_pct" plus a whole-run figure, and flags the
run contaminated when whole-run steal exceeds
$SPARK_GRAFT_BENCH_STEAL_MAX (default 5%%). A slow query with ~0 steal
is a real regression; the same number at 30%% steal is the host.

Even steal misses one failure mode this box exhibits: the host goes
2-5× slow for a few seconds with ~0 steal (first r10 quiesced run:
dedup_exact best-of-3 landed 4.3× the r8 number at 0.02%% steal, then
re-pinned at the r8 value standalone minutes later). The spin sampler
therefore timestamps every sample; the harness records each query's
in-window spin max ("queries_spin_max_ms") and, when a window's max
exceeds $SPARK_GRAFT_BENCH_SPIN_RETRY_MS (default 25 ms — quiet
baseline is ~9 ms), grants that query ONE extra best-of-N pass from a
fixed whole-run budget ($SPARK_GRAFT_BENCH_SPIN_RETRIES, default 6).
Retried queries are listed in "spin_retried" so the artifact shows
which numbers needed shelter from the host.

Each query is timed best-of-N (default 3, $SPARK_GRAFT_BENCH_RUNS to
override): single-shot timing on this rig showed ±20% run-to-run jitter
with identical code (r01<->r02, re-confirmed r6/r7), which swamps real
regressions and burned a judge/builder cycle per round re-litigating
noise (VERDICT r7 #2); the min of repeated runs is the standard
low-noise estimator for a warm, otherwise-idle system. The FIRST run's
wall-clock is kept honestly in `queries_single_run`.

Output format (round 11, VERDICT r10 #1): BENCH_r10.json recorded
`parsed: null` with ZERO timings because the r10 instruments grew the
single JSON line past the driver's ~2 KB tail-capture window — the
driver kept only the trailing instruments fragment and couldn't parse
it. The harness now prints TWO JSON lines: first the bulky per-query
instrument maps (kind: "bench_instruments", forensics only), then a
COMPACT final line carrying metric/value/queries/sf/contaminated plus
scalar instrument summaries, sized to always fit the tail window.

Cross-round band anchor (round 11, VERDICT r10 #2): the judge's r10
clean run caught doc_bigram_novelty at 4.2× its r9 value with ALL
instruments green (0.33% steal, in-window spin max 16.4 ms < the 25 ms
threshold) — the box's "2-5× slow at ~0 steal" mode can slip under any
absolute spin threshold. BENCH_BANDS.json (committed per round from
clean runs) carries each query's best committed min; a query landing
above $SPARK_GRAFT_BENCH_BAND_FACTOR× (default 2.0) its committed min
earns the same bounded retry even when spin/steal look clean. Retries
from this valve are listed in "band_retried".
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from clickhouse_realtime_analytics_demo_spark.queries import all_queries  # noqa: E402
from clickhouse_realtime_analytics_demo_spark.session import get_spark  # noqa: E402

# Headline set: the reference's dashboard workload (daily/hourly/top-k/
# funnel/MV-class analytics) + the training-data-pipeline heavies.
# Round 7 extended the list with the four post-window pipeline queries
# (VERDICT r6 #4) — cross-round totals are comparable per-query, not by
# the grand total, which grew with the list.
HEADLINE = (
    "daily_events",
    "hourly_event_matrix",
    "event_type_stats",
    "segment_revenue",
    "nation_revenue",
    "top_parts_per_brand",
    "top_customers",
    "session_stats",
    "cohort_retention",
    "user_rfm",
    "kpi_snapshot",
    "copurchased_parts",
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    # round-7 additions: graph/pipeline/text heavies. r8 swaps the
    # corpus-prep line for the scale-shaped LSH composition (VERDICT
    # r7 #1) — the exact form stays registered as the DuckDB twin and
    # is equality-pinned to this one by tests/test_corpus_prep_lsh.py.
    "dedup_cluster_resolution",
    "corpus_prep_pipeline_lsh",
    "doc_repetition_stats",
    "contamination_check",
    # round-8 second-wave operators: point-in-time join, exact
    # quantiles, vector centroids, bigram LM novelty
    "events_asof_order",
    "order_value_quantiles",
    "embedding_centroids",
    "doc_bigram_novelty",
    "window_funnel",
    "sequence_match_levels",
    # round 9: distributed BPE tokenizer training (12 merges)
    "doc_bpe_train",
    # round 10 (VERDICT r9 #7): the batched scale path — 24 merges in
    # ~4 rounds; tracks the 32k-merge-relevant formulation, not only
    # the sequential demo
    "doc_bpe_train_batched",
    # round 10: the relaxed (exact_counts=False) production path — the
    # 1k-merge probe showed the disjointness rule caps picks at
    # ~O(|alphabet|)/round, so THIS is the formulation a 32k-merge
    # tokenizer actually runs (rounds == merges/batch exactly)
    "doc_bpe_train_relaxed",
    # round 10: corpus-wide TF-IDF top-k — tracks the token-keyed
    # tf⋈df join + WindowGroupLimit per-doc top-k shape (1.45 s
    # best-of-4 at sf0.1 on introduction)
    "doc_tfidf_topk",
    # round 11 (VERDICT r10 #3): the write-time int8 store scan — the
    # production ANN path (quantize once at write, scan the ~3.6×
    # smaller tinyint column). First run per regenerated corpus pays
    # the store build; best-of-N sheds it, so the number tracks the
    # steady-state scan.
    "ann_cosine_topk_int8_stored",
    # round 11: the IVF-partitioned store probe — partition pruning
    # (nprobe/16 of the directories) stacked on the int8 byte cut;
    # same first-run-builds, best-of-N-sheds-it shape as above.
    "ann_ivf_topk_stored",
    # round 11: exact heavy hitters (ClickHouse topK analog) — tracks
    # the Misra-Gries candidate pass + broadcast-pruned exact recount
    # (operators/sketches.py), the bounded-shuffle top-k formulation.
    "doc_token_heavy_hitters",
    # round 11: the State/Merge family completions — topK state
    # (partials → relational topKMerge) and quantileExactState
    # (histogram partials → cumulative nearest-rank), plus the JSON
    # extraction aggregate (codegen'd get_json_object path).
    "event_type_top_users_state",
    "order_status_quantiles_state",
    "event_props_json",
    # round 12 (VERDICT r11 #3): the bounded t-digest quantile state —
    # tracks the Arrow-batched combiner build + relational extraction
    # (the continuous-domain production path next to the exact state).
    "order_status_quantiles_tdigest",
    # round 13 (VERDICT r12 #3): IVF probe + float re-rank of the
    # bounded int8 candidate set — the recall-recovering production
    # ANN path (exact scores, point-lookup join, no second scan).
    "ann_ivf_topk_rerank",
)


def _read_load() -> dict:
    """Snapshot host load: /proc/loadavg 1/5/15-min averages + uptime seconds.

    Pure /proc reads — no subprocess, works in any Linux container. Returns
    zeros on non-Linux so the harness degrades gracefully.
    """
    out = {"load1": 0.0, "load5": 0.0, "load15": 0.0, "uptime_sec": 0.0}
    try:
        parts = Path("/proc/loadavg").read_text().split()
        out["load1"], out["load5"], out["load15"] = (float(p) for p in parts[:3])
        out["uptime_sec"] = round(float(Path("/proc/uptime").read_text().split()[0]), 1)
    except OSError:
        pass
    return out


def _read_cpu() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat's aggregate cpu line.
    Steal = hypervisor ran another guest while this one had runnable
    work — the one counter that separates host contention from our own
    load. (0, 0) on non-Linux."""
    try:
        parts = Path("/proc/stat").read_text().splitlines()[0].split()
        vals = [int(v) for v in parts[1:9]]  # user..steal
        return vals[7], sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 2) if dt > 0 else 0.0


class _SpinSampler(threading.Thread):
    """Effective-core-speed probe: times a fixed 200k-xor loop every 2 s
    for the whole bench. Catches what steal can't — this box has shown
    2-5× micro-batch slowdowns with ~0%% steal AND phantom load-avg
    (5+ reported at 99.9%% idle, zero blocked tasks, kernel
    6.18.5-fc-v20), so neither loadavg nor steal alone separates "the
    box was slow" from "the code was slow". A widening spin-time
    distribution during the run is direct evidence of host-side
    scheduling/clock pressure. Runs in the driver process: the main
    thread is blocked on the Py4J socket during queries, so the GIL is
    free and the sampler costs <1%% of one core."""

    def __init__(self, interval: float = 2.0, n: int = 200_000) -> None:
        super().__init__(daemon=True)
        self._interval = interval
        self._n = n
        self._halt = threading.Event()
        self.samples_ms: list[float] = []
        # (perf_counter timestamp, ms) pairs so per-query windows can be
        # audited after the fact: the r10 quiesced run showed a query
        # landing 4× slow at 0% steal because the host went slow for
        # exactly its 3-run window — whole-run spin stats can't see that
        self.samples_ts: list[tuple[float, float]] = []

    def run(self) -> None:
        while not self._halt.is_set():
            t0 = time.perf_counter()
            x = 0
            for i in range(self._n):
                x ^= i
            ms = (time.perf_counter() - t0) * 1000.0
            self.samples_ms.append(ms)
            self.samples_ts.append((t0, ms))
            self._halt.wait(self._interval)

    def window_max(self, t0: float, t1: float) -> float | None:
        """Max spin time (ms) among samples OVERLAPPING [t0, t1], or
        None when the window held no sample (short queries between 2 s
        ticks). Overlap, not containment (ADVICE r10): a slow sample
        that began just before the window but spun through it is host
        contamination AT the query's start — attributing it to the
        previous window would let that contamination evade the retry
        valve. Reads a snapshot of the list the sampler thread appends
        to — safe under the GIL."""
        inside = [
            ms for (ts, ms) in list(self.samples_ts) if ts <= t1 and ts + ms / 1000.0 >= t0
        ]
        return round(max(inside), 2) if inside else None

    def stop(self) -> dict:
        self._halt.set()
        self.join(timeout=5)
        s = sorted(self.samples_ms)
        if not s:
            return {"n": 0}
        pick = lambda q: round(s[min(len(s) - 1, int(q * len(s)))], 2)  # noqa: E731
        return {"n": len(s), "p50_ms": pick(0.5), "p95_ms": pick(0.95), "max_ms": round(s[-1], 2)}


def _wait_for_quiesce(threshold: float, max_wait_sec: float) -> tuple[dict, bool]:
    """Poll 1-min load-avg until it drops below `threshold` or `max_wait_sec`
    elapses. Returns (final load snapshot, contaminated flag). The flag is
    True when the box never quiesced — the bench still runs (the driver needs
    an artifact either way) but the JSON self-reports the contamination so
    cross-round comparisons can discard it instead of re-litigating noise.
    """
    deadline = time.monotonic() + max_wait_sec
    snap = _read_load()
    while snap["load1"] > threshold and time.monotonic() < deadline:
        time.sleep(min(10.0, max(1.0, deadline - time.monotonic())))
        snap = _read_load()
    return snap, snap["load1"] > threshold


def _spin_once(n: int = 200_000) -> float:
    """One spin-loop timing in ms — the same fixed work the sampler
    times, callable synchronously for the pre-run quiet baseline."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x ^= i
    return (time.perf_counter() - t0) * 1000.0


def quiet_spin_baseline(samples: int = 8, pause_s: float = 0.05) -> float:
    """This box's effective core speed BEFORE Spark starts: min of a
    few spin samples (min, not median — the quiet floor is what a
    momentarily-busy pre-run box still touches between interruptions).
    The run-level contamination gate compares the run's spin p95
    against a multiple of this number (VERDICT r11 #2)."""
    best = float("inf")
    for _ in range(samples):
        best = min(best, _spin_once())
        time.sleep(pause_s)
    return round(best, 2)


def over_band_queries(
    timings: dict[str, float], bands: dict[str, float], band_factor: float
) -> list[str]:
    """Queries whose recorded best is above band_factor× their committed
    clean-round min — the set the end-of-run re-queue targets and the
    final contamination decision inspects."""
    return [
        n
        for n, t in timings.items()
        if bands.get(n) is not None and bands[n] > 0 and t > band_factor * bands[n]
    ]


def spin_contamination(
    over_band: list[str],
    spin_p95_ms: float | None,
    quiet_ms: float,
    factor: float = 2.0,
) -> bool:
    """Run-level quiet gate (VERDICT r11 #2): queries still over their
    committed band after every retry, on a run whose spin p95 exceeded
    ``factor``× the pre-run quiet baseline, are host noise — stamp the
    artifact contaminated rather than record noise as measurement.
    Over-band with a QUIET run is the honest opposite: a real
    regression, reported as such. Missing instruments (no spin samples
    or no baseline) with over-band queries default to contaminated —
    unprovable numbers must not pass as clean."""
    if not over_band:
        return False
    if spin_p95_ms is None or quiet_ms <= 0:
        return True
    return spin_p95_ms > factor * quiet_ms


BANDS_PATH = Path(REPO) / "BENCH_BANDS.json"


def _load_bands(path: Path = BANDS_PATH) -> dict[str, float]:
    """Per-query best committed mins from clean prior rounds (VERDICT
    r10 #2). Missing/corrupt file -> empty dict: the band valve simply
    never fires, the absolute spin valve still does."""
    try:
        data = json.loads(path.read_text())
        return {k: float(v) for k, v in data.get("queries", {}).items()}
    except (OSError, ValueError, AttributeError):
        return {}


def _retry_reason(
    name: str,
    best: float,
    wmax: float | None,
    bands: dict[str, float],
    spin_retry_ms: float,
    band_factor: float,
) -> str | None:
    """Why a query's best-of-N deserves one sheltered retry, or None.

    Two independent triggers, checked in order:
    - "spin": a spin sample overlapping the query's window exceeded the
      absolute threshold — direct evidence the host was slow RIGHT THEN.
    - "band": the result is >band_factor× this query's best committed
      min from a prior clean round, even with clean instruments — the
      box's documented "2-5× slow at ~0 steal" mode that an absolute
      spin threshold can miss (judge's r10 run: doc_bigram_novelty at
      4.2× with spin max 16.4 ms < 25 ms).
    """
    if wmax is not None and wmax > spin_retry_ms:
        return "spin"
    anchor = bands.get(name)
    if anchor is not None and anchor > 0 and best > band_factor * anchor:
        return "band"
    return None


def update_bands(artifact: dict, path: Path = BANDS_PATH) -> dict[str, float]:
    """Merge a bench artifact's per-query timings into BENCH_BANDS.json,
    keeping the min of (committed, observed) per query. Refuses
    contaminated artifacts — a noisy run must never tighten an anchor.
    Called manually after a clean run (python -c ...), never by the
    bench itself, so a pathological box can't corrupt the anchor file
    mid-round."""
    if artifact.get("contaminated"):
        raise ValueError("refusing to update bands from a contaminated run")
    bands = _load_bands(path)
    for name, sec in artifact.get("queries", {}).items():
        prev = bands.get(name)
        bands[name] = round(min(prev, float(sec)) if prev is not None else float(sec), 3)
    path.write_text(json.dumps({"queries": dict(sorted(bands.items()))}, indent=1) + "\n")
    return bands


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # r16 (ADVICE r15): the session's data-proportional AQE ceiling
    # reads $SPARK_GRAFT_SF_DIR itself — export the resolved default so
    # an un-exported run benches the same sizing rule as an exported
    # one (previously it silently fell back to the 8x-core ceiling,
    # a measured 18-40%/query tax at sf0.1).
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    sf = float(Path(sf_dir).name.removeprefix("sf")) if Path(sf_dir).name.startswith("sf") else 0.1

    load_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0"))
    load_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "120"))
    load_pre, contaminated = _wait_for_quiesce(load_threshold, load_wait)
    quiet_ms = quiet_spin_baseline()  # pre-Spark effective-core floor

    spark = get_spark(app_name="bench")
    registry = all_queries()

    # Warmup: JVM, codegen, parquet footer caches — one cheap query per
    # table family so no headline entry is billed JVM/codegen startup.
    registry["table_counts"].fn(spark, sf_dir).collect()
    registry["doc_quality"].fn(spark, sf_dir).collect()
    registry["ann_cosine_topk"].fn(spark, sf_dir).collect()
    registry["minute_timeline"].fn(spark, sf_dir).collect()  # events family (nanos-ts path)

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    steal_max = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "5.0"))
    # Per-query contamination valve: if the spin sampler saw a sample
    # >N× slower than this box's quiet baseline (~9 ms) DURING a
    # query's best-of-N window, the host was slow for exactly that
    # window and min-of-N didn't shed it (observed in the first r10
    # quiesced run: dedup_exact best-of-3 at 1.57 s vs 0.34-0.40 s on
    # immediate standalone re-pin, 0.02% steal, one 44 ms spin sample
    # in-window). One extra best-of-N pass for such queries, bounded
    # to a fixed budget so a persistently slow box can't loop forever.
    spin_retry_ms = float(os.environ.get("SPARK_GRAFT_BENCH_SPIN_RETRY_MS", "25"))
    retry_budget = int(os.environ.get("SPARK_GRAFT_BENCH_SPIN_RETRIES", "6"))
    band_factor = float(os.environ.get("SPARK_GRAFT_BENCH_BAND_FACTOR", "2.0"))
    bands = _load_bands()
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    steal: dict[str, float] = {}
    spin_window: dict[str, float | None] = {}
    spin_retried: list[str] = []
    band_retried: list[str] = []
    cpu_run_start = _read_cpu()
    sampler = _SpinSampler()
    sampler.start()

    def _best_of(name: str, n: int, record_first: bool) -> float:
        best = float("inf")
        for i in range(n):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if record_first and i == 0:
                first_run[name] = round(dt, 3)
            best = min(best, dt)
        return best

    for name in HEADLINE:
        cpu0 = _read_cpu()
        w0 = time.perf_counter()
        best = _best_of(name, runs, record_first=True)
        wmax = sampler.window_max(w0, time.perf_counter())
        reason = _retry_reason(name, best, wmax, bands, spin_retry_ms, band_factor)
        if reason is not None and retry_budget > 0:
            retry_budget -= 1
            (spin_retried if reason == "spin" else band_retried).append(name)
            w0 = time.perf_counter()
            best = min(best, _best_of(name, runs, record_first=False))
            retry_max = sampler.window_max(w0, time.perf_counter())
            # either window may hold no sample (short queries between
            # 2 s ticks) — max over whichever values exist
            present = [v for v in (wmax, retry_max) if v is not None]
            wmax = max(present) if present else None
        timings[name] = round(best, 3)
        spin_window[name] = wmax
        steal[name] = _steal_pct(cpu0, _read_cpu())

    # End-of-run re-queue (VERDICT r11 #2): queries still over their
    # committed band after the in-loop retry get ONE more best-of-N at
    # the end — host slowdowns are bursty, and minutes later the same
    # query frequently re-pins at its band (observed r10/r11). Bounded
    # by its own budget so a genuinely-regressed build terminates.
    end_budget = int(os.environ.get("SPARK_GRAFT_BENCH_END_RETRIES", "8"))
    end_requeued: list[str] = []
    for name in over_band_queries(timings, bands, band_factor):
        if end_budget <= 0:
            break
        end_budget -= 1
        end_requeued.append(name)
        timings[name] = round(min(timings[name], _best_of(name, runs, record_first=False)), 3)

    total = round(sum(timings.values()), 3)
    run_steal = _steal_pct(cpu_run_start, _read_cpu())
    spin = sampler.stop()
    load_post = _read_load()
    over_band = over_band_queries(timings, bands, band_factor)
    contaminated = (
        contaminated
        or run_steal > steal_max
        or spin_contamination(over_band, spin.get("p95_ms"), quiet_ms)
    )
    # Line 1: bulky per-query instrument maps — forensics, intentionally
    # NOT the line the driver parses (VERDICT r10 #1: one combined line
    # outgrew the driver's tail window and produced parsed:null).
    print(
        json.dumps(
            {
                "kind": "bench_instruments",
                "queries_single_run": first_run,
                "load_pre": load_pre,
                "load_post": load_post,
                "load_threshold": load_threshold,
                "queries_steal_pct": steal,
                "steal_threshold": steal_max,
                "spin_ms": spin,
                "queries_spin_max_ms": spin_window,
                "spin_retry_ms": spin_retry_ms,
                "band_factor": band_factor,
                "quiet_spin_ms": quiet_ms,
            }
        )
    )
    # Line 2 (LAST, compact): the headline the driver records. Scalar
    # instrument summaries only, so the line always fits the tail window.
    print(
        json.dumps(
            compact_result(
                timings, total, runs, sf, run_steal, spin, spin_retried,
                band_retried, contaminated, quiet_ms, end_requeued, over_band,
            )
        )
    )
    spark.stop()


def compact_result(
    timings: dict[str, float],
    total: float,
    runs: int,
    sf: float,
    run_steal: float,
    spin: dict,
    spin_retried: list[str],
    band_retried: list[str],
    contaminated: bool,
    quiet_ms: float = 0.0,
    end_requeued: list[str] | None = None,
    over_band: list[str] | None = None,
) -> dict:
    """The driver-parsed headline record. Keep this SCALAR-summaries-only
    (plus short name lists): BENCH_r10.json was parsed:null because
    per-query instrument maps grew the line past the driver's ~2 KB tail
    window; tests pin the encoded size of this dict at full headline
    width. `over_band` names the queries still above their committed
    band after every retry — with contaminated:false those are honest
    regressions, with contaminated:true the run's spin p95 said the box
    was slow and the numbers are not comparable (VERDICT r11 #2)."""
    return {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs_per_query": runs,
        "sf": sf,
        "steal_pct": run_steal,
        "spin_p95_ms": spin.get("p95_ms"),
        "spin_max_ms": spin.get("max_ms"),
        "quiet_spin_ms": quiet_ms,
        # name lists capped so the line can NEVER outgrow the tail
        # window (full membership is in the instruments line + timings;
        # r13 tightened all four caps when the 37th HEADLINE query put
        # the worst-case line 1 byte over the pin)
        "spin_retried": spin_retried[:4],
        "band_retried": band_retried[:4],
        "end_requeued": (end_requeued or [])[:5],
        "over_band": (over_band or [])[:4],
        "over_band_n": len(over_band or []),
        "contaminated": contaminated,
    }


if __name__ == "__main__":
    main()
