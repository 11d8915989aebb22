"""TTL retention (SURVEY §2.9 ST9, §4 X11).

The reference sets background part-level TTLs — 90 d on events, 1 y on
orders (04-add-ttl.sql:29,37-38) — chosen over DELETE because TTL
"operates on entire parts" (04-add-ttl.sql:92; stream_data.py:87-141)
and is "background, non-blocking by design" (04-add-ttl.sql:46-99).

The Spark analog with the same cost model: month-partitioned tables →
retention = DROP whole yyyymm partition directories older than the
cutoff (metadata-only, no rewrite), plus an optional row-level rewrite
ONLY for the single boundary month.

**Non-blocking is delivered structurally, not by config** (VERDICT r13
#1: an in-place ``shutil.rmtree`` of a live partition lost a race with
a reader mid-footer-read — ``ignoreMissingFiles`` does not cover a file
that vanishes after its open began, nor a ``.crc`` checksum sidecar
vanishing between data-file open and checksum open). Partition drops
now ride the same crash-safe contract the state stores use
(``streaming/parts.py``, built for the r7 TOCTOU):

- **doom, don't delete**: an expired partition is stamped with a
  ``_DOOMED`` marker (one atomic file create); every byte stays on
  disk, so ANY reader that resolved paths inside it — before or after
  the stamp — keeps reading successfully.
- **marker-aware listings**: ``sources.writer.read_table`` excludes
  doomed partitions (and includes published boundary-trim generations)
  at listing time, so new queries stop seeing expired rows the instant
  the marker lands. Bare ``spark.read.parquet(table)`` readers keep
  seeing the doomed rows until the physical reap — bounded staleness
  ≤ grace, exactly a part-level TTL between background merges.
- **grace-window reap**: :func:`reap_expired` physically removes a
  doomed partition only once ``GRACE_SECONDS`` (shared with parts.py)
  have passed since its stamp. No file a reader could have resolved is
  deleted within the grace window; disappearance after grace is
  additionally covered by ``spark.sql.files.ignoreMissingFiles``
  (session.py) for pathological readers slower than the grace bound.
  ``grace_seconds=0`` is the quiesced/maintenance-window mode:
  immediate physical drop (single-writer tests, offline compaction).

Semantics under LIVE load (tests/test_retention_load.py):

- **readers**: never fail — during the grace window nothing is
  physically removed; after it, only partitions no in-grace reader can
  have listed. ``read_table`` listings flip atomically on the marker.
- **MV streams**: input files committed to the checkpoint are never
  re-read; files that vanish at reap were committed ≥ grace earlier.
  Rows backdated into an already-doomed partition still reach the MV
  (the stream's glob sees doomed dirs) before the reap removes them —
  the rollup outlives the raw data, like the reference's 90 d raw TTL
  under longer-lived MV summaries.
- **MVs keep their aggregates**: retention on the RAW table does not
  retract MV rows; MV totals equal the aggregation over ALL ingested
  rows, dropped or not.
- **backdated inserts**: a row older than the cutoff written AFTER a
  TTL pass survives until the next pass — eventual, bounded-staleness
  expiry, exactly like part-level TTL between background merges.
- **one divergence from ClickHouse, with a product-level opt-in**:
  the reference's MVs populate SYNCHRONOUSLY at INSERT, so a row
  always reaches every MV before TTL can touch it; our maintenance
  streams lag by up to a trigger. A part reaped in that window would
  expire its rows from the MV too. The grace window makes this
  operationally unreachable (MV lag seconds ≪ doom→reap grace); for
  EXACT parity pass ``consumed=checkpoint_consumed_paths(ckpt)`` to
  :func:`apply_ttl`/:func:`reap_expired` — or set
  ``TTLService(gate_on_checkpoint={table: ckpt})`` — and no physical
  removal (reap, trim fold) ever touches a partition holding a file
  the maintenance stream's checkpoint has not COMMITTED, even at
  ``grace_seconds=0`` (tests/test_retention_load.py::
  test_checkpoint_gate_never_expires_unconsumed).

**Boundary-month trim is incompatible with a LIVE maintenance stream
over the raw table** (r14 ADVICE): publishing a trim generation into
``yyyymm=<boundary>`` creates files with NEW names (``part-*`` from
the rewrite, ``late-*`` from the fold), and a file-source stream
globbing ``{table}/yyyymm=*`` treats them as fresh input — the entire
trimmed month would re-aggregate into the MVs. Run
``trim_boundary_month`` only on tables with no attached maintenance
stream, or during a stream-stopped maintenance window (it is off by
default everywhere: ``apply_ttl``, :class:`TTLService`,
``service.start_stack``).

Boundary-month trim (row-level, optional): the kept rows are written
to a dot-hidden generation dir ``.ttl-trim-<yyyymm>-<ms>`` (invisible
to every parquet listing), a manifest records the files it replaces,
and the OLD partition dir is stamped doomed — that single marker write
is the atomic flip: ``read_table`` readers see the old files before it
and the generation after it, never both. At reap, files written into
the doomed dir AFTER the trim (late backdated arrivals, not in the
manifest) are folded into the generation before the old dir is
removed, then the generation is hardlinked into a fresh staged dir and
renamed to the partition name; the generation itself is tombstoned and
reaped a further grace later so readers that resolved its paths finish
undisturbed. Late boundary arrivals during a trim window become
visible at publish (staleness ≤ grace, documented), never lost.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from dataclasses import dataclass, field
from datetime import date, timedelta
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.streaming.parts import (
    DOOMED_MARKER,
    GRACE_SECONDS,
    last_committed_batch,
)

TRIM_MANIFEST = "_TTL_TRIM_MANIFEST"


def _stamp_doomed(dirpath: Path) -> bool:
    """Stamp a directory doomed (idempotent). True if newly stamped."""
    marker = dirpath / DOOMED_MARKER
    if marker.exists():
        return False
    marker.write_text(repr(time.time()))
    return True


def _doom_ts(dirpath: Path) -> float | None:
    try:
        return float((dirpath / DOOMED_MARKER).read_text())
    except (OSError, ValueError):
        return None


def _link_or_copy(src: Path, dst: Path) -> None:
    try:
        os.link(src, dst)
    except OSError:  # cross-device / fs without hardlinks
        shutil.copy2(src, dst)


def _link_with_sidecar(src: Path, dst_dir: Path, dst_name: str | None = None) -> None:
    """Hardlink a parquet file plus its Hadoop ``.name.crc`` checksum
    sidecar if present (a data file whose sidecar vanishes mid-read was
    one of the two r13 race signatures)."""
    name = dst_name or src.name
    if not (dst_dir / name).exists():
        _link_or_copy(src, dst_dir / name)
    crc = src.parent / f".{src.name}.crc"
    if crc.exists() and not (dst_dir / f".{name}.crc").exists():
        _link_or_copy(crc, dst_dir / f".{name}.crc")


def _gen_target(gen: Path) -> int | None:
    """Partition value a trim generation replaces, from its manifest —
    and ONLY its manifest. ``TRIM_MANIFEST`` is the trim's COMMIT
    point: a generation whose Spark write finished (``_SUCCESS``
    present) but whose manifest never landed is TORN, and the r14
    dir-name fallback let exactly that torn state pass the gates with
    ``replaced=∅`` — at reap every original boundary file folded in as
    ``late-*`` (duplicating kept rows) and the trimmed expired rows
    resurrected (r14 ADVICE retention.py:253). None = not a committed
    trim."""
    try:
        return int(json.loads((gen / TRIM_MANIFEST).read_text())["target"])
    except (OSError, ValueError, KeyError):
        return None


def _manifest_replaced(gen: Path) -> set[str]:
    """File names the committed trim consumed (its manifest's
    ``replaced`` set); empty only for a torn manifest, which the
    callers gate out before folding."""
    try:
        return set(json.loads((gen / TRIM_MANIFEST).read_text())["replaced"])
    except (OSError, ValueError, KeyError):
        return set()


def _dirname_ms(name: str) -> float | None:
    """Creation time (epoch seconds) from a hidden dir's ``-<ms>``
    suffix (``.ttl-trim-<yyyymm>-<ms>``, ``.ttl-reap-<yyyymm>-<ms>``)."""
    try:
        return int(name.rsplit("-", 1)[1]) / 1000.0
    except (IndexError, ValueError):
        return None


def checkpoint_consumed_paths(checkpoint_dir: str) -> set[str]:
    """Absolute local paths of every source file the maintenance
    stream's checkpoint has COMMITTED: the union of file-source
    offset-log entries (``sources/0/<n>`` plus ``<n>.compact``
    rollups) for batch ids ≤ the last id in ``commits/``. Files logged
    for an uncommitted batch are excluded — Structured Streaming will
    re-deliver that batch after a crash, so its rows are not yet
    durably folded into the MVs.

    This is the synchronous-MV parity gate (ClickHouse MVs populate AT
    insert, so TTL can never outrun them): pass the result as
    ``consumed=`` to :func:`apply_ttl`/:func:`reap_expired` and no
    physical removal touches a partition holding an uncommitted file.
    Cost: one listing of the checkpoint's two log dirs + a line scan
    of ≤ committed-batch-count small JSON files — metadata-sized,
    never data-sized (the ``.compact`` rollups bound the file count)."""
    last = last_committed_batch(checkpoint_dir)
    out: set[str] = set()
    src = Path(checkpoint_dir) / "sources" / "0"
    if last < 0 or not src.is_dir():
        return out
    for f in sorted(src.iterdir()):
        base = f.name.removesuffix(".compact")
        if not base.isdigit() or int(base) > last:
            continue
        try:
            lines = f.read_text().splitlines()
        except OSError:
            continue
        for line in lines:
            if not line.startswith("{"):
                continue  # "v1" version header
            try:
                p = json.loads(line).get("path", "")
            except ValueError:
                continue
            if p.startswith("file:"):
                p = p[len("file:"):]
                while p.startswith("//"):
                    p = p[1:]
            if p:
                out.add(os.path.realpath(p))
    return out


def _partition_consumed(dirpath: Path, consumed: set[str]) -> bool:
    """True when every data file currently in the partition is in the
    committed-consumed set — the per-partition form of the parity
    gate."""
    return all(
        os.path.realpath(str(p)) in consumed for p in dirpath.glob("*.parquet")
    )


def expired_months(table_path: str, cutoff: date) -> list[int]:
    """yyyymm partition values strictly before the cutoff's month."""
    cutoff_month = cutoff.year * 100 + cutoff.month
    out = []
    for p in Path(table_path).glob("yyyymm=*"):
        try:
            val = int(p.name.split("=", 1)[1])
        except ValueError:
            continue
        if val < cutoff_month:
            out.append(val)
    return sorted(out)


def ttl_live_listing(table_path: str) -> tuple[list[Path], list[Path]] | None:
    """Marker-aware snapshot listing for a month-partitioned lake table.

    Returns ``None`` when the table carries no TTL state at all (no
    doomed partition, no trim generation) — the caller's fast path —
    else ``(live_partition_dirs, live_trim_generations)``. A generation
    is live while its target partition is absent or still doomed
    (unpublished); once a fresh target exists the target carries the
    rows and the generation is excluded. Mirrors
    ``parts.live_part_dirs``: readers see old files or the trimmed
    generation, never both.
    """
    base = Path(table_path)
    part_dirs = sorted(d for d in base.glob("yyyymm=*") if d.is_dir())
    gens = sorted(d for d in base.glob(".ttl-trim-*") if d.is_dir())
    live = [d for d in part_dirs if not (d / DOOMED_MARKER).exists()]
    if len(live) == len(part_dirs) and not gens:
        return None
    live_gens = []
    for g in gens:
        if not (g / "_SUCCESS").exists() or not (g / TRIM_MANIFEST).exists():
            # torn write — the data write or its manifest (the trim's
            # COMMIT point) never landed; never serve it
            continue
        if (g / DOOMED_MARKER).exists():
            continue  # superseded by its published target
        val = _gen_target(g)
        if val is None:
            continue
        target = base / f"yyyymm={val}"
        if target.exists() and not (target / DOOMED_MARKER).exists():
            # the target serves the reads: a fresh publish, a trim that
            # never committed (old dir not yet stamped — readers keep
            # the pre-trim state, no double-read), or a backdated
            # append resurrecting the name mid-publish (reap re-dooms
            # it and the generation resumes on the next listing).
            continue
        live_gens.append(g)
    return live, live_gens


def reap_expired(
    table_path: str,
    grace_seconds: float | None = None,
    consumed: set[str] | None = None,
) -> list[str]:
    """Physically remove doomed partitions (and publish boundary-trim
    generations) whose grace window has expired. Safe to call from any
    thread at any cadence; cheap when nothing is doomed. Returns the
    names physically removed this pass.

    ``consumed``: optional committed-source-file set from
    :func:`checkpoint_consumed_paths` — the synchronous-MV parity
    gate. When given, NO physical removal (plain reap, trim fold)
    touches a partition holding a data file outside the set, even at
    ``grace_seconds=0``: rows the maintenance stream has not durably
    folded into the MVs can never be expired from under it."""
    grace = GRACE_SECONDS if grace_seconds is None else grace_seconds
    base = Path(table_path)
    now = time.time()
    reaped: list[str] = []

    # Trim generations first: their doomed target needs late-arrival
    # folding before removal, and a published generation is itself
    # tombstoned for a further grace window.
    trim_targets: set[str] = set()
    for gen in sorted(base.glob(".ttl-trim-*")):
        if not (gen / "_SUCCESS").exists() or not (gen / TRIM_MANIFEST).exists():
            # TORN trim: the Spark write or the manifest — the commit
            # point — never landed. Never treated as a trim (the r14
            # dir-name fallback turned this state into duplicated kept
            # rows + resurrected expired rows at reap); discarded like
            # any uncommitted artifact once the writing pass is
            # certainly dead (its own grace, floor 60 s — the manifest
            # write follows the data write within milliseconds).
            ms = _dirname_ms(gen.name)
            if ms is not None and now - ms >= max(grace, 60.0):
                shutil.rmtree(gen, ignore_errors=True)
            continue
        val = _gen_target(gen)
        if val is None:
            continue
        gts = _doom_ts(gen)
        if gts is not None:
            # superseded (already published): only its own tombstone is
            # left to expire — its target is an ordinary partition again
            if now - gts >= grace:
                shutil.rmtree(gen, ignore_errors=True)
            continue
        target = base / f"yyyymm={val}"
        trim_targets.add(target.name)
        if target.exists() and not (target / DOOMED_MARKER).exists():
            if (target / "_SUCCESS").exists():
                # crash between the publish rename and the generation
                # tombstone: the staged target is live — heal by
                # tombstoning the generation now
                _stamp_doomed(gen)
                continue
            # a trim that crashed before stamping its commit, OR a
            # backdated append resurrecting the name mid-publish: doom
            # the dir; after grace, every file not in the manifest is
            # folded into the generation and the trim (re)publishes —
            # both cases converge to the correct trimmed state
            _stamp_doomed(target)
        tts = _doom_ts(target)
        if (
            target.exists()
            and tts is not None
            and now - tts >= grace
            and (consumed is None or _partition_consumed(target, consumed))
        ):
            # Freeze the file set FIRST: one atomic rename moves the
            # doomed target aside, so the late-arrival fold and the
            # removal below operate on the SAME frozen files — a
            # backdated append that job-commits between a fold's glob
            # and an in-place rmtree was previously deleted unfolded
            # (r14 ADVICE retention.py:255). A writer racing the
            # rename lands either before it (file frozen → folded) or
            # recreates yyyymm=<val> fresh (rows survive; next pass
            # re-dooms the resurrected dir).
            frozen = base / f".ttl-reap-{val}-{time.time_ns() // 1_000_000}"
            try:
                target.rename(frozen)
            except OSError:
                pass  # transient (concurrent recreate mid-rename); retry next pass
            else:
                reaped.append(target.name)
        # Fold + remove every frozen reap dir for this target —
        # including leftovers from a pass that crashed between the
        # rename and the removal (the links are idempotent, so
        # resuming a half-folded dir is safe).
        replaced = _manifest_replaced(gen)
        for frozen in sorted(base.glob(f".ttl-reap-{val}-*")):
            for p in sorted(frozen.glob("*.parquet")):
                if p.name not in replaced:
                    _link_with_sidecar(p, gen, f"late-{p.name}")
            shutil.rmtree(frozen, ignore_errors=True)
        if not target.exists():
            # publish: stage hardlinks, then one atomic rename into the
            # partition name. The generation keeps its paths alive for
            # readers that resolved them pre-publish.
            staged = base / f".ttl-pub-{val}"
            if staged.exists():
                shutil.rmtree(staged)
            staged.mkdir()
            for p in sorted(gen.glob("*.parquet")):
                _link_with_sidecar(p, staged)
            (staged / "_SUCCESS").touch()
            try:
                staged.rename(target)
            except OSError:
                # a backdated append resurrected the target mid-window;
                # the re-doom above retries the fold+publish next pass
                shutil.rmtree(staged, ignore_errors=True)
            else:
                _stamp_doomed(gen)

    for d in sorted(base.glob("yyyymm=*")):
        if d.name in trim_targets:
            continue  # handled above (needs late-arrival folding)
        ts = _doom_ts(d)
        if ts is not None and now - ts >= grace:
            if consumed is not None and not _partition_consumed(d, consumed):
                # parity gate: a file here (backdated append included)
                # is not in the stream checkpoint's committed set —
                # leave the partition doomed-but-present until the MVs
                # have durably folded it
                continue
            shutil.rmtree(d, ignore_errors=True)
            reaped.append(d.name)
    return reaped


def apply_ttl(
    spark: SparkSession,
    table_path: str,
    date_col: str,
    cutoff: date,
    trim_boundary_month: bool = False,
    grace_seconds: float | None = None,
    consumed: set[str] | None = None,
) -> dict:
    """One TTL pass: doom expired month partitions (logical drop —
    new ``read_table`` listings exclude them immediately), optionally
    trim the boundary month via a hidden generation, and reap anything
    a PREVIOUS pass doomed whose grace expired. ``grace_seconds=None``
    uses the shared ``parts.GRACE_SECONDS``; ``0`` is the quiesced
    mode (immediate physical removal — callers must hold no concurrent
    readers). Returns a report.

    ``consumed`` (see :func:`checkpoint_consumed_paths`): with the
    parity gate, dooming stays on schedule (the logical drop costs the
    MVs nothing — the stream's glob still reads doomed dirs) but every
    DESTRUCTIVE step — the reap and the boundary trim — skips
    partitions holding files the maintenance checkpoint has not
    committed. ``trim_boundary_month`` must NOT be combined with a
    live maintenance stream over this table (module docstring: the
    published generation's files re-enter the stream as fresh input)."""
    base = Path(table_path)
    reaped = reap_expired(table_path, grace_seconds, consumed=consumed)

    dropped = []
    for val in expired_months(table_path, cutoff):
        d = base / f"yyyymm={val}"
        if d.is_dir() and _stamp_doomed(d):
            dropped.append(val)

    trimmed_rows = 0
    boundary = cutoff.year * 100 + cutoff.month
    boundary_dir = base / f"yyyymm={boundary}"
    if (
        trim_boundary_month
        and boundary_dir.exists()
        and not (boundary_dir / DOOMED_MARKER).exists()
        # parity gate: trimming rewrites (and so eventually expires)
        # rows from the replaced files — defer until the stream has
        # committed every file currently in the boundary month
        and (consumed is None or _partition_consumed(boundary_dir, consumed))
    ):
        # pin the file snapshot FIRST and read exactly those files, so
        # the manifest's "replaced" set is precisely what the rewrite
        # consumed — a backdated file landing mid-trim is neither lost
        # (not in the manifest → folded at reap) nor double-counted
        replaced_paths = sorted(boundary_dir.glob("*.parquet"))
        if replaced_paths:
            df = spark.read.parquet(*[str(p) for p in replaced_paths])
            kept = df.filter(F.col(date_col) >= F.lit(cutoff))
            trimmed_rows = df.count() - kept.count()
        if trimmed_rows:
            gen = base / f".ttl-trim-{boundary}-{time.time_ns() // 1_000_000}"
            kept.withColumn("yyyymm", F.lit(boundary).cast("int")).write.mode(
                "overwrite"
            ).parquet(str(gen))
            (gen / TRIM_MANIFEST).write_text(
                json.dumps(
                    {"target": boundary, "replaced": [p.name for p in replaced_paths]}
                )
            )
            # the atomic flip: listings exclude the old dir and include
            # the generation from this instant on
            _stamp_doomed(boundary_dir)

    # end-of-pass reap so grace_seconds=0 (quiesced) removes what THIS
    # pass doomed; with a real grace window this is a cheap no-op scan
    reaped += reap_expired(table_path, grace_seconds, consumed=consumed)

    return {
        "dropped_partitions": dropped,
        "trimmed_boundary_rows": trimmed_rows,
        "reaped": reaped,
        "cutoff": cutoff.isoformat(),
    }


@dataclass
class TTLService:
    """Background TTL thread — the ClickHouse background-merge TTL
    analog (04-add-ttl.sql:46-99 "background, non-blocking by
    design"), the lake-side twin of ``mv.Compactor``: periodically
    applies :func:`apply_ttl` (doom + reap cadence) to each registered
    table with a sliding ``retention_days`` horizon.

    ``targets``: list of ``(table_path, date_col, retention_days)``.
    ``clock``: zero-arg callable returning "today" (tests inject a
    stepped clock); None = ``date.today()`` at each pass.
    ``gate_on_checkpoint``: optional ``{table_path: checkpoint_dir}``
    — the synchronous-MV parity opt-in (ClickHouse MVs populate AT
    insert, so TTL can never outrun them): each pass reads the
    maintenance stream's committed file set
    (:func:`checkpoint_consumed_paths`) and no destructive step
    touches a partition holding an uncommitted file, even with grace
    forced to 0. ``trim_boundary_month`` must stay off for any table
    with a live maintenance stream (module docstring). Reports per
    table accumulate in ``stats`` (dooms/reaps/errors counted, last
    exception kept) for ops introspection. Errors never kill the
    thread — a failed pass retries next tick (every step is
    idempotent)."""

    targets: list[tuple]  # (table_path, date_col, retention_days)
    spark: SparkSession | None = None  # only needed for trim passes
    interval_s: float = 3600.0
    grace_seconds: float | None = None
    trim_boundary_month: bool = False
    clock: object = None
    gate_on_checkpoint: dict[str, str] | None = None
    stats: dict[str, dict] = field(default_factory=dict)
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)

    def _agg(self, table_path: str) -> dict:
        return self.stats.setdefault(
            table_path,
            {
                "passes": 0,
                "doomed": 0,
                "reaped": 0,
                "trimmed": 0,
                "errors": 0,
                "last_error": None,
            },
        )

    def run_once(self) -> None:
        today = self.clock() if self.clock is not None else date.today()
        gates = self.gate_on_checkpoint or {}
        for table_path, date_col, days in self.targets:
            try:
                ckpt = gates.get(table_path)
                consumed = checkpoint_consumed_paths(ckpt) if ckpt else None
                report = apply_ttl(
                    self.spark,
                    table_path,
                    date_col,
                    today - timedelta(days=days),
                    trim_boundary_month=self.trim_boundary_month,
                    grace_seconds=self.grace_seconds,
                    consumed=consumed,
                )
            except Exception as exc:  # noqa: BLE001 — background pass; retried
                # count it (r14 ADVICE retention.py:393: a silently
                # swallowed per-tick failure made a permanently broken
                # target indistinguishable from a healthy idle one)
                agg = self._agg(table_path)
                agg["errors"] += 1
                agg["last_error"] = repr(exc)
                continue
            agg = self._agg(table_path)
            agg["passes"] += 1
            agg["doomed"] += len(report["dropped_partitions"])
            agg["reaped"] += len(report["reaped"])
            agg["trimmed"] += report["trimmed_boundary_rows"]

    def _run(self) -> None:
        while not self._stop.is_set():
            self.run_once()
            self._stop.wait(self.interval_s)

    def start(self) -> "TTLService":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join()
