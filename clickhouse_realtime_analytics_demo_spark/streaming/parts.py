"""Crash-safe batch-id-keyed part stores (shared by streaming sinks).

Both incremental-MV tables (``streaming/mv.py``) and the dedup-at-
ingest accepted corpus (``streaming/dedup.py``) use the same storage
contract: a directory of ``b=<batch_id>`` parquet parts, one per
micro-batch, written idempotently (overwrite) so Structured Streaming
crash-replay rewrites the same directory with the same content. This
module holds the part-store mechanics that are identical across both:

- **compaction** (:func:`compact_parts`): fold many parts into one,
  atomically, with a pluggable ``fold`` (MVs re-aggregate partials;
  the dedup store just concatenates). The merged part is written to a
  dot-hidden directory (invisible to parquet readers), stamped with a
  ``_MANIFEST`` naming the parts it replaces, renamed into place, and
  only then are the inputs deleted — a crash at ANY step is replayed
  or rolled back by :func:`recover_compaction` on the next call.
- **commit gate**: with a ``checkpoint_dir``, only batch ids ≤ the
  last id in the stream checkpoint's ``commits/`` log are folded. A
  batch whose data write landed but whose commit record did not WILL
  be re-delivered with the same id on restart; folding it first would
  let the replayed ``b=N`` re-appear next to a merged part that
  already contains it. Previously-merged parts carry negative ids and
  always pass the gate — they never replay.
- **manifest-aware listing** (:func:`live_part_dirs`): readers see
  either the original parts (merge unpublished) or the merged part
  alone (inputs excluded via its manifest even before their deletion
  finishes), never both — ClickHouse's atomic part-set swap
  semantics, recovered on raw directories.
- **grace-window tombstones**: a folded part is not deleted at
  publish time — it is stamped ``_DOOMED`` (with a wall-clock
  timestamp) and physically removed only once ``GRACE_SECONDS`` have
  passed (:func:`reap_tombstones`). This closes the listing→resolution
  TOCTOU a concurrent reader otherwise hits: a reader that listed the
  old parts BEFORE the merge published can still resolve and scan
  them for the whole grace window; readers listing after the publish
  exclude them via the manifest/marker and see only the merged part.
  (A rename-then-delete scheme would NOT work — renaming destroys the
  very path the in-flight reader resolved.) File-level disappearance
  after grace expiry remains covered by ``ignoreMissingFiles``
  (session.py). At production scale this algebra is what
  snapshot-isolated table formats (Delta/Iceberg) provide natively;
  the grace window is their "retain old snapshots for N minutes"
  vacuum policy recovered on raw directories.
"""

from __future__ import annotations

import json
import shutil
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame

# How long a folded part stays on disk after its merge published.
# Bound: the max listing→consumption latency of any concurrent reader
# (full-suite contention on this box stretches a small read to tens of
# seconds; 120 s gives 5× headroom). Disk cost: one extra copy of the
# last fold's inputs, bounded and transient.
GRACE_SECONDS = 120.0
DOOMED_MARKER = "_DOOMED"


def is_transient_listing_race(e: Exception) -> bool:
    """Classify the three known listing→resolution transients a reader
    can hit against a concurrent compaction: a listed dir deleted whole
    (``PATH_NOT_FOUND`` — fails analysis), a footer file deleted
    mid-schema-inference (``FileNotFoundException`` — inference jobs
    don't honor ``ignoreMissingFiles``), or every listed dir drained
    (``UNABLE_TO_INFER_SCHEMA``). Matched on exception TYPE + error
    class first (``AnalysisException`` carries a stable errorClass in
    Spark 4.x), with the message-token match kept as the fallback for
    wrapped Py4J causes; tokens validated against Spark 4.1.2 (this
    container's pinned version)."""
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover — pyspark<3.4 layout
        AnalysisException = ()  # type: ignore[assignment]
    if isinstance(e, AnalysisException):
        cond = None
        for attr in ("getCondition", "getErrorClass"):  # 4.x / 3.4 names
            fn = getattr(e, attr, None)
            if callable(fn):
                try:
                    cond = fn()
                except Exception:  # noqa: BLE001 — introspection only
                    cond = None
            if cond:
                break
        if cond and ("PATH_NOT_FOUND" in cond or "UNABLE_TO_INFER_SCHEMA" in cond):
            return True
    msg = str(e)
    return any(
        tok in msg
        for tok in ("PATH_NOT_FOUND", "FileNotFoundException", "UNABLE_TO_INFER_SCHEMA")
    )


def _stamp_doomed(live: Path, doomed: list[str]) -> None:
    for name in doomed:
        victim = live / name
        marker = victim / DOOMED_MARKER
        if victim.exists() and not marker.exists():
            marker.write_text(repr(time.time()))


def reap_tombstones(live: Path, grace_seconds: float | None = None) -> None:
    """Physically delete ``_DOOMED``-stamped parts whose grace expired.
    Safe to call from any thread at any time; cheap when nothing is
    doomed (one directory listing)."""
    grace = GRACE_SECONDS if grace_seconds is None else grace_seconds
    now = time.time()
    for victim in sorted(live.glob("b=*")):
        try:
            stamp = float((victim / DOOMED_MARKER).read_text())
        except (OSError, ValueError):
            continue  # not doomed, or marker mid-write (next pass gets it)
        if now - stamp >= grace:
            shutil.rmtree(victim, ignore_errors=True)


def finish_deletes(
    live: Path,
    published: Path,
    doomed: list[str],
    grace_seconds: float | None = None,
) -> None:
    """Post-publish step: stamp the folded inputs doomed, reap any
    tombstone past its grace, and drop the publish manifest once every
    input is physically gone (until then the manifest keeps excluding
    them from new listings). Idempotent — recovery and the compaction
    cadence both re-drive it until the deletes finish."""
    _stamp_doomed(live, doomed)
    reap_tombstones(live, grace_seconds)
    if not any((live / name).exists() for name in doomed):
        (published / "_MANIFEST").unlink(missing_ok=True)


def recover_compaction(live: Path) -> None:
    """Replay or roll back an interrupted :func:`compact_parts`:

    - a hidden merge dir with ``_SUCCESS`` + ``_MANIFEST`` is complete
      — finish its publish/delete steps;
    - a published part still carrying ``_MANIFEST`` means the snapshot
      deletion was cut short — finish it;
    - a hidden merge dir without both markers is incomplete — discard
      it (its source parts are untouched).
    """
    for d in sorted(live.glob(".compact-*")):
        manifest = d / "_MANIFEST"
        if (d / "_SUCCESS").exists() and manifest.exists():
            publish_as, doomed = json.loads(manifest.read_text())
            target = live / publish_as
            if not target.exists():
                d.rename(target)
                finish_deletes(live, target, doomed)
            else:  # published by a concurrent/previous run
                shutil.rmtree(d)
        else:
            shutil.rmtree(d)
    for target in sorted(live.glob("b=*")):
        manifest = target / "_MANIFEST"
        if manifest.exists():
            _, doomed = json.loads(manifest.read_text())
            finish_deletes(live, target, doomed)


def last_committed_batch(checkpoint_dir: str) -> int:
    """Highest batch id with a commit record in the stream checkpoint's
    ``commits/`` log — the ids Structured Streaming will never replay.
    Returns -1 when nothing has committed yet."""
    commits = Path(checkpoint_dir) / "commits"
    ids = [int(p.name) for p in commits.glob("*") if p.name.isdigit()]
    return max(ids, default=-1)


def _doomed_names(parts: list[Path]) -> set[str]:
    """Parts a published merge has replaced: named in a live part's
    ``_MANIFEST``, or directly ``_DOOMED``-stamped (tombstoned but not
    yet reaped)."""
    doomed: set[str] = set()
    for d in parts:
        manifest = d / "_MANIFEST"
        if manifest.exists():
            try:
                _, names = json.loads(manifest.read_text())
                doomed.update(names)
            except (OSError, ValueError):
                pass  # manifest deleted/incomplete mid-read: its
                # deletes finished (or never published) — nothing to exclude
        if (d / DOOMED_MARKER).exists():
            doomed.add(d.name)
    return doomed


def live_part_dirs(path: str) -> list[Path]:
    """Manifest-aware snapshot listing: every live ``b=*`` part dir,
    excluding parts a published merge has replaced (even while their
    tombstones sit out the grace window)."""
    live = Path(path)
    parts = sorted(d for d in live.glob("b=*") if d.is_dir())
    doomed = _doomed_names(parts)
    return [d for d in parts if d.name not in doomed]


def compact_parts(
    path: str,
    read_parts: Callable[[list[str]], DataFrame],
    fold: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str | None = None,
    min_parts: int = 2,
    finish: Callable[[Path, Path, list[str]], None] | None = None,
) -> bool:
    """Fold the store's committed parts into one merged part (see the
    module docstring for the crash-safety and commit-gate contracts).
    ``read_parts`` loads a list of part dirs; ``fold`` produces the
    merged content (identity for concat-only stores). Returns True if
    a merge was published."""
    live = Path(path)
    recover_compaction(live)
    all_parts = sorted(d for d in live.glob("b=*") if d.is_dir())
    doomed = _doomed_names(all_parts)
    # _SUCCESS filter: a dir whose write was cut short mid-job (crash
    # before parquet's job commit) has no footers to fold and will be
    # rewritten by stream replay — never fold a torn part. This does
    # NOT replace the commit gate below: a part can be job-committed
    # (_SUCCESS present) while its STREAM batch is still uncommitted.
    # Doomed (tombstoned) parts are already inside an earlier merge —
    # re-folding one would double its rows.
    snapshot = sorted(
        d
        for d in all_parts
        if d.name not in doomed and (d / "_SUCCESS").exists()
    )
    if checkpoint_dir is not None:
        last = last_committed_batch(checkpoint_dir)
        snapshot = [
            d for d in snapshot if int(d.name.split("=")[1]) <= last
        ]  # negative (already-merged) ids pass this gate by construction
    if len(snapshot) < min_parts:
        return False
    ids = [int(d.name.split("=")[1]) for d in snapshot]
    merged_id = min(min(ids), 0) - 1
    merged = fold(read_parts([str(d) for d in snapshot]))
    hidden = live / f".compact-{abs(merged_id)}"
    merged.write.mode("overwrite").parquet(str(hidden))
    (hidden / "_MANIFEST").write_text(
        json.dumps([f"b={merged_id}", [d.name for d in snapshot]])
    )
    target = live / f"b={merged_id}"
    hidden.rename(target)
    # `finish` is an injection seam (tests simulate a crash between
    # publish and delete); recovery always uses the real deleter.
    (finish or finish_deletes)(live, target, [d.name for d in snapshot])
    return True
