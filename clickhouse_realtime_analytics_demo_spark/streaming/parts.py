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
  semantics, recovered on raw directories. The residual
  listing-vs-delete race on already-doomed dirs is covered by
  ``ignoreMissingFiles`` (session.py); at production scale this
  algebra rides on a table format with snapshot isolation
  (Delta/Iceberg) instead of directory listings.
"""

from __future__ import annotations

import json
import shutil
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame


def finish_deletes(live: Path, published: Path, doomed: list[str]) -> None:
    for name in doomed:
        victim = live / name
        if victim.exists():
            shutil.rmtree(victim)
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


def live_part_dirs(path: str) -> list[Path]:
    """Manifest-aware snapshot listing: every live ``b=*`` part dir,
    excluding parts a published merge has replaced (even if their
    deletion hasn't finished)."""
    live = Path(path)
    parts = sorted(d for d in live.glob("b=*") if d.is_dir())
    doomed: set[str] = set()
    for d in parts:
        manifest = d / "_MANIFEST"
        if manifest.exists():
            try:
                _, names = json.loads(manifest.read_text())
                doomed.update(names)
            except (OSError, ValueError):
                continue  # manifest deleted/incomplete mid-read: its
                # deletes finished (or never published) — nothing to exclude
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
    # _SUCCESS filter: a dir whose write was cut short mid-job (crash
    # before parquet's job commit) has no footers to fold and will be
    # rewritten by stream replay — never fold a torn part. This does
    # NOT replace the commit gate below: a part can be job-committed
    # (_SUCCESS present) while its STREAM batch is still uncommitted.
    snapshot = sorted(
        d for d in live.glob("b=*") if d.is_dir() and (d / "_SUCCESS").exists()
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
