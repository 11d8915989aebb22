"""Deterministic, layout-independent sampling (beyond-reference:
training-data pipeline surface, like operators/dedup.py).

Spark's built-in ``df.sample``/``sampleBy`` draw per-row Bernoulli
variates from ``rand(seed)``, whose stream depends on partition index
and row order — the "same" sample changes whenever the input layout
does (repartition, AQE coalesce, file split changes), which makes
pipeline runs unreproducible at scale. These operators instead derive
the decision from a HASH of a stable row key, so:

- the sample is a pure narrow ``filter`` — no shuffle, no state, and
  the decision for a row is identical at any parallelism, file
  layout, or cluster size;
- membership is portable: ``md5`` hex is identical in Spark and
  DuckDB (and every other engine), so the oracle can recompute the
  exact member set — sampling becomes *testable*, not just plausible;
- successive pipeline stages can re-derive membership instead of
  persisting it (the classic "did this doc land in the 10% eval
  split?" question is a pure function of (key, seed)).

Mechanics: ``u(key) = int(substr(md5(key || ':' || seed), 1, 15), 16)
/ 16^15`` is uniform on [0, 1) with 60 bits of resolution; a row is
in a fraction-``p`` sample iff its fixed-length 15-hex-char prefix is
lexicographically below the precomputed threshold ``hex(floor(p *
16^15))`` — a pure string compare, no bigint arithmetic in the hot
path, identical semantics in the SQL oracle.

Scale: hash-sample and stratified-sample are single narrow filters
(column-pruned scan → filter; whole-stage codegen). The exact-k
reservoir is ``ORDER BY (u, key) LIMIT k`` → TakeOrderedAndProject:
per-partition top-k then a k-row driver merge — k rows of driver
memory, never a global sort. Keep k bounded (≤ ~10^6); above that,
take a hash-sample at ~k/N and reservoir the remainder.

NULL-key policy (uniform across all four operators): a NULL key has
no stable identity to hash, so NULL-key rows are EXCLUDED — dropped
from samples, splits, and reservoirs alike. This keeps the
consistency contract exact ("the train split IS the fraction-0.8
sample", splits disjoint-and-exhaustive *over non-NULL keys*) instead
of NULL rows silently falling into the remainder split while being
dropped from samples. Callers who need NULL-key rows must assign a
surrogate key first (e.g. ``coalesce(key, uuid)``) — an explicit
decision, not a silent default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sample_hash",
    "sample_stratified",
    "sample_reservoir",
    "split_hash",
    "hash_unit_prefix",
]

_PREFIX_LEN = 15  # 60 bits: fits exact integer thresholds in a double-free path


def hash_unit_prefix(key: Column, seed: str) -> Column:
    """Fixed-length lowercase-hex prefix whose lexicographic order
    equals the numeric order of a uniform 60-bit draw for ``key``."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + seed))), 1, _PREFIX_LEN)


def fraction_threshold(fraction: float) -> str:
    """Hex threshold T such that P[prefix < T] == fraction (±2^-60)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(fraction * (16**_PREFIX_LEN))
    if v >= 16**_PREFIX_LEN:
        # 'g' sorts above every lowercase-hex prefix: keep ALL rows
        # (a 16-char numeric threshold would compare lexicographically
        # wrong against 15-char prefixes)
        return "g"
    return format(v, f"0{_PREFIX_LEN}x")


def sample_hash(df: DataFrame, key_col: str, fraction: float, seed: str = "s0") -> DataFrame:
    """Deterministic fraction-``p`` sample: row kept iff
    ``u(key, seed) < p``. Same rows at any parallelism or layout.
    NULL keys are excluded (module NULL-key policy)."""
    return df.filter(
        F.col(key_col).isNotNull()
        & (hash_unit_prefix(F.col(key_col), seed) < F.lit(fraction_threshold(fraction)))
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "s0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (the reproducible analog of
    ``sampleBy``): stratum -> threshold rides as a map literal in the
    plan (like the hashed dictionary layout) — still one narrow
    filter, no join, no shuffle. Strata absent from ``fractions`` get
    ``default_fraction``. NULL keys are excluded (module NULL-key
    policy)."""
    pairs: list[Column] = []
    for stratum, frac in fractions.items():
        pairs += [F.lit(stratum), F.lit(fraction_threshold(frac))]
    thr = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(fraction_threshold(default_fraction)),
    )
    return df.filter(
        F.col(key_col).isNotNull() & (hash_unit_prefix(F.col(key_col), seed) < thr)
    )


def split_hash(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "s0",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test): every row gets
    exactly one label from ``splits`` (name -> weight; weights must
    sum to 1) by which cumulative-threshold interval its hash draw
    falls in — DISJOINT and EXHAUSTIVE over non-NULL keys by
    construction, stable under repartitioning and appends,
    re-derivable by any engine. A pure when-chain over the shared
    prefix column: one expression, no shuffle, no join. NULL keys are
    excluded (module NULL-key policy) so every emitted label agrees
    with the corresponding ``sample_hash`` membership."""
    if not splits or any(w <= 0 for w in splits.values()):
        raise ValueError(f"split weights must all be positive, got {splits}")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # NOTE: label boundaries follow dict insertion order; pass splits
    # in a stable order (they are part of the reproducibility contract)
    u = hash_unit_prefix(F.col(key_col), seed)
    expr: Column | None = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = u < F.lit(fraction_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])  # remainder bucket: exhaustive without float drift
    expr = last if expr is None else expr.otherwise(last)
    return df.filter(F.col(key_col).isNotNull()).withColumn(out_col, expr)


def sample_reservoir(df: DataFrame, k: int, key_col: str, seed: str = "s0") -> DataFrame:
    """Exact-k deterministic sample: the k rows with the smallest
    ``(u(key, seed), key)`` — a uniform simple random sample that is
    stable under data layout AND under appends that don't displace
    the winners. TakeOrderedAndProject keeps it distributed (no
    global sort); k is driver-bounded, keep it ≤ ~10^6. NULL keys are
    excluded (module NULL-key policy; they would otherwise sort first
    under NULLS FIRST and crowd out every real winner)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = hash_unit_prefix(F.col(key_col), seed)
    return (
        df.filter(F.col(key_col).isNotNull())
        .orderBy(u.asc(), F.col(key_col).asc())
        .limit(k)
    )
