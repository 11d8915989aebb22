"""Distributed connected components → near-duplicate CLUSTER resolution.

Pair-producing dedup operators (``dedup.minhash_dedup_pairs``,
``similarity.embedding_near_dup_pairs``) answer "which docs are
near-duplicates of each other"; a training-data pipeline must then
answer "which docs do I KEEP" — and that requires resolving the pair
graph into connected components (near-dup similarity is not
transitive, but keep-one-per-component is the standard conservative
policy: Lee et al., "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499 uses exactly this union on the MinHash match
graph).

Algorithm: alternating Large-Star / Small-Star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014) — each round is two shuffle stages over the EDGE set,
and the edge count never grows above the input edge count, so the
cost profile is O(rounds × one-edge-shuffle). Rounds needed:
O(log² n) worst case, in practice 3–5 for near-dup graphs (clusters
are near-cliques with tiny diameter). This is the MapReduce-native
formulation: no vertex-centric message passing, no driver-side state,
just groupBy/join over (src, dst) rows — ideal for DataFrame
execution.

Why not label propagation (iterate "node ← min(neighbors)")? Its
round count is O(graph diameter) — a pathological chain of D
near-dups needs D rounds of full-edge shuffles; star contraction
needs O(log D). The chain case is real (document revision histories).

Scale notes (100 TB): each iteration calls ``localCheckpoint`` to
truncate lineage — without it the plan doubles per round and Catalyst
re-analysis dominates by round ~8 (and fault recovery replays the
whole chain). On a real cluster prefer ``spark.sparkContext
.setCheckpointDir`` + ``.checkpoint()`` for fault-tolerant truncation;
localCheckpoint trades re-computability for speed, the right default
on a long-lived job with executor-loss retry disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Star-contraction converges in O(log² n) rounds; 50 rounds covers
# n ≫ any real corpus. Hitting the cap means non-convergence (a bug),
# so it raises rather than returning a partial clustering.
_MAX_ROUNDS = 50

# Driver-resolution threshold (r15 optimization round): an edge set at
# or below this count is resolved by a union-find ON THE DRIVER
# instead of distributed star-contraction rounds. Rationale (guide
# §1.2 "the distributed algorithm" + §5 "the driver should do almost
# no data work" — bounded work is the exception, exactly like
# broadcast-join selection): each star round costs ~4 shuffles + a
# checkpoint job + a checksum job, all fixed overhead when the edge
# set is tiny (near-dup graphs after exact verify usually are — 10.7k
# pairs at sf0.1); a 64k-edge collect is ≤ ~2 MB of driver data,
# SMALLER than the broadcast relations the same queries already build,
# and the union-find is microseconds. Measured on the bench queries
# (same-session ABBA, warm best-of-4 per leg, min per config):
# dedup_cluster_resolution 3.39 → 1.10 s, corpus_prep_pipeline_lsh
# 19.2 → 7.05 s (a host-noisy day; the RATIO is the claim — the star
# rounds were ~2.3-3x of both queries' wall). Past the threshold
# the distributed path runs UNCHANGED (the 40×/100× corpus probes, at
# ~0.4-1M pairs, stay on star contraction). The probe is a
# limit(n+1).collect() — bounded for ANY input size — and component
# ids are the same min-id representatives (Python's str/int ordering
# agrees with Spark's UTF8_BINARY/numeric min), so results are
# bit-identical either way (tests/test_graph.py pins both paths).
DRIVER_RESOLVE_MAX_EDGES = 65536


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (lo, hi) with lo < hi, distinct.

    NULL endpoints are dropped (a NULL id cannot join to its
    neighborhood — keeping it would silently fragment clusters, the
    same policy as ``operators.sampling``: exclude NULL keys loudly in
    the contract rather than mislabel them).
    """
    lo, hi = F.least("src", "dst"), F.greatest("src", "dst")
    return (
        edges.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .select(lo.alias("src"), hi.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach every neighbor LARGER than u to u's min neighborhood id.

    Large-Star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u),
    v > u. One symmetrize + one groupBy shuffle + one join (the join
    key equals the groupBy key, so the exchange is reused).
    """
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    m = F.least(F.col("mn"), F.col("src"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), m.alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Attach every neighbor ≤ u (and u itself) to the min of them.

    Operates on the (hi → lo) orientation: for node u with smaller
    neighbors N(u), m = min(N(u)); emit (v, m) for v ∈ N(u) \\ {m}
    plus (u, m).
    """
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    mins = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    attach_nbrs = (
        oriented.join(mins, "src")
        .filter(F.col("dst") != F.col("mn"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    )
    attach_self = mins.select("src", F.col("mn").alias("dst"))
    return attach_nbrs.union(attach_self).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """(count, order/orientation-independent content hash) of an edge set."""
    # bit_xor, not sum: order-independent like sum but cannot overflow
    # under ANSI arithmetic (the edge set is distinct, so xor never
    # self-cancels a duplicate).
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.bit_xor(
                F.xxhash64(
                    F.least("src", "dst").cast("string"),
                    F.greatest("src", "dst").cast("string"),
                )
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_resolve(edges: DataFrame, rows: list, stats: dict | None) -> DataFrame:
    """Union-find over a BOUNDED collected edge list (≤ the driver
    threshold, see ``DRIVER_RESOLVE_MAX_EDGES``); same output contract
    as the distributed path: (id, component-min) for every node with
    an edge, component = min id (path-halving find, min-root union)."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root: the final representative IS the
            # component min, matching the star-contraction fixed point
            # (Python's int/str ordering == Spark's numeric/
            # UTF8_BINARY min: UTF-8 byte order preserves code points)
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = [(n, find(n)) for n in parent]
    out.sort()
    if stats is not None:
        stats["rounds"] = 0
        stats["driver_edges"] = len(rows)
    schema = StructType(
        [
            StructField("id", edges.schema["src"].dataType),
            StructField("component", edges.schema["dst"].dataType),
        ]
    )
    return edges.sparkSession.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = _MAX_ROUNDS,
    stats: dict | None = None,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Resolve an undirected pair graph into components.

    Returns ``(id, component)`` for every node that appears in at
    least one edge, where ``component`` is the MINIMUM id in the
    node's connected component (so representatives map to themselves).
    Nodes with no edges are absent — callers that need total coverage
    left-join and ``coalesce(component, id)``.

    Ids may be any orderable Spark type (long, string, …); the min-id
    representative is deterministic across runs and cluster layouts.

    ``stats`` (optional dict) receives ``{"rounds": N}`` — the number
    of large+small star rounds run including the final no-change
    confirmation round (probe/telemetry hook); the driver-resolved
    path reports ``{"rounds": 0, "driver_edges": n}``.

    ``driver_max_edges`` overrides ``DRIVER_RESOLVE_MAX_EDGES`` (0
    forces the distributed path — tests/probes pin it to exercise the
    star rounds regardless of input size).
    """
    # Checkpoint the canonical edge set ONCE at entry: the checksum,
    # the symmetrize-union (which references edges twice), and round 1
    # would otherwise each re-evaluate the caller's pair pipeline —
    # for near-dup inputs that is the expensive Jaccard/LSH verify
    # join, measured 3 redundant executions before the first round's
    # checkpoint cut lineage.
    edges = _canon(
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)
    limit = DRIVER_RESOLVE_MAX_EDGES if driver_max_edges is None else driver_max_edges
    if limit > 0:
        # bounded probe: ≤ limit+1 rows collected for ANY input size.
        # If the probe came back under the limit it IS the whole edge
        # set — resolve on the driver (guide §1.2: remove the rounds'
        # shuffles outright when the data is provably tiny).
        probe = edges.limit(limit + 1).collect()
        if len(probe) <= limit:
            return _driver_resolve(edges, probe, stats)
    prev = _checksum(edges)
    if prev[0] == 0:
        if stats is not None:
            stats["rounds"] = 0
        return edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    for rounds in range(1, max_rounds + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    # Fixed point of both stars = per-component star centered at the
    # min id: every remaining edge is (node, component-min).
    members = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    reps = edges.select(F.col("dst").alias("id"), F.col("dst").alias("component")).distinct()
    return members.union(reps)


def keep_one_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop all but the min-id representative of every near-dup cluster.

    The keep-one policy of arXiv:2107.06499 §4: resolve the match
    graph into components, keep one member each. Returns ``docs``
    minus non-representatives — schema unchanged, untouched docs
    (no edges) always survive.

    Scale: the non-representative set is ≪ |docs| (it IS the dedup
    savings), so AQE broadcasts it into the anti-join — no shuffle of
    the full corpus.
    """
    comp = connected_components(pairs, src, dst)
    non_reps = comp.filter(F.col("id") != F.col("component")).select("id")
    return docs.join(non_reps, docs[id_col] == non_reps["id"], "left_anti")
