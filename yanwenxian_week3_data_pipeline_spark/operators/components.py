"""Connected components over a pair table — the step that turns near-dup
PAIRS into dedup CLUSTERS.

LSH emits pairs; production dedup needs "which documents form one duplicate
group, and which single one do we keep". That's connected components on the
pair graph with the canonical representative = min id per component.

Algorithm: alternating **large-star / small-star** contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
adversary-proof choice. Naive min-label propagation needs as many rounds as
the longest hop distance to the component minimum, so a 200-node chain
silently exceeds any fixed round cap; star contraction halves component
diameters every round and converges in **O(log n) rounds on any graph
shape** (a 1M-node path needs ~20 rounds, not 1M).

Per round, on edges oriented larger-endpoint-first ``(u, v), u > v``:

    large-star:  for each u, m = min(Γ(u) ∪ {u});
                 every neighbor v > u re-attaches as (v, m)
    small-star:  for each u, m = min of its smaller neighbors;
                 (x, m) for x ∈ smaller-neighbors ∪ {u}, x ≠ m

Each phase computes its per-node minimum with a WINDOW over the node
partition — one shuffle, where a groupBy + re-join would pay two — and the
small-star phase emits both of its output families (re-attached smaller
neighbors and the center's own root edge) from a single exploded pass, so
one round is one linear pipeline with exactly one materialization.

**Hub skew**: the window serializes all of Γ(u) into the single task that
owns u's partition slice — fatal for a celebrity node (boilerplate pages in
real near-dup graphs have 10⁶⁺ neighbors), and star contraction *creates*
such nodes itself: the root of a large component accumulates the whole
component as neighbors in the closing rounds. Each phase therefore samples
the u-column first (2 % Bernoulli, one cheap column-pruned job, gated on
the edge count already known from the previous round's fingerprint) and
routes detected hot keys down a skew path: per-hot-key minima via
groupBy+min (map-side PARTIAL aggregation — the hub contributes ≤1 row per
input partition to that shuffle) broadcast back onto the hub's rows, so the
hub's edge list never shuffles on u at all; only the cold remainder goes
through the window. Both paths produce identical minima, so plan choice
cannot affect results (pinned by tests at both routes). The hot set is
count-bounded: keys above ``total/256`` rows number ≤256, so the broadcast
is always tiny. Detection is gated on a high absolute floor because the
skew route costs ~4 extra scans per phase — a pure loss on a single box
(see the HUB_MIN_ROWS note below for the measured crossover economics);
it exists for the multi-node regime, where the serialized hub partition
means idle executors and partition-outgrows-memory risk, not a slightly
slower local sort.
Fixpoint = the edge set is a star forest rooted at each component's min;
detected by an (edge-count, hash-sum) fingerprint — one lightweight action
per round, with the hash summed in DECIMAL(38,0) so a billion-edge
fingerprint cannot overflow a long.

Scale notes: each round's edge frame is cut to an EAGER LOCAL CHECKPOINT,
not merely persisted — a persisted frame still carries its full logical
plan, and one star round references its input ~a dozen times (symmetrize,
min-join, re-orient), so plan size would grow exponentially with rounds
and OOM the driver during analysis long before the data does. The
checkpoint restarts every round from an ExistingRDD scan (constant-size
plan, lineage depth 1); checkpoint blocks are reference-counted and freed
by the ContextCleaner. Self-loops are dropped up front (a node whose only
edges are self-loops is still labeled, via the node-set left join at the
end).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W
from pyspark.storagelevel import StorageLevel

log = logging.getLogger(__name__)

# a u-key qualifies as a hub when its estimated row count exceeds
# max(HUB_MIN_ROWS, total_edges // HUB_SHARE_DIV): the share divisor bounds
# the hot set at HUB_SHARE_DIV keys (shares sum to 1). The absolute floor
# is deliberately high: measured on local[32] (tools/stress_dedup.py
# cc_hub), the window path BEATS the skew path even at a 4.2M-neighbor hub
# (77 s vs 132 s — a single-box sort is memory-bandwidth-bound, so one
# task sorting 8M longs costs less than the skew route's extra
# sample/broadcast/anti-join scans). The skew path pays off only
# multi-node, where the hub partition means one EXECUTOR network-fetches
# and sorts the whole neighbor list while the rest of the cluster idles
# and the partition can outgrow executor memory; the floor marks where
# that partition reaches the hundreds-of-MB regime (~4M × 16 B ≈ 67 MB of
# raw longs, several× that as sort rows) rather than where local wall-time
# crosses (it never does on one box).
HUB_MIN_ROWS = 1 << 22
HUB_SHARE_DIV = 256
_HUB_SAMPLE_FRACTION = 0.02


def _attach_group_min(
    df: DataFrame,
    total_rows: int | None,
    hub_min_rows: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Return ``df`` (columns ``u``, ``v``) with ``_wm`` = min(v) within
    each u-group, choosing per detected hot key between the one-shuffle
    window and the skew path (partial-agg groupBy min broadcast back onto
    the hub's unshuffled rows). ``total_rows`` is the caller's known edge
    count (from the previous fingerprint) — detection is skipped when it
    is below the hub threshold, so small graphs pay zero extra jobs."""
    w_u = W.partitionBy("u")
    thresh = hub_min_rows
    if thresh is None:
        thresh = (
            max(HUB_MIN_ROWS, total_rows // HUB_SHARE_DIV)
            if total_rows is not None
            else HUB_MIN_ROWS
        )
    if total_rows is None or total_rows < thresh:
        return df.withColumn("_wm", F.min("v").over(w_u))
    sample_cut = max(2, int(thresh * _HUB_SAMPLE_FRACTION))
    hot = [
        r["u"]
        for r in df.select("u")
        .sample(fraction=_HUB_SAMPLE_FRACTION, seed=seed)
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= sample_cut)
        .collect()
    ]
    if not hot:
        return df.withColumn("_wm", F.min("v").over(w_u))
    log.info("star_contraction: hub skew path for %d hot node(s)", len(hot))
    spark = df.sparkSession
    hot_df = spark.createDataFrame([(k,) for k in hot], df.select("u").schema)
    # inner-join against the broadcast min table doubles as the hot filter;
    # the hub's rows keep their natural partitioning throughout
    hot_mins = (
        df.join(F.broadcast(hot_df), "u").groupBy("u").agg(F.min("v").alias("_wm"))
    )
    hot_part = df.join(F.broadcast(hot_mins), "u")
    cold = df.join(F.broadcast(hot_df), "u", "left_anti").withColumn(
        "_wm", F.min("v").over(w_u)
    )
    return cold.unionByName(hot_part.select(*cold.columns))


def star_contraction(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
    hub_min_rows: int | None = None,
    strict: bool = True,
) -> tuple[DataFrame, int]:
    """Run alternating large-star/small-star to fixpoint; return
    ``((node, comp) labels, rounds_to_fixpoint)``. Every node appearing in
    ``edges`` (including self-loop-only nodes) is labeled; isolated nodes
    (absent from ``edges``) are absent — callers coalesce to the node id.

    ``strict=True`` (the default) raises ``RuntimeError`` if no fixpoint is
    reached within ``max_iter`` rounds — downstream dedup silently consuming
    unconverged labels is worse than failing loudly. ``strict=False``
    restores the log-and-return behavior for exploratory use."""
    # checkpoint the raw pair stream ONCE up front: both the node set and
    # the oriented edge set derive from it, and the caller's edge lineage
    # is typically an expensive LSH pipeline — without the cut it would be
    # recomputed for each derivation (measured ~2× the pair-generation
    # cost on dedup_cc_clusters)
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes.count()

    cur = (
        e.where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp = _fingerprint(cur)
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        # large-star: m(u) = min(Γ(u) ∪ {u}); larger neighbors re-attach to
        # m. The per-node minimum normally comes from a WINDOW over the
        # u-partition (one shuffle, not groupBy + re-join's two); detected
        # hub nodes take the broadcast-agg skew path inside
        # _attach_group_min. Both small-star outputs are emitted from ONE
        # pass over the large-star stream (an exploded 2-struct array), so
        # the round is a single linear pipeline with exactly one checkpoint
        # materialization — round wall-time is dominated by serial job
        # count on small graphs.
        sym = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            _attach_group_min(sym, 2 * prev_fp[0], hub_min_rows)
            .withColumn("m", F.least(F.col("_wm"), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the large-star output (still oriented u > v):
        # m(u) = min of u's smaller neighbors; they and u collapse onto m.
        # Its input size is unknown without an extra action; the symmetrized
        # input bound (2×|cur|) is the right detection gate for it too —
        # large-star never grows the edge count beyond that.
        small = (
            _attach_group_min(large, 2 * prev_fp[0], hub_min_rows)
            .withColumn("m", F.col("_wm"))
            .select(
                F.explode(
                    F.array(
                        F.when(
                            F.col("v") != F.col("m"),
                            F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        ),
                        F.struct(F.col("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .where(F.col("e").isNotNull())
            .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        fp = _fingerprint(small)
        cur = small
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        # unconverged labels are silently-wrong dedup clusters downstream;
        # fail loudly by default (ADVICE r3)
        msg = f"star_contraction: no fixpoint within {max_iter} rounds"
        if strict:
            raise RuntimeError(msg)
        log.warning(msg)

    # at fixpoint each u carries exactly one edge (its root); the min-agg
    # keeps the labels well-formed (one row per node) even if max_iter cut
    # the loop short of fixpoint
    roots = (
        cur.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
    labels = (
        nodes.join(roots, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels.count()
    nodes.unpersist()
    return labels, rounds


def _fingerprint(edge_df: DataFrame) -> tuple:
    """(count, decimal hash-sum) of an edge set — cheap set-equality proxy
    for fixpoint detection. DECIMAL(38,0) accumulator: a sum of 64-bit
    hashes overflows BIGINT within a handful of rows."""
    r = edge_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(r["n"]), (None if r["h"] is None else int(r["h"]))


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
    hub_min_rows: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id in the node's connected component. Isolated nodes
    (absent from ``edges``) are absent from the result — callers coalesce
    to the node's own id. Raises if no fixpoint within ``max_iter`` (strict
    by contract: dedup callers must never consume unconverged labels)."""
    labels, rounds = star_contraction(edges, src, dst, max_iter, hub_min_rows)
    log.info("connected_components: fixpoint after %d star rounds", rounds)
    return labels
