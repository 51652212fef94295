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


def star_contraction(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> tuple[DataFrame, int]:
    """Run alternating large-star/small-star to fixpoint; return
    ``((node, comp) labels, rounds_to_fixpoint)``. Every node appearing in
    ``edges`` (including self-loop-only nodes) is labeled; isolated nodes
    (absent from ``edges``) are absent — callers coalesce to the node id."""
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
    w_u = W.partitionBy("u")
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: m(u) = min(Γ(u) ∪ {u}); larger neighbors re-attach to
        # m. The per-node minimum comes from a WINDOW over the u-partition
        # (one shuffle), not a groupBy + re-join (two); and both small-star
        # outputs are emitted from ONE pass over the large-star stream (an
        # exploded 2-struct array), so the round is a single linear
        # pipeline with exactly one checkpoint materialization — round
        # wall-time is dominated by serial job count on small graphs.
        sym = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            sym.withColumn("m", F.least(F.min("v").over(w_u), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the large-star output (still oriented u > v):
        # m(u) = min of u's smaller neighbors; they and u collapse onto m
        small = (
            large.withColumn("m", F.min("v").over(w_u))
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
            break
        prev_fp = fp
    else:
        log.warning("star_contraction: no fixpoint within %d rounds", max_iter)

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
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id in the node's connected component. Isolated nodes
    (absent from ``edges``) are absent from the result — callers coalesce
    to the node's own id."""
    labels, rounds = star_contraction(edges, src, dst, max_iter)
    log.info("connected_components: fixpoint after %d star rounds", rounds)
    return labels
