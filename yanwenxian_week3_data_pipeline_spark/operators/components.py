"""Connected components over a pair table — the step that turns near-dup
PAIRS into dedup CLUSTERS.

LSH emits pairs; production dedup needs "which documents form one duplicate
group, and which single one do we keep". That's connected components on the
pair graph with the canonical representative = min id per component.

Algorithm: iterated min-label propagation, all in DataFrame ops:

    label(v) ← min(label(v), min_{(u,v)∈E} label(u))    until fixpoint

Each round is one shuffle join (edges ⋈ labels on the source endpoint) plus
one shuffle aggregate (min per node). Rounds needed = the longest hop
distance from any node to its component's minimum — for near-dup graphs
(small, near-clique clusters produced by LSH banding) this is 2-4 rounds.
For adversarial long-chain graphs the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) converges in O(log n) rounds with the same per-round shuffle cost;
swap it in if cluster diameters grow.

Scale notes: the labels frame is persisted each round (it feeds both the
next join and the convergence check) and the previous round is unpersisted;
lineage is truncated through the persist so 20 rounds don't build a
20-deep recompute tree. The convergence check is a count of changed labels
— one lightweight action per round, the standard price of an iterative
fixpoint on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


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
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)

    persisted = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    persisted.count()
    labels = persisted

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_persisted = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("_changed"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_changed = new_persisted.where(F.col("_changed")).count()
        persisted.unpersist()
        persisted = new_persisted
        labels = new_persisted.drop("_changed")
        if n_changed == 0:
            break
    sym.unpersist()
    return labels
