"""Scale stress for the graph family: exact-integer PageRank at 1×/3×/10×
the edge count on a skewed synthetic graph.

Graph shape: in-degree follows a power-ish law (destination drawn as
n·x³ for uniform x), so a few nodes absorb a large share of all edges —
the celebrity-hub regime. PageRank's per-round shape is join-on-src +
groupBy-dst; both carry map-side partial aggregation, so a hot DESTINATION
combines per input partition before the shuffle and the wall ratio should
track the edge count ~linearly (the contrast case is components.py, whose
per-node window minima needed an explicit skew path).

Printed at the end: wall(k)/wall(1) vs k — ~k is linear, ~k² means a round
stopped scaling.

Usage: python tools/stress_graph.py [base_edges] [n_nodes_divisor]
  defaults: 2_000_000 edges at 1×, nodes = edges // 4
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = [1, 3, 10]
ITERS = 10


def main() -> None:
    base_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    div = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F  # noqa: N812

    from yanwenxian_week3_data_pipeline_spark.operators.pagerank import pagerank
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("stress_graph")
    spark.sparkContext.setLogLevel("ERROR")

    walls: dict[int, float] = {}
    for k in SCALES:
        n_edges = base_edges * k
        n_nodes = n_edges // div
        # distributed synthetic generation (no driver-side lists):
        # src uniform, dst ~ n·x³ for x uniform — heavy in-degree skew
        x = (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1 << 30)) / F.lit(
            float(1 << 30)
        ))
        edges = spark.range(n_edges).select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src"),
            F.floor(x * x * x * F.lit(float(n_nodes))).cast("long").alias("dst"),
        )
        t0 = time.time()
        pr = pagerank(edges, iters=ITERS)
        top = pr.orderBy(F.desc("rank_scaled"), F.asc("node")).limit(5).collect()
        walls[k] = time.time() - t0
        mass = pr.agg(F.sum("rank_scaled")).collect()[0][0]
        print(
            f"pagerank[{k}x]: {walls[k]:.1f}s edges={n_edges} nodes~{n_nodes} "
            f"iters={ITERS} mass={mass} top={[(r['node'], r['rank_scaled']) for r in top[:3]]}"
        )

    print("-- linearity (wall(k)/wall(1) vs k; ~k = linear)")
    w1 = walls[SCALES[0]]
    print("pagerank: " + " ".join(f"{k}x:{walls[k] / w1:.2f}" for k in SCALES))

    # triangle census + k-core on a UNIFORM random graph (degrees
    # concentrate around 2·edges/nodes, so the degree-ordered wedge count
    # grows ~linearly in m — the regime where exact counting is the right
    # tool; power-law graphs are fundamentally m^1.5 for triangles, the
    # documented escape hatch is hub-capping/sampling). k is set at the
    # mean degree so each k-core peel does real cascade work.
    from yanwenxian_week3_data_pipeline_spark.operators.graphstats import (
        kcore_summary,
        triangle_census,
    )

    tri_walls: dict[int, float] = {}
    core_walls: dict[int, float] = {}
    for k in SCALES:
        n_edges = base_edges * k
        n_nodes = n_edges // 8  # mean degree ~16, SF-invariant
        edges = (
            spark.range(n_edges)
            .select(
                F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_nodes)).alias("a"),
                F.pmod(F.xxhash64("id", F.lit(12)), F.lit(n_nodes)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        t0 = time.time()
        tri = triangle_census(edges).collect()[0]
        tri_walls[k] = time.time() - t0
        print(
            f"triangles[{k}x]: {tri_walls[k]:.1f}s edges={tri['n_edges']} "
            f"wedges={tri['n_wedges']} triangles={tri['n_triangles']}"
        )
        t0 = time.time()
        core = kcore_summary(edges, 16, 12).collect()[0]
        core_walls[k] = time.time() - t0
        print(
            f"kcore[{k}x]: {core_walls[k]:.1f}s core_nodes={core['n_core_nodes']} "
            f"core_edges={core['n_core_edges']} converged={core['converged']}"
        )

    t1, c1 = tri_walls[SCALES[0]], core_walls[SCALES[0]]
    print("triangles: " + " ".join(f"{k}x:{tri_walls[k] / t1:.2f}" for k in SCALES))
    print("kcore:     " + " ".join(f"{k}x:{core_walls[k] / c1:.2f}" for k in SCALES))

    # triangle census on SKEWED graphs at equal edge count — the regime the
    # uniform sweep can't see. Two shapes:
    #   hub:  one node on 30% of all edges (one part in 30% of orders) —
    #         degree-ordered orientation should absorb it (the hub's
    #         ORIENTED out-degree stays small);
    #   plaw: dst ~ n·x³ power-law (the pagerank generator, undirected) —
    #         many mid-degree nodes, the Θ(Σ C(d_out,2)) wedge blow-up.
    # Each runs exact AND hub-capped (cap=64 ⇒ wedge stage ≤ 32·m rows on
    # any distribution); the gate is capped-skewed within ~2× of the
    # uniform wall at equal edges, with the dropped-wedge bound in-band.
    HUB_CAP = 64
    k = SCALES[0]
    n_edges = base_edges * k
    uniform_wall = tri_walls[k]

    def undirected(df):
        return (
            df.where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    n_nodes = n_edges // 8
    hub_n = n_edges * 3 // 10
    hub = undirected(
        spark.range(hub_n)
        .select(F.lit(0).alias("a"), (F.pmod(F.xxhash64("id", F.lit(21)), F.lit(n_nodes - 1)) + 1).alias("b"))
        .unionAll(
            spark.range(n_edges - hub_n).select(
                F.pmod(F.xxhash64("id", F.lit(22)), F.lit(n_nodes)).alias("a"),
                F.pmod(F.xxhash64("id", F.lit(23)), F.lit(n_nodes)).alias("b"),
            )
        )
    )
    x = F.pmod(F.xxhash64("id", F.lit(31)), F.lit(1 << 30)) / F.lit(float(1 << 30))
    plaw = undirected(
        spark.range(n_edges).select(
            F.pmod(F.xxhash64("id", F.lit(32)), F.lit(n_nodes)).alias("a"),
            F.floor(x * x * x * F.lit(float(n_nodes))).cast("long").alias("b"),
        )
    )
    for name, g in [("hub", hub), ("plaw", plaw)]:
        for cap in [None, HUB_CAP]:
            t0 = time.time()
            r = triangle_census(g, hub_cap=cap).collect()[0]
            wall = time.time() - t0
            tag = f"cap={cap}" if cap else "exact"
            print(
                f"triangles[{name},{tag}]: {wall:.1f}s ({wall / uniform_wall:.2f}x of"
                f" uniform-1x) edges={r['n_edges']} wedges={r['n_wedges']}"
                f" triangles={r['n_triangles']} dropped={r['n_wedges_dropped']}"
            )


if __name__ == "__main__":
    main()
