"""Triangle census and bounded-round k-core peel over an undirected edge
list (u < v, deduped). Factored from plans/graph_ext.py so the scale
stress (tools/stress_graph.py) can drive synthetic graphs through the
same code the registered queries use. See the plans module for the
per-query scale rationale; the operator-level contracts:

- ``triangle_census``: degree-ordered orientation (out-degree bounded by
  O(sqrt(m))), wedge enumeration at each out-neighborhood, one closure
  equi-join; each triangle counted once at its orientation-minimal apex.
  NOTE the fundamental cost: wedge count is Θ(Σ C(d_out, 2)) — near-
  linear on degree-concentrated graphs, but m^1.5-bounded on power-law
  graphs. ``hub_cap`` is the escape hatch (the DEDUP_MAX_BUCKET
  philosophy): wedges are enumerated only at apexes with out-degree ≤
  the cap, the dropped wedge count is computed EXACTLY from the skipped
  out-degrees (a per-node aggregate, never the wedges themselves) and
  reported in-band — ``capped=true`` + ``n_wedges_dropped`` flag
  ``n_triangles`` as a lower bound; with the default ``hub_cap=None``
  every column is exact and ``capped=false``/``n_wedges_dropped=0``.
- ``kcore_peel``: repeatedly drop nodes of degree < k (cap ``rounds``);
  per-round degree partial-agg + two semi-joins, eager localCheckpoint,
  (count, decimal-hash-sum) fingerprint for early exit and the in-band
  ``converged`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def triangle_census(edges: DataFrame, hub_cap: int | None = None) -> DataFrame:
    """One census row: n_nodes, n_edges, n_wedges, n_triangles,
    transitivity, capped, n_wedges_dropped. ``edges`` must be distinct
    with u < v; callers should materialize it (localCheckpoint) — it is
    traversed four times. With ``hub_cap`` set, apexes whose ORIENTED
    out-degree exceeds the cap contribute no wedges: the wedge stage is
    then bounded by m·cap/2 rows regardless of the degree distribution,
    n_triangles is a lower bound, and n_wedges_dropped reports exactly
    how many wedges (and hence at most how many triangles) were skipped."""
    deg = _degrees(edges)
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lt, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lt, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lt, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        )
    )
    if hub_cap is not None:
        # exact dropped-wedge accounting from the out-degree AGGREGATE
        # (Σ C(d_out, 2) over hot apexes — never the wedge rows); the
        # wedge self-join then runs only at apexes under the cap, so its
        # output is ≤ m·cap/2 rows on ANY degree distribution
        out_deg = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("dout"))
        hot = out_deg.where(F.col("dout") > hub_cap)
        dropped = hot.agg(
            F.coalesce(F.sum(F.expr("dout * (dout - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("n_wedges_dropped")
        )
        wedge_base = oriented.join(
            hot.select("src").hint("broadcast"), "src", "left_anti"
        )
    else:
        dropped = None
        wedge_base = oriented
    w1, w2 = wedge_base.alias("w1"), wedge_base.alias("w2")
    leg_lt = (F.col("w1.ddst") < F.col("w2.ddst")) | (
        (F.col("w1.ddst") == F.col("w2.ddst"))
        & (F.col("w1.dst") < F.col("w2.dst"))
    )
    wedges = (
        w1.join(w2, F.col("w1.src") == F.col("w2.src"))
        .where(F.col("w1.dst") < F.col("w2.dst"))
        .select(
            F.when(leg_lt, F.col("w1.dst")).otherwise(F.col("w2.dst")).alias("src"),
            F.when(leg_lt, F.col("w2.dst")).otherwise(F.col("w1.dst")).alias("dst"),
        )
    )
    n_tri = wedges.join(
        oriented.select("src", "dst"), ["src", "dst"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    out = (
        n_nodes.crossJoin(n_edges)
        .crossJoin(n_wedges)
        .crossJoin(n_tri)
    )
    if dropped is not None:
        out = out.crossJoin(dropped)
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            (F.col("n_triangles") * 3).cast("double")
            / F.col("n_wedges").cast("double"),
        ).alias("transitivity"),
        F.lit(hub_cap is not None).alias("capped"),
        (
            F.col("n_wedges_dropped") if dropped is not None else F.lit(0).cast("long")
        ).alias("n_wedges_dropped"),
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # hash summed in DECIMAL(38,0) so a billion-edge fingerprint cannot
    # overflow a long (the components.py discipline)
    row = edges.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.coalesce(
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")),
            F.lit(0),
        ).alias("hs"),
    ).collect()[0]
    return int(row["cnt"]), int(row["hs"])


def kcore_peel(
    edges: DataFrame, k: int, rounds: int
) -> tuple[DataFrame, bool]:
    """Peel to the k-core under a round cap. Returns (core_edges,
    converged); ``converged`` is True iff two consecutive rounds had the
    same (count, hash-sum) fingerprint within the cap."""
    edges = edges.localCheckpoint(eager=True)
    prev_fp = _fingerprint(edges)
    converged = False
    for _ in range(rounds):
        alive = _degrees(edges).where(F.col("d") >= k).select("n")
        edges = (
            edges.join(alive.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(alive.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        fp = _fingerprint(edges)
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    return edges, converged


def kcore_summary(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    core, converged = kcore_peel(edges, k, rounds)
    deg = _degrees(core)
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_core_nodes"),
        F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("deg_sum"),
    )
    return summary.select(
        F.lit(k).alias("k"),
        "n_core_nodes",
        (F.col("deg_sum") / 2).cast("long").alias("n_core_edges"),
        F.lit(converged).alias("converged"),
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    broadcast_max_nodes: int | None = None,
) -> DataFrame:
    """(node, community) after ``rounds`` SYNCHRONOUS label-propagation
    updates over an undirected edge list (``u``/``v`` columns, any
    direction, parallels tolerated) — community detection (Raghavan et
    al. 2007, arXiv:0709.2938) next to components.py's connectivity:
    LPA finds DENSITY communities inside one connected component.

    Determinism contract (the pagerank.py discipline): classic LPA is
    run-order dependent (asynchronous updates, random tie-breaks); this
    implementation is the synchronous variant with a TOTAL-ORDER
    tie-break — each node adopts the neighbor label with the highest
    count, ties to the SMALLEST label — so every round is a pure
    function of the previous frame and the result is bit-identical
    across partitionings and engines. Labels start as node ids.

    Scale shape: the symmetrized edge table is built once,
    hash-partitioned on dst (the update key) and checkpointed. Per
    round: one broadcast of the N-row label frame into the edge join
    (same node-count gate as pagerank's PR_BROADCAST_MAX_NODES, same
    shuffle fallback beyond it — the label side then reshuffles and the
    edges are re-cut to src once), one map-side-combining (dst, label)
    count, and a map-side-combinable struct argmax (the
    docs_best_of_cluster pattern — never a within-group sort); eager
    per-round checkpoint keeps lineage flat. Synchronous LPA on a fixed
    round budget is exactly how you bound it at 100 TB — the
    components.py / kcore discipline."""
    from .pagerank import PR_BROADCAST_MAX_NODES

    e = edges.select(
        F.col("u").cast("long").alias("s"), F.col("v").cast("long").alias("d")
    )
    und = e.union(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()
    ed = und.repartition("d").localCheckpoint(eager=True)
    labels = (
        ed.select(F.col("d").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lb"))
        .localCheckpoint(eager=True)
    )
    cap = PR_BROADCAST_MAX_NODES if broadcast_max_nodes is None else broadcast_max_nodes
    bcast = labels.count() <= cap
    if not bcast:
        ed = ed.repartition("s").localCheckpoint(eager=True)

    for _ in range(rounds):
        lside = labels
        if bcast:
            lside = F.broadcast(lside)
        cnt = (
            ed.join(lside, ed["s"] == lside["node"])
            .groupBy("d", "lb")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.groupBy("d")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lb")).alias("nl"))).alias("m"))
            .select(F.col("d").alias("node"), (-F.col("m.nl")).cast("long").alias("lb"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lb").alias("community"))


def label_propagation_oracle_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB replay of the identical synchronous recurrence, rounds
    unrolled as MATERIALIZED CTEs (the pagerank_oracle_sql discipline).
    ``edges_sql`` must yield columns ``u, v``; the argmax is replayed as
    a row_number over (count DESC, label ASC) — the same total order the
    Spark struct-argmax encodes. Yields (node, community)."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT u, v FROM ({edges_sql})),",
        "e AS MATERIALIZED (SELECT u AS s, v AS d FROM e0"
        " UNION SELECT v AS s, u AS d FROM e0),",
        "l0 AS MATERIALIZED (SELECT DISTINCT d AS node, d AS lb FROM e),",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT node, lb FROM (
    SELECT node, lb, row_number() OVER (PARTITION BY node
      ORDER BY c DESC, lb ASC) AS rn
    FROM (SELECT e.d AS node, l.lb AS lb, count(*) AS c
          FROM e JOIN l{p} l ON l.node = e.s GROUP BY 1, 2))
  WHERE rn = 1),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, CAST(lb AS BIGINT) AS community FROM l{rounds}")
    return "\n".join(parts)


def link_prediction_jaccard(
    edges: DataFrame, hub_cap: int, topk: int
) -> DataFrame:
    """Top-``topk`` predicted links (u < v, common_neighbors, jaccard)
    among 2-hop non-adjacent pairs of an undirected graph, scored by
    neighbor-set Jaccard — the classic structural link-prediction /
    item-recommendation baseline (Liben-Nowell & Kleinberg 2003).

    Semantics under the cap: wedges are enumerated only at apexes whose
    degree is ≤ ``hub_cap`` (the triangle_census escape hatch — the pair
    stage is then ≤ m·cap rows on any degree distribution), so
    ``common_neighbors`` counts common neighbors OF DEGREE ≤ cap. The
    oracle replays the identical cap, so the capped score is exact and
    engine-agreed, not an unquantified approximation; Jaccard divides by
    the FULL degrees (exact), keeping scores comparable across pairs.

    ``edges`` must be distinct with u < v. Shape: one symmetrize pass,
    one degree aggregate broadcast back, a cap-filtered wedge self-join
    (the only stage that can grow — bounded by m·cap), a pair count with
    map-side combine, an anti-join against the edge list, and TakeOrdered.
    """
    deg = _degrees(edges)
    adj = edges.select(F.col("u").alias("apex"), F.col("v").alias("nb")).unionAll(
        edges.select(F.col("v").alias("apex"), F.col("u").alias("nb"))
    )
    da = deg.select(F.col("n").alias("apex"), F.col("d").alias("dapex"))
    capped = adj.join(F.broadcast(da), "apex").where(F.col("dapex") <= hub_cap)
    a, b = capped.alias("a"), capped.alias("b")
    wedges = a.join(
        b,
        (F.col("a.apex") == F.col("b.apex")) & (F.col("a.nb") < F.col("b.nb")),
    ).select(F.col("a.nb").alias("u"), F.col("b.nb").alias("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors")
    )
    cand = pairs.join(edges, ["u", "v"], "left_anti")
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    scored = (
        cand.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("du") + F.col("dv") - F.col("common_neighbors")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(topk)


def link_prediction_oracle_sql(edges_sql: str, hub_cap: int, topk: int) -> str:
    """DuckDB twin of :func:`link_prediction_jaccard` (identical cap,
    identical exact-int Jaccard). ``edges_sql`` must yield u < v."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
adj AS (SELECT u AS apex, v AS nb FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT apex AS n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
capped AS (SELECT adj.* FROM adj JOIN deg ON deg.n = adj.apex
           WHERE deg.d <= {hub_cap}),
pairs AS (SELECT a.nb AS u, b.nb AS v, CAST(count(*) AS BIGINT) AS common_neighbors
          FROM capped a JOIN capped b
            ON a.apex = b.apex AND a.nb < b.nb
          GROUP BY 1, 2),
cand AS (SELECT pairs.* FROM pairs ANTI JOIN e USING (u, v)),
scored AS (SELECT cand.u, cand.v, common_neighbors,
             round(common_neighbors
                   / CAST(du.d + dv.d - common_neighbors AS DOUBLE), 6) AS jaccard
           FROM cand JOIN deg du ON du.n = cand.u JOIN deg dv ON dv.n = cand.v)
SELECT * FROM scored ORDER BY jaccard DESC, u ASC, v ASC LIMIT {topk}
"""


def bfs_distances(
    edges: DataFrame, seed: int, rounds: int
) -> DataFrame:
    """(dist, n_nodes): the unweighted-shortest-path distance histogram
    from ``seed`` over an undirected edge list (``u``/``v`` columns),
    frontier-expanded for a FIXED ``rounds`` budget (the kcore/pagerank
    discipline — at 100 TB you bound iterative rounds; small-world
    graphs saturate in a handful). Exact by construction: frontier sets
    and distances are integers, set algebra has no ties to break.

    Scale shape: the symmetrized edge table is built once, partitioned
    on src and checkpointed; each round is one frontier equi-join on
    that partitioning + one distinct + one left-anti join against the
    visited set (both shuffles on node keys, map-side combinable);
    visited/frontier are checkpointed per round so lineage stays flat.
    The output is (rounds+1)-bounded."""
    e = edges.select(
        F.col("u").cast("long").alias("s"), F.col("v").cast("long").alias("d")
    )
    und = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .repartition("s")
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(int(seed), 0)], "node long, dist int"
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for r in range(1, rounds + 1):
        nxt = (
            und.join(frontier.withColumnsRenamed({"node": "s"}), "s")
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(r))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return (
        visited.groupBy("dist")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.col("dist").cast("int").alias("dist"), "n_nodes")
    )


def bfs_oracle_sql(edges_sql: str, seed_sql: str, rounds: int) -> str:
    """DuckDB replay of the identical bounded BFS, rounds unrolled as
    MATERIALIZED CTEs. ``edges_sql`` yields u, v; ``seed_sql`` yields one
    row with a ``node`` column."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT u, v FROM ({edges_sql})),",
        "e AS MATERIALIZED (SELECT u AS s, v AS d FROM e0"
        " UNION SELECT v AS s, u AS d FROM e0),",
        f"v0 AS MATERIALIZED (SELECT CAST(node AS BIGINT) AS node,"
        f" 0 AS dist FROM ({seed_sql})),",
        "f0 AS MATERIALIZED (SELECT node FROM v0),",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""n{r} AS MATERIALIZED (
  SELECT DISTINCT e.d AS node, {r} AS dist
  FROM e JOIN f{p} ON e.s = f{p}.node
  WHERE e.d NOT IN (SELECT node FROM v{p})),
v{r} AS MATERIALIZED (SELECT * FROM v{p} UNION ALL SELECT * FROM n{r}),
f{r} AS MATERIALIZED (SELECT node FROM n{r}),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT CAST(dist AS INT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes"
        f" FROM v{rounds} GROUP BY dist"
    )
    return "\n".join(parts)
