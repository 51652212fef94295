"""PageRank over an edge table — exact scaled-integer power iteration.

Why another graph operator (components.py already exists): connected
components answers "which docs form one duplicate group"; PageRank answers
"which node *matters*" — the standard centrality prior for corpus curation
(rank-weighted sampling of crawl graphs, boilerplate-hub demotion, seed-set
expansion). The reference has no graph surface at all, so like the LSH
family this is EXT scope, built Spark-first.

Determinism contract
--------------------
Classic float PageRank cannot be oracled cross-engine: double sums are
partial-order dependent, so Spark's parallel reduction and DuckDB's serial
one drift in the last ulp and the drift compounds per iteration. This
implementation runs the whole recurrence in **scaled 64-bit integers**
(total mass ``MASS = 10^15``), with floor division everywhere:

    deg(u)   = out-degree of u
    r0(u)    = MASS div N
    contrib  = r(u) div deg(u)              per edge (u, v)
    dangling = sum r(u) over deg(u) = 0
    r'(v)    = (15·MASS div 100) div N
             + 85·( incoming(v) + dangling div N ) div 100

Every operation is exact integer arithmetic on non-negative values, so the
result is BIT-IDENTICAL regardless of partitioning, reduction order, or
engine — the DuckDB oracle replays the same recurrence with ``//``. Sums
stay far inside BIGINT range (total mass 10^15; the 85· step peaks below
9·10^16). The final ``rank`` column divides the exact integer by the float
literal 1e15 — one IEEE division of exactly-representable operands, bit
-equal on both engines (the dec_as_double discipline).

Scale shape (100 TB)
--------------------
Two physical shapes behind one recurrence, gated on the node count
(measured during setup anyway):

- **Broadcast shape** (N ≤ PR_BROADCAST_MAX_NODES — vertex state fits in
  one task's memory): the degree-annotated edge table is built once,
  hash-partitioned on **dst** — the aggregation key — and checkpointed.
  Each round broadcasts the N-row rank frame into the edge join and the
  per-dst sums then ride the edges' own partitioning: **no |E|-sized
  shuffle per round at all**, only two N-row broadcasts. Measured r6 at
  sf0.1 (16 k nodes / 587 k edges): 0.55 s/round → ~0.26 s/round,
  bit-identical ranks.
- **Shuffle shape** (huge N): edges hash-partitioned on src and
  checkpointed; each round reshuffles only the N-row rank side to the
  src partitioning and the contribution stream to the dst partitioning,
  both with map-side partial aggregation; a high in-degree hub combines
  per-partition before the shuffle (no single-task sort — the skew
  failure mode components.py guards against does not arise here).
- Seed/dangling membership is carried as two boolean columns INSIDE the
  rank frame, so the dangling-mass scalar is a column filter over the
  checkpointed N-row frame — no per-round anti-join or flag join.
- The dangling-mass scalar is a 1-row aggregate cross-joined back
  (BroadcastNestedLoopJoin over exactly one row — the sanctioned scalar
  class, same as docs_unigram_logprob).
- Each round ends in ``localCheckpoint(eager=True)``: one star round
  references its input several times and iterative lineage otherwise grows
  exponentially (the components.py lesson).
- Fixed iteration count (the web-graph standard; Brin & Page report ~50
  iterations for 322M links, and rank ORDER stabilizes far earlier) — no
  data-dependent convergence actions beyond the per-round checkpoint job.
  Exact-fixed-point early exit was measured (r6) and REJECTED: the floor
  divisions keep every node's low-order digits wobbling — 14 rounds at
  sf0.01 and sf0.1 never produced two identical consecutive frames, so
  the check would be pure per-round overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MASS = 10**15
DAMP_NUM = 85
DAMP_DEN = 100
# Broadcast the N-row rank frame into the per-round edge join while the
# vertex state is small enough; beyond that, fall back to the shuffle
# shape. Both shapes are bit-identical (pinned by the forced-shape parity
# tests in tests/test_pagerank.py), so the cap is purely a safety margin.
# Sizing (r7, was 5M): a BroadcastHashJoin relation costs several times
# the raw row width — UnsafeRow framing plus the LongHashedRelation /
# BytesToBytesMap overhead puts a 2-long row nearer ~150 B than ~40 B —
# and it is held on the driver AND every executor, with each of the
# ``iters`` rounds creating two fresh broadcasts that are reclaimed only
# by GC/ContextCleaner, so several can be live at once. 1M nodes ≈
# 150 MB per relation keeps worst-case live broadcast memory comfortably
# inside executor headroom; past that the per-round |rank| shuffle the
# fallback pays is cheap relative to vertex state that size anyway.
PR_BROADCAST_MAX_NODES = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    seeds: DataFrame | None = None,
    broadcast_max_nodes: int | None = None,
    rounds_per_checkpoint: int = 1,
) -> DataFrame:
    """Exact integer PageRank; returns ``(node, rank_scaled, rank)`` for
    every node appearing in ``edges`` (either endpoint). ``rank_scaled`` is
    the bit-exact integer (sums to ~MASS up to floor losses), ``rank`` the
    single-division double. Parallel edges are collapsed (edge SET
    semantics); self-loops count as ordinary edges.

    ``seeds`` (one ``node`` column) switches to PERSONALIZED PageRank:
    teleport and dangling mass flow only to the seed set (restricted to
    nodes present in the graph), so ranks measure proximity to the seeds —
    the random-walk-with-restart primitive behind seed-set expansion and
    segment-personalized recommendation. Identical integer discipline:
    base and dangling shares divide by |seeds| instead of N and land only
    on seed rows.

    ``broadcast_max_nodes`` overrides :data:`PR_BROADCAST_MAX_NODES` — the
    physical-shape gate only (0 forces the shuffle shape); results are
    bit-identical either way (tests/test_pagerank.py pins the parity).

    ``rounds_per_checkpoint`` fuses that many recurrence rounds into one
    plan per eager checkpoint (a physical knob only — the recurrence and
    its bit-exact results are unchanged for any value; parity pinned by
    tests/test_pagerank.py). To make fusion viable at all, the flag side
    of each round reads the static ``flagged`` checkpoint instead of the
    previous rank frame — identical rows, but an unfused round then
    references its predecessor only TWICE (dangling aggregate + rank
    side), and both references share the predecessor's groupBy(d)
    shuffle, which ReuseExchange dedupes. Without that change a fused
    round re-executed its predecessor three times."""
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    ).distinct()

    # Degree-annotated edges checkpointed FIRST; the node/flag frame then
    # derives from the checkpoint, so the raw edge pipeline (source join +
    # distinct + degree) runs exactly once — deriving nodes and edges
    # independently re-ran it twice (measured r6: 2 × 1.9 s of a 7.5 s
    # warm wall at sf0.1). Degree is a COUNT WINDOW over src (r8 setup
    # rework: the groupBy(s)+join form A/B'd slower — setup warm median
    # 2.205 → 1.825 s at sf0.1 with the fused flags below, identical ed
    # rows — the window rides the same to-src exchange and drops the
    # aggregate build + join probe). Caveat recorded: the window puts ALL
    # of one src's edges in a single task, so a graph with an extreme
    # out-degree hub (≫10⁷ edges from one node) should flip back to the
    # map-side-combining groupBy+broadcast-join form — a one-line switch.
    # Partitioned on dst optimistically (the broadcast shape's aggregation
    # key); the huge-N fallback below re-cuts to src, paying one extra |E|
    # shuffle only in the regime where per-round costs dwarf it.
    from pyspark.sql.window import Window

    ed = (
        e.withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .repartition("d")
        .localCheckpoint(eager=True)
    )

    # One flags frame carried THROUGH the rank state: is_seed (teleport
    # target) and is_dang (no out-edges) — per round, both are column
    # filters on the checkpointed frame instead of joins against separate
    # node sets. Built in ONE union+aggregate pass (r8: the former
    # union-distinct + second distinct + left join re-read ed three
    # times; max(_has) over the tagged endpoint stream yields the same
    # (node, has-out) table in a single map-side-combining shuffle).
    flagged = (
        ed.select(F.col("s").alias("node"), F.lit(True).alias("_has"))
        .union(ed.select(F.col("d").alias("node"), F.lit(False).alias("_has")))
        .groupBy("node")
        .agg(F.max("_has").alias("_has"))
    )
    if seeds is not None:
        flagged = flagged.join(
            seeds.select(F.col("node").cast("long").alias("node"))
            .distinct()
            .withColumn("_seed", F.lit(True)),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce("_seed", F.lit(False)).alias("is_seed"),
            (~F.col("_has")).alias("is_dang"),
        )
    else:
        flagged = flagged.select(
            "node",
            F.lit(True).alias("is_seed"),
            (~F.col("_has")).alias("is_dang"),
        )
    flagged = flagged.localCheckpoint(eager=True)
    n = flagged.count()
    # teleport-population size: N classically, |seeds ∩ nodes| personalized
    tp = flagged.where("is_seed").count() if seeds is not None else n
    if tp == 0:
        raise ValueError("personalized pagerank: no seed appears in the graph")

    # physical shape gate (module docstring): broadcast the rank frame
    # while vertex state is task-memory-sized, else shuffle it per round —
    # under the shuffle shape, re-cut the edges to the src partitioning
    # the per-round rank join reuses (only the N-row rank side moves)
    cap = PR_BROADCAST_MAX_NODES if broadcast_max_nodes is None else broadcast_max_nodes
    bcast = n <= cap
    if not bcast:
        ed = ed.repartition("s").localCheckpoint(eager=True)

    base = (MASS * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // tp
    seed_base = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
    rank = flagged.select(
        "node",
        "is_seed",
        "is_dang",
        F.when(F.col("is_seed"), F.lit(MASS // tp))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )

    done = 0
    while done < iters:
        group = min(max(rounds_per_checkpoint, 1), iters - done)
        for _ in range(group):
            dang = rank.where("is_dang").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
            )
            rside = rank.select("node", "r")
            if bcast:
                rside = F.broadcast(rside)
            incoming = (
                ed.join(rside, ed["s"] == rside["node"])
                .select("d", F.expr("r div deg").alias("c"))
                .groupBy("d")
                .agg(F.sum("c").cast("long").alias("inc"))
            )
            # flag side from the STATIC flagged checkpoint (same rows as
            # rank's flag columns) — see the fusion note in the docstring
            prev = flagged
            rank = (
                prev.join(
                    F.broadcast(incoming) if bcast else incoming,
                    prev["node"] == incoming["d"],
                    "left",
                )
                .crossJoin(dang)
                .select(
                    "node",
                    "is_seed",
                    "is_dang",
                    (
                        seed_base
                        + F.expr(
                            f"{DAMP_NUM} * (coalesce(inc, 0L)"
                            f" + (CASE WHEN is_seed THEN dm div {tp} ELSE 0 END))"
                            f" div {DAMP_DEN}"
                        )
                    ).cast("long").alias("r"),
                )
            )
        rank = rank.localCheckpoint(eager=True)
        done += group

    return rank.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(MASS))).alias("rank"),
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 10,
    seeds_sql: str | None = None,
) -> str:
    """DuckDB replay of the identical integer recurrence, iterations
    unrolled as chained CTEs (recursive CTEs forbid aggregates in the
    recursive term, and a fixed-K unroll is exactly as deterministic).
    ``edges_sql`` must yield columns ``s, d``. Column semantics mirror
    :func:`pagerank` 1:1 — same floor divisions, same constants.
    ``seeds_sql`` (yielding a ``node`` column) mirrors the personalized
    variant: teleport/dangling shares divide by |seeds ∩ nodes| and land
    only on seed rows."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT s, d FROM ({edges_sql})),",
        "nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),",
        "deg AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM e GROUP BY s),",
        "dnodes AS MATERIALIZED (SELECT node FROM nodes WHERE node NOT IN (SELECT s FROM deg)),",
    ]
    if seeds_sql is None:
        parts.append("sf AS MATERIALIZED (SELECT node, TRUE AS is_seed FROM nodes),")
    else:
        parts.append(
            "sf AS MATERIALIZED (SELECT nodes.node,"
            f" nodes.node IN (SELECT DISTINCT node FROM ({seeds_sql})) AS is_seed"
            " FROM nodes),"
        )
    parts.append(
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM sf WHERE is_seed),"
    )
    parts.append(
        f"r0 AS MATERIALIZED (SELECT node,"
        f" CASE WHEN is_seed THEN {MASS} // nn.n ELSE 0 END AS r FROM sf, nn),"
    )
    base = f"(({MASS} * {DAMP_DEN - DAMP_NUM} // {DAMP_DEN}) // nn.n)"
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"dm{i} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS dm FROM {prev}"
            f" WHERE node IN (SELECT node FROM dnodes)),"
        )
        parts.append(
            f"inc{i} AS MATERIALIZED (SELECT e.d AS node, SUM({prev}.r // deg.deg) AS inc"
            f" FROM e JOIN {prev} ON e.s = {prev}.node"
            f" JOIN deg ON deg.s = e.s GROUP BY e.d),"
        )
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT sf.node,"
            f" (CASE WHEN sf.is_seed THEN {base} ELSE 0 END)"
            f" + {DAMP_NUM} * (COALESCE(inc{i}.inc, 0)"
            f" + (CASE WHEN sf.is_seed THEN dm{i}.dm // nn.n ELSE 0 END))"
            f" // {DAMP_DEN} AS r"
            f" FROM sf LEFT JOIN inc{i} USING (node), dm{i}, nn),"
        )
    # strip the trailing comma of the last CTE and project the final frame
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, CAST(r AS BIGINT) AS rank_scaled,"
        f" CAST(r AS BIGINT) / {float(MASS)} AS rank FROM r{iters}"
    )
    return "\n".join(parts)
