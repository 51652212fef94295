"""Exact cross-engine k-means (Lloyd rounds in pure integer arithmetic).

Float k-means cannot be oracled across engines: distance sums and centroid
means drift in the last ulp under different reduction orders, and the
drift flips argmin ties, cascading into different clusterings. This
implementation quantizes every embedding coordinate ONCE to exact micro
integers — xq = floor(x·10⁶ + 0.5) + OFFSET, the floor(+0.5) construction
both engines evaluate identically on the same double — and from then on
every operation is exact integer arithmetic:

- distance     d²(x, c) = Σ (xq_i − cq_i)²   (offset cancels; products
  ≤ (4·10⁶)²·64 ≈ 10¹⁵ — inside long)
- assignment   argmin over (d², cell) — a total order, tie-broken by
  cell id, identical everywhere
- update       cq_i = (Σ xq_i) div n — OFFSET keeps every coordinate
  POSITIVE, where Spark's truncating `div` and DuckDB's flooring `//`
  agree (they differ on negatives — the one semantic trap in integer
  division across these engines)
- empty cells keep their previous centroid (coalesce), the standard
  Lloyd convention

so the clustering is BIT-IDENTICAL across engines, partitionings, and
reduction orders — the same determinism contract as operators/pagerank.py,
extended to an iterative geometric algorithm.

Scale shape (100 TB): per round, assignment is a k-row centroid broadcast
against the vector scan (the dedup_semantic argmax class) and the update
is one posexplode + (cell, pos) aggregation with map-side partial sums —
two corpus-sized passes, k·d bounded state, eager per-round checkpoints
(the components.py lineage discipline). Long accumulators hold to ~10¹⁸
coordinate-sum mass (≈10⁹ vectors per cell at micro scale); beyond that
the update sums move to DECIMAL(38,0) like the centroid operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KM_SCALE = 10**6
KM_OFFSET = 10**7  # keeps quantized coords positive for |x| < 10


def quantize_expr(embedding: F.Column) -> F.Column:
    """array<float> -> array<long> exact micro-integer coordinates."""
    return F.transform(
        embedding,
        lambda x: (
            F.floor(x.cast("double") * F.lit(float(KM_SCALE)) + F.lit(0.5))
            + F.lit(KM_OFFSET)
        ).cast("long"),
    )


def _dist2(xq: F.Column, cq: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(xq, cq, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_exact(
    emb: DataFrame,
    k: int,
    rounds: int,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
) -> DataFrame:
    """Lloyd k-means with seeds = the k smallest vec_ids' vectors; returns
    one row per NON-EMPTY cell under the final centroids:
    (cell, n_vecs, inertia_e6, centroid_sum)."""
    q = emb.select(
        F.col(vec_id).alias("vec_id"), quantize_expr(F.col(embedding)).alias("xq")
    ).localCheckpoint(eager=True)
    # seeds = the k smallest vec_ids (rank-based, so a sparse or offset id
    # space still yields exactly min(k, N) seeds; `vec_id < k` would not)
    cents = (
        q.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("xq").alias("cq"))
        .localCheckpoint(eager=True)
    )

    def assign(centroids: DataFrame) -> DataFrame:
        scored = q.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "cell", _dist2(F.col("xq"), F.col("cq")).alias("dist")
        )
        return scored.groupBy("vec_id").agg(
            F.min(F.struct("dist", "cell")).alias("m")
        ).select("vec_id", F.col("m.cell").alias("cell"), F.col("m.dist").alias("dist"))

    for _ in range(rounds):
        a = assign(cents)
        sums = (
            a.join(q, "vec_id")
            .select("cell", F.posexplode("xq").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cell", "pos", F.expr("s div n").alias("cv"))
        )
        new_c = sums.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("cq_new")
        )
        cents = (
            cents.join(new_c, "cell", "left")
            .select("cell", F.coalesce("cq_new", "cq").alias("cq"))
            .localCheckpoint(eager=True)
        )

    final = assign(cents)
    stats = final.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # sum in DECIMAL(38,0), not LONG: a cell of ~tens of thousands of
        # vectors at dist ~2.6e14 would overflow a long accumulator, while
        # the DuckDB twin sums in HUGEINT — decimal keeps both exact
        F.expr(f"CAST(sum(CAST(dist AS DECIMAL(38,0))) AS DECIMAL(38,0)) div {KM_SCALE}")
        .cast("long")
        .alias("inertia_e6"),
    )
    csum = cents.select(
        "cell",
        F.aggregate(
            F.col("cq"), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("centroid_sum"),
    )
    return (
        stats.join(csum, "cell")
        .select("cell", "n_vecs", "inertia_e6", "centroid_sum")
        .orderBy("cell")
    )


def kmeans_exact_oracle_sql(
    emb_sql: str, k: int, rounds: int
) -> str:
    """DuckDB replay: identical quantization, unrolled Lloyd rounds, same
    integer semantics (`//` == `div` on the positive quantized domain)."""
    dist = (
        "CAST(list_sum(list_transform(range(1, len(q.xq) + 1),"
        " i -> (q.xq[i] - c.cq[i]) * (q.xq[i] - c.cq[i]))) AS BIGINT)"
    )
    parts = [
        f"""WITH q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) AS BIGINT)
         + {KM_OFFSET}) AS xq
  FROM ({emb_sql})),""",
        f"c0 AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cell, xq AS cq"
        f" FROM q ORDER BY vec_id LIMIT {k}),",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""a{r} AS MATERIALIZED (
  SELECT vec_id, cell, dist FROM (
    SELECT q.vec_id, c.cell, {dist} AS dist,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {dist}, c.cell) AS rn
    FROM q, c{p} c) WHERE rn = 1),
s{r} AS MATERIALIZED (
  SELECT cell, pos, CAST(sum(v) // count(*) AS BIGINT) AS cv
  FROM (SELECT a.cell,
               unnest(generate_series(1, len(q.xq))) AS pos,
               unnest(q.xq) AS v
        FROM a{r} a JOIN q USING (vec_id))
  GROUP BY cell, pos),
n{r} AS MATERIALIZED (
  SELECT cell, list(cv ORDER BY pos) AS cq_new FROM s{r} GROUP BY cell),
c{r} AS MATERIALIZED (
  SELECT p.cell, coalesce(n.cq_new, p.cq) AS cq
  FROM c{p} p LEFT JOIN n{r} n USING (cell)),""",
        )
    parts.append(
        f"""af AS MATERIALIZED (
  SELECT vec_id, cell, dist FROM (
    SELECT q.vec_id, c.cell, {dist} AS dist,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY {dist}, c.cell) AS rn
    FROM q, c{rounds} c) WHERE rn = 1)
SELECT af.cell, CAST(count(*) AS BIGINT) AS n_vecs,
  -- HUGEINT, not DECIMAL: DuckDB's DECIMAL // keeps a fractional part and
  -- the BIGINT cast would ROUND it; HUGEINT // is true floor division
  CAST(CAST(sum(af.dist) AS HUGEINT) // {KM_SCALE} AS BIGINT) AS inertia_e6,
  CAST((SELECT list_sum(cq) FROM c{rounds} cc WHERE cc.cell = af.cell) AS BIGINT)
    AS centroid_sum
FROM af GROUP BY af.cell ORDER BY af.cell"""
    )
    return "\n".join(parts)
