"""Top principal component by power iteration — exact cross-engine
integer arithmetic (the pagerank.py determinism contract extended from
graph recurrences to linear algebra).

Float power iteration cannot be oracled: every matrix-vector product is
a parallel float reduction whose association order moves the last ulps,
and the iteration amplifies them. This implementation keeps EVERYTHING
in integers:

- coordinates are micro-quantized once (the shared kmeans_exact recipe,
  WITHOUT the positivity offset — centering absorbs it);
- mean-centering is exact and division-free: u_d = n·q_d − S_d (the
  centered coordinate scaled by n — a global scale does not move the
  eigenvector direction);
- each round computes xv = U·v and y = Uᵀ·xv with DECIMAL(38,0) sums
  (exact and associative under any reduction order; int64 would
  overflow near 10⁹ rows × micro scale);
- after each product the vector is renormalized to the fixed integer
  grid ±RESCALE by v' = sign(y)·(|y|·RESCALE div max|y|): operands are
  non-negative, where Spark's ``div`` and DuckDB's ``//`` agree, and
  the 1-row max is deterministic.

The returned loadings are v/RESCALE — an exact int-to-double cast per
component (|v| ≤ RESCALE < 2⁵³). Sign convention: whatever the all-ones
start vector converges to — deterministic by construction. The all-ones
start is orthogonal to the top component only on measure-zero inputs;
for the registered corpus the recount pins actual convergence.

Scale shape (100 TB): the (vec, dim)-long matrix is ONE posexplode of
the embedding table; each round is two map-side-combining aggregates
(group by vec, then group by dim — the standard long-format distributed
matvec) plus two 1-row max scalars and a 64-row broadcast back. Rounds
are fixed (the kcore/pagerank budget discipline); per-round eager
checkpoint of the 64-row vector keeps lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PCA_RESCALE = 10**6
PCA_XV_RESCALE = 10**3


def pca_top_component(
    emb: DataFrame,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    rounds: int = 4,
) -> DataFrame:
    """(dim int, loading double): the top principal direction of the
    embedding cloud after ``rounds`` exact-integer power iterations,
    components on the ±1 grid (loading = v_dim / PCA_RESCALE)."""
    from .kmeans_exact import KM_SCALE

    q = emb.select(
        F.col(vec_id).alias("vec"),
        F.posexplode(
            F.transform(
                F.col(embedding),
                lambda x: F.floor(x.cast("double") * F.lit(float(KM_SCALE)) + F.lit(0.5)).cast(
                    "long"
                ),
            )
        ).alias("dim", "q"),
    )
    spark = emb.sparkSession
    n = emb.count()
    sums = q.groupBy("dim").agg(F.sum("q").cast("long").alias("s"))
    u = (
        q.join(F.broadcast(sums), "dim")
        .select("vec", "dim", (F.lit(n) * F.col("q") - F.col("s")).alias("u"))
        .localCheckpoint(eager=True)
    )
    ndims = u.agg(F.max("dim")).collect()[0][0] + 1
    v = spark.createDataFrame(
        [(d, PCA_RESCALE) for d in range(ndims)], "dim int, v long"
    ).localCheckpoint(eager=True)

    for _ in range(rounds):
        xv = (
            u.join(F.broadcast(v), "dim")
            .groupBy("vec")
            .agg(F.sum(F.col("u").cast("decimal(38,0)") * F.col("v")).alias("xv"))
        )
        mx = xv.agg(F.max(F.abs(F.col("xv"))).alias("mx"))
        xs = xv.crossJoin(F.broadcast(mx)).select(
            "vec",
            (
                F.when(F.col("xv") < 0, -1).otherwise(1)
                * F.expr(
                    f"CAST((abs(xv) * {PCA_XV_RESCALE}) div mx AS BIGINT)"
                )
            ).cast("long").alias("xs"),
        )
        y = (
            u.join(xs, "vec")
            .groupBy("dim")
            .agg(F.sum(F.col("u").cast("decimal(38,0)") * F.col("xs")).alias("y"))
        )
        my = y.agg(F.max(F.abs(F.col("y"))).alias("my"))
        v = (
            y.crossJoin(F.broadcast(my))
            .select(
                "dim",
                (
                    F.when(F.col("y") < 0, -1).otherwise(1)
                    * F.expr(f"CAST((abs(y) * {PCA_RESCALE}) div my AS BIGINT)")
                ).cast("long").alias("v"),
            )
            .localCheckpoint(eager=True)
        )

    return v.select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("v") / F.lit(float(PCA_RESCALE))).alias("loading"),
    )


def pca_oracle_sql(emb_sql: str, rounds: int) -> str:
    """DuckDB replay of the identical integer recurrence, rounds
    unrolled as MATERIALIZED CTEs. ``emb_sql`` must yield
    (vec_id, embedding)."""
    from .kmeans_exact import KM_SCALE

    parts = [
        f"""WITH q AS MATERIALIZED (
  SELECT vec_id AS vec, pos - 1 AS dim,
         CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE} + 0.5) AS BIGINT) AS q
  FROM (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS pos,
               unnest(embedding) AS x FROM ({emb_sql})) r),
nn AS MATERIALIZED (SELECT CAST(count(DISTINCT vec) AS BIGINT) AS n FROM q),
su AS MATERIALIZED (SELECT dim, CAST(sum(q) AS BIGINT) AS s FROM q GROUP BY dim),
u AS MATERIALIZED (
  SELECT vec, q.dim, CAST(nn.n * q.q - su.s AS BIGINT) AS u
  FROM q JOIN su ON su.dim = q.dim, nn),
v0 AS MATERIALIZED (SELECT dim, CAST({PCA_RESCALE} AS HUGEINT) AS v FROM su),""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""xv{r} AS MATERIALIZED (
  SELECT vec, CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS xv
  FROM u JOIN v{p} ON v{p}.dim = u.dim GROUP BY vec),
mx{r} AS MATERIALIZED (SELECT max(abs(xv)) AS mx FROM xv{r}),
xs{r} AS MATERIALIZED (
  SELECT vec, CAST(CASE WHEN xv < 0 THEN -1 ELSE 1 END
         * ((abs(xv) * {PCA_XV_RESCALE}) // mx) AS BIGINT) AS xs
  FROM xv{r}, mx{r}),
y{r} AS MATERIALIZED (
  SELECT dim, CAST(sum(CAST(u AS HUGEINT) * xs) AS HUGEINT) AS y
  FROM u JOIN xs{r} ON xs{r}.vec = u.vec GROUP BY dim),
my{r} AS MATERIALIZED (SELECT max(abs(y)) AS my FROM y{r}),
v{r} AS MATERIALIZED (
  SELECT dim, CAST(CASE WHEN y < 0 THEN -1 ELSE 1 END
         * ((abs(y) * {PCA_RESCALE}) // my) AS HUGEINT) AS v
  FROM y{r}, my{r}),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT CAST(dim AS INT) AS dim,"
        f" CAST(v AS BIGINT) / CAST({PCA_RESCALE} AS DOUBLE) AS loading"
        f" FROM v{rounds}"
    )
    return "\n".join(parts)
