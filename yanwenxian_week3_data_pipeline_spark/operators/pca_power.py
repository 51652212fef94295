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

``pca_variance_explained`` (r8, VERDICT item 6) extends the machinery to
the number a curation pipeline actually gates on: the top component's
share of total variance (the Rayleigh quotient over the trace). Same
exactness contract — see its docstring for the reduction scheme that
keeps every intermediate inside DECIMAL(38,0)/HUGEINT within the
documented (PCA_VAR_MAX_DIMS, PCA_VAR_MAX_VECS) envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PCA_RESCALE = 10**6
PCA_XV_RESCALE = 10**3


def _pca_prepare(
    emb: DataFrame, vec_id: str, embedding: str, caller: str
) -> tuple[DataFrame, int, int, int]:
    """Quantize + exactly center the embedding matrix. Returns
    (u(vec, dim, u) eagerly checkpointed, n_vecs, n_dims, max|u|), raising
    a clear ValueError on degenerate inputs (empty table, no components,
    all-identical cloud) instead of propagating nulls downstream."""
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
    # One 1-row aggregate for n AND the degenerate-row count: a NULL/empty
    # embedding array is dropped by posexplode but counted by count(), so
    # the same n would be baked into the centering while the oracle's
    # unnest-side n_vecs disagrees — the one input shape where the twins
    # silently diverge. Refuse it loudly (ADVICE r8).
    head = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col(embedding).isNull()
                | (F.size(F.col(embedding)) == 0)
                # NULL elements INSIDE the array are the third variant of the
                # same desync class: floor(NULL) null-poisons the dim sums
                # instead of raising (ADVICE r9)
                | F.exists(F.col(embedding), lambda x: x.isNull()),
                1,
            ).otherwise(0)
        ).alias("bad"),
    ).collect()[0]
    n = head["n"]
    if n == 0:
        raise ValueError(f"{caller}: empty embedding table")
    if head["bad"]:
        raise ValueError(
            f"{caller}: {head['bad']} rows have NULL/empty/NULL-element {embedding!r} arrays; "
            "drop them first (they would desync n between the centering and "
            "the exploded matrix)"
        )
    sums = q.groupBy("dim").agg(F.sum("q").cast("long").alias("s"))
    u = (
        q.join(F.broadcast(sums), "dim")
        .select("vec", "dim", (F.lit(n) * F.col("q") - F.col("s")).alias("u"))
        .localCheckpoint(eager=True)
    )
    stats = u.agg(F.max("dim").alias("nd"), F.max(F.abs(F.col("u"))).alias("umax")).collect()[0]
    if stats["nd"] is None:
        raise ValueError(f"{caller}: embeddings have no components")
    if not stats["umax"]:
        raise ValueError(f"{caller}: all embeddings identical (zero centered matrix)")
    return u, n, stats["nd"] + 1, int(stats["umax"])


def _pca_iterate(u: DataFrame, spark: SparkSession, ndims: int, rounds: int) -> DataFrame:
    """``rounds`` exact-integer power iterations over the centered matrix;
    returns the final (dim int, v long) vector on the ±PCA_RESCALE grid."""
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
                    "CASE WHEN assert_true(mx > 0, 'pca power iteration: "
                    "max|xv| is 0 (degenerate cancellation)') IS NULL THEN "
                    f"CAST((abs(xv) * {PCA_XV_RESCALE}) div mx AS BIGINT) END"
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
                    * F.expr(
                        "CASE WHEN assert_true(my > 0, 'pca power iteration: "
                        "max|y| is 0 (degenerate cancellation)') IS NULL THEN "
                        f"CAST((abs(y) * {PCA_RESCALE}) div my AS BIGINT) END"
                    )
                ).cast("long").alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v


def pca_top_component(
    emb: DataFrame,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    rounds: int = 4,
) -> DataFrame:
    """(dim int, loading double): the top principal direction of the
    embedding cloud after ``rounds`` exact-integer power iterations,
    components on the ±1 grid (loading = v_dim / PCA_RESCALE)."""
    u, _n, ndims, _umax = _pca_prepare(emb, vec_id, embedding, "pca_top_component")
    v = _pca_iterate(u, emb.sparkSession, ndims, rounds)
    return v.select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("v") / F.lit(float(PCA_RESCALE))).alias("loading"),
    )


# The variance-share reduction's 128-bit headroom proof assumes
# r = (mx·10⁶) div umax ≤ ndims·10¹² (mx ≤ ndims·umax·RESCALE), so
# s1·10⁹ = r²·10⁹ ≤ ndims²·10³³ stays under DECIMAL(38,0)/HUGEINT only
# while ndims ≤ ~300. Raise the guard together with a rescale if wider
# embeddings ever land.
#
# Corpus-size envelope (ADVICE r8): the dims guard does not make the
# pipeline unbounded in n. The binding limit is the int64 CENTERING,
# u = n·q − s computed in long arithmetic: |u| ≤ 2·n·10⁶·max|x|, so for
# unit-scale coordinates exactness holds for n ≲ 4.6·10¹² vectors (the
# former `nn div 10000` BIGINT quotient, which overflowed ~50× earlier
# at n ≈ 9·10¹⁰, now goes through _fdiv in DECIMAL(38,0)). Past that,
# quantize the centering into DECIMAL(38,0) too.
PCA_VAR_MAX_DIMS = 300
PCA_VAR_MAX_VECS = 4 * 10**12  # documented int64-centering bound (unit-scale coords)


def _fdiv(a: str, b: str) -> str:
    """Exact floor division of two NON-NEGATIVE DECIMAL(38,0) SQL
    expressions whose quotient may exceed int64 (Spark's ``div`` returns
    BIGINT, so it cannot carry quotients past 2⁶³). (a − a % b) is
    divisible by b, so the decimal division is exact-integer-valued and
    representable at scale 6 (quotients here ≤ 10²⁴ ≪ 10³²) — no
    rounding anywhere. DuckDB twin: plain ``//`` (HUGEINT-exact)."""
    return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS DECIMAL(38,0))"


def pca_variance_explained(
    emb: DataFrame,
    vec_id: str = "vec_id",
    embedding: str = "embedding",
    rounds: int = 4,
) -> DataFrame:
    """One row (n_vecs long, n_dims int, variance_share double): the share
    of total variance captured by the power-iteration top component — the
    Rayleigh quotient Σ(U·v̂)² / Σu² with v̂ = v/‖v‖, i.e.

        share = Σ_vec xv² / (‖v‖² · Σ_{vec,d} u²),   xv = U·v.

    Exactness: xv² and u² magnitudes grow with corpus size beyond any
    fixed-width integer, so both sums are first NORMALIZED to the 10⁶
    grid by their own 1-row maxima — xn = (|xv|·10⁶) div mx,
    us = (|u|·10⁶) div umax — exactly as the iteration renormalizes v.
    Then share·10⁶ = N·r² / (10⁶·v2·T) with N = Σxn², T = Σus²,
    v2 = Σv², r = (mx·10⁶) div umax, evaluated in three exact
    floor-division steps (``_fdiv``) whose intermediates are provably
    < 10³⁸ for ndims ≤ PCA_VAR_MAX_DIMS and n ≤ PCA_VAR_MAX_VECS — the
    binding bound is the int64 centering, not this reduction (N ≤ n·10¹²
    enters only after a DECIMAL(38,0) div-10⁴ reduction). Every operand is
    non-negative, so Spark's div / ``_fdiv`` and DuckDB's ``//`` agree
    bit-for-bit; the returned double is share_micro/10⁶, an exact cast.
    The statistic is DEFINED as this reduced formula: the per-element
    10⁶-grid floors put it within ~2·10⁻⁶ (relative) of the real-valued
    Rayleigh quotient while keeping the two engines bit-identical.

    Scale shape: one extra long-format matvec (the same two map-side-
    combining aggregates per round the iteration uses), three 1-row
    aggregates, and a 1-row scalar assembly — nothing grows beyond the
    iteration's own plan.
    """
    u, n, ndims, umax = _pca_prepare(emb, vec_id, embedding, "pca_variance_explained")
    if ndims > PCA_VAR_MAX_DIMS:
        raise ValueError(
            f"pca_variance_explained: {ndims} dims exceeds the exact-arithmetic "
            f"envelope ({PCA_VAR_MAX_DIMS}); rescale the reduction first"
        )
    v = _pca_iterate(u, emb.sparkSession, ndims, rounds)

    xv = (
        u.join(F.broadcast(v), "dim")
        .groupBy("vec")
        .agg(F.sum(F.col("u").cast("decimal(38,0)") * F.col("v")).alias("xv"))
    )
    mx = xv.agg(F.max(F.abs(F.col("xv"))).cast("decimal(38,0)").alias("mx"))
    nstat = (
        xv.crossJoin(F.broadcast(mx))
        .select(F.expr(f"CAST((abs(xv) * {PCA_RESCALE}) div mx AS BIGINT)").alias("xn"))
        .agg(F.sum((F.col("xn") * F.col("xn")).cast("decimal(38,0)")).alias("nn"))
    )
    tstat = u.select(
        F.expr(
            f"CAST((CAST(abs(u) AS DECIMAL(38,0)) * {PCA_RESCALE}) div {umax} AS BIGINT)"
        ).alias("us")
    ).agg(F.sum((F.col("us") * F.col("us")).cast("decimal(38,0)")).alias("t"))
    v2 = v.agg(F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("v2"))

    # 1-row scalar assembly (broadcast crossJoins of 1-row aggregates —
    # the audited scalar class), then the documented reduction chain.
    one = mx.crossJoin(F.broadcast(nstat)).crossJoin(F.broadcast(tstat)).crossJoin(
        F.broadcast(v2)
    )
    return (
        one.select(
            F.expr(
                f"CAST((mx * {PCA_RESCALE}) div {umax} AS DECIMAL(38,0))"
            ).alias("r"),
            "nn",
            "t",
            "v2",
        )
        .select((F.col("r") * F.col("r")).alias("s1"), "nn", "t", "v2")
        .select(F.expr(_fdiv("s1 * 1000000000", "v2")).alias("s2"), "nn", "t")
        .select(F.expr(_fdiv("s2 * 1000000000", "t")).alias("s3"), "nn")
        .select(
            # nn ≤ n·10¹², so the div-10⁴ reduction must stay in
            # DECIMAL(38,0) (_fdiv) — as BIGINT it would overflow at
            # n ≈ 9·10¹⁰ vectors (ADVICE r8); DuckDB twin: plain //
            F.expr(
                f"CAST((s3 * {_fdiv('nn', '10000')}) div 100000000000000000000 AS BIGINT)"
            ).alias("share_micro")
        )
        .select(
            F.lit(n).cast("long").alias("n_vecs"),
            F.lit(ndims).cast("int").alias("n_dims"),
            (F.col("share_micro") / F.lit(float(PCA_RESCALE))).alias("variance_share"),
        )
    )


def _pca_cte_prefix(emb_sql: str, rounds: int) -> str:
    """Shared DuckDB WITH-body: quantize, center, unroll ``rounds``
    iterations as MATERIALIZED CTEs (v{rounds} is the final vector).
    Ends with a trailing comma so callers can append their own CTEs."""
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
    return "\n".join(parts)


def pca_oracle_sql(emb_sql: str, rounds: int) -> str:
    """DuckDB replay of the identical integer recurrence, rounds
    unrolled as MATERIALIZED CTEs. ``emb_sql`` must yield
    (vec_id, embedding)."""
    prefix = _pca_cte_prefix(emb_sql, rounds).rstrip(",")
    return (
        f"{prefix}\n"
        f"SELECT CAST(dim AS INT) AS dim,"
        f" CAST(v AS BIGINT) / CAST({PCA_RESCALE} AS DOUBLE) AS loading"
        f" FROM v{rounds}"
    )


def pca_variance_oracle_sql(emb_sql: str, rounds: int) -> str:
    """DuckDB replay of ``pca_variance_explained`` — the identical
    normalized reduction, `//` standing in for _fdiv/div throughout
    (HUGEINT-exact on the same non-negative operands)."""
    R = PCA_RESCALE
    return f"""{_pca_cte_prefix(emb_sql, rounds)}
xvf AS MATERIALIZED (
  SELECT vec, CAST(sum(CAST(u AS HUGEINT) * v) AS HUGEINT) AS xv
  FROM u JOIN v{rounds} ON v{rounds}.dim = u.dim GROUP BY vec),
mxf AS (SELECT CAST(max(abs(xv)) AS HUGEINT) AS mx FROM xvf),
um AS (SELECT CAST(max(abs(u)) AS HUGEINT) AS um FROM u),
ns AS (SELECT CAST(sum(xn * xn) AS HUGEINT) AS nn FROM (
  SELECT (abs(xv) * {R}) // mx AS xn FROM xvf, mxf)),
ts AS (SELECT CAST(sum(us * us) AS HUGEINT) AS t FROM (
  SELECT (CAST(abs(u) AS HUGEINT) * {R}) // um AS us FROM u, um)),
vs AS (SELECT CAST(sum(v * v) AS HUGEINT) AS v2 FROM v{rounds}),
sc AS (SELECT (mx * {R}) // um AS r FROM mxf, um),
s2 AS (SELECT ((r * r) * 1000000000) // v2 AS s2 FROM sc, vs),
s3 AS (SELECT (s2.s2 * 1000000000) // t AS s3 FROM s2, ts),
fin AS (SELECT CAST((s3.s3 * (nn // 10000))
        // CAST('100000000000000000000' AS HUGEINT) AS BIGINT) AS share_micro
        FROM s3, ns)
SELECT nn.n AS n_vecs,
       CAST((SELECT count(*) FROM v{rounds}) AS INT) AS n_dims,
       CAST(share_micro AS BIGINT) / CAST({R} AS DOUBLE) AS variance_share
FROM fin, nn
"""
