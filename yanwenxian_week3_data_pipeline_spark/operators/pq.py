"""Product quantization with asymmetric distance computation (ADC) —
Jégou et al. 2011, the vector-compression half of IVF-PQ ANN indexes.

The reference has no vector surface (SURVEY.md §2.10) — EXT scope, the
compression path that makes billion-vector ANN feasible: each D-dim
vector is split into M subvectors, each subvector replaced by the id of
its nearest codeword from a per-subspace codebook of K entries, so a
vector stores as M small codes (M·log2(K) bits, here 8 codes ≈ 4 bytes
vs 256 bytes raw). A query never decompresses candidates: its M×K
subspace-distance table is built ONCE, and each candidate's approximate
distance is M table lookups summed (ADC).

Determinism contract: every distance is the functions/vectors.py
sequential left-to-right double fold (bit-identical to the DuckDB twin);
code assignment breaks ties by codeword id ASC; the final top-k orders by
(distance, candidate id). Codebooks here are the seeded id-order
heuristic (the sim_cosine_topk_ivf recipe — lowest-id vectors), so the
whole pipeline is cross-engine exact and fully oracled; a trained-k-means
codebook would slot in the same way as the kmeans IVF twins.

Scale shape (100 TB): the codebook is (M·K)-row bounded and BROADCAST;
assignment is one map-side pass over candidates (M·K distance folds per
row, no shuffle until the (id, m) argmin partial-agg); the query table is
(NQ·M·K)-bounded and broadcast; ADC is a broadcast equi-join on (m, code)
plus one (query, id) partial-agg; per-query top-k rides the
WindowGroupLimit rank-limit pushdown (each map task forwards ≤ k rows per
query before the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.vectors import l2sq_expr


def _sub(vec: F.Column, m: F.Column, ds: int) -> F.Column:
    return F.slice(vec, m * ds + 1, ds)


def pq_adc_topk(
    embeddings: DataFrame,
    n_codewords: int,
    n_queries: int,
    n_sub: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PQ-ADC approximate top-k. Codebook = subvectors of the
    ``n_codewords`` lowest-id vectors; queries = the next ``n_queries``
    ids. Returns (queries(query_id, qvec), approx(query_id, id, adc_d),
    emb(id, vec)) — the recall/precision metrics build on top."""
    dim = len(
        embeddings.select(vec_col).first()[0]
    )
    ds = dim // n_sub
    emb = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    low = (
        emb.orderBy("id")
        .limit(n_codewords + n_queries)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
        .localCheckpoint(eager=True)
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m")
    cb = (
        low.where(F.col("rn") <= n_codewords)
        .select((F.col("rn") - 1).alias("c"), "vec", ms)
        .select("m", "c", _sub(F.col("vec"), F.col("m"), ds).alias("cw"))
    )
    queries = low.where(F.col("rn") > n_codewords).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )

    # code assignment: argmin codeword per (candidate, subspace)
    scored = emb.select("id", "vec", ms).join(
        F.broadcast(cb), "m"
    ).select(
        "id",
        "m",
        "c",
        l2sq_expr(_sub(F.col("vec"), F.col("m"), ds), F.col("cw")).alias("d"),
    )
    w_assign = Window.partitionBy("id", "m").orderBy(F.asc("d"), F.asc("c"))
    codes = (
        scored.withColumn("arn", F.row_number().over(w_assign))
        .where(F.col("arn") == 1)
        .select("id", "m", "c")
    )

    # per-query subspace distance table (NQ·M·K rows, broadcast)
    qtab = queries.select("query_id", "qvec", ms).join(
        F.broadcast(cb), "m"
    ).select(
        "query_id",
        "m",
        "c",
        l2sq_expr(_sub(F.col("qvec"), F.col("m"), ds), F.col("cw")).alias(
            "qd"
        ),
    )
    # the ADC sum is M doubles — a plain SUM would accumulate in
    # partial-agg order (engine- and partitioning-dependent), so pivot to
    # one column per subspace and add LEFT-TO-RIGHT, the vectors.py fold
    # contract
    per_m = [
        F.max(F.when(F.col("m") == i, F.col("qd"))).alias(f"d{i}")
        for i in range(n_sub)
    ]
    adc_sum = F.col("d0")
    for i in range(1, n_sub):
        adc_sum = adc_sum + F.col(f"d{i}")
    adc = (
        codes.join(F.broadcast(qtab), ["m", "c"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(*per_m)
        .select("query_id", "id", adc_sum.alias("adc_d"))
    )
    w_q = Window.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("id"))
    approx = (
        adc.withColumn("rn", F.row_number().over(w_q))
        .where(F.col("rn") <= k)
        .select("query_id", "id", "adc_d")
    )
    return queries, approx, emb


def pq_adc_recall(
    embeddings: DataFrame,
    n_codewords: int,
    n_queries: int,
    n_sub: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query recall@k of PQ-ADC against the exact L2² top-k.
    Returns one row per query: (query_id, n_overlap, recall)."""
    queries, approx, emb = pq_adc_topk(
        embeddings, n_codewords, n_queries, n_sub, k, id_col, vec_col
    )
    exact = emb.join(
        F.broadcast(queries), F.col("id") != F.col("query_id")
    ).select(
        "query_id", "id", l2sq_expr(F.col("qvec"), F.col("vec")).alias("ed")
    )
    w_e = Window.partitionBy("query_id").orderBy(F.asc("ed"), F.asc("id"))
    exact_k = exact.withColumn("rn", F.row_number().over(w_e)).where(
        F.col("rn") <= k
    )

    overlap = approx.join(exact_k, ["query_id", "id"], "left_semi")
    return (
        queries.select("query_id")
        .join(
            overlap.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("n_overlap")
            ),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
    )


def pq_adc_cluster_precision(
    embeddings: DataFrame,
    cluster_col: str,
    n_codewords: int,
    n_queries: int,
    n_sub: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query fraction of the PQ-ADC top-k sharing the query's
    cluster label — the metric compression is supposed to preserve
    (coarse neighborhood structure; exact within-cluster ORDERING needs
    codebooks trained at finer grain). Returns
    (query_id, n_in_cluster, cluster_precision)."""
    clusters = embeddings.select(
        F.col(id_col).alias("id"), F.col(cluster_col).alias("cl")
    )
    queries, approx, _emb = pq_adc_topk(
        embeddings, n_codewords, n_queries, n_sub, k, id_col, vec_col
    )
    qcl = clusters.select(
        F.col("id").alias("query_id"), F.col("cl").alias("qcl")
    )
    hits = (
        approx.join(F.broadcast(qcl), "query_id")
        .join(clusters, "id")
        .where(F.col("cl") == F.col("qcl"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_in_cluster"))
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_in_cluster"), F.lit(0))
            .cast("long")
            .alias("n_in_cluster"),
            (
                F.coalesce(F.col("n_in_cluster"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("cluster_precision"),
        )
    )
