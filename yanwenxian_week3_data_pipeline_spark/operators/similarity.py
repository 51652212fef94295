"""Similarity search over ``array<float>`` embedding columns.

- ``cosine_topk``      — brute-force cosine top-k: broadcast the (small)
  query set against all candidates; rank per query. The correctness
  baseline; O(|Q| · N) with no shuffle on the big side beyond the final
  per-query top-k aggregation.
- ``cosine_topk_ivf``  — IVF-style scale path: K deterministic seed
  centroids (lowest ids), every vector assigned to its nearest centroid
  (broadcast centroids), queries probe the ``nprobe`` nearest cells only.
  Approximate; recall tested against brute force in tests/.

All vector math is JVM-side higher-order functions (functions/vectors.py);
floating-point results are cross-engine deterministic (sequential folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_expr, dot_expr, norm_expr


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours by cosine for each query id.

    Plan: tiny query side (isin filter) broadcast-joined against the full
    table; per-query ranking via window on the (small) scored result.
    """
    base = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = (
        base.join(F.broadcast(queries), F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("query_vec"), F.col("cand_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids are the ``n_cells`` lowest-id vectors (deterministic seed
    choice; a k-means refinement would drop in here without changing the
    plan shape). Index build = one broadcast join; query = probe the
    ``nprobe`` closest cells, then brute-force inside ~(nprobe/n_cells) of
    the data. At 100 TB the assignment table would be written bucketed by
    ``cell`` so probes prune partitions at the scan.
    """
    base = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec"))
    centroids = (
        embeddings.orderBy(F.asc(id_col)).limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cell_vec"))
    )
    # assign every vector to its nearest centroid
    assign_w = Window.partitionBy("cand_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    assigned = (
        base.join(F.broadcast(centroids))
        .withColumn("cell_cos", cosine_expr(F.col("cand_vec"), F.col("cell_vec")))
        .withColumn("_rn", F.row_number().over(assign_w))
        .where(F.col("_rn") == 1)
        .select("cand_id", "cand_vec", "cell")
    )
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    probes = (
        queries.join(F.broadcast(centroids))
        .withColumn("cell_cos", cosine_expr(F.col("query_vec"), F.col("cell_vec")))
        .withColumn("_rn", F.row_number().over(probe_w))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "query_vec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr(F.col("query_vec"), F.col("cand_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
