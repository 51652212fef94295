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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
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


def cosine_topk_arrow(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``mapInArrow`` twin of ``cosine_topk``: the scoring stage streams
    Arrow record batches straight into numpy (no pandas materialization —
    the lowest-overhead Python batch API), the per-query top-k stays the
    same JVM window. Pins the Arrow-native surface; shares cosine_topk's
    oracle.

    Determinism contract: ``np.cumsum(..., axis=1)[:, -1]`` accumulates
    left-to-right, the same association order as ``dot_expr``'s sequential
    fold (0.0 + p0 ≡ p0 exactly), and float32→float64 widening is exact on
    both paths — so the raw cosines are bit-identical to the expression
    plan and round(6) can never disagree."""
    import pyarrow as pa

    q_rows = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    )  # tiny |Q|-row side, shipped in the closure (the broadcast analogue)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_norms = np.sqrt(np.cumsum(q_mat * q_mat, axis=1)[:, -1])

    def score(batches):
        for batch in batches:
            ids = batch["cand_id"].to_numpy(zero_copy_only=False)
            vecs = np.array(batch["cand_vec"].to_pylist(), dtype=np.float64)
            if len(ids) == 0 or vecs.size == 0:
                continue
            cand_norms = np.sqrt(np.cumsum(vecs * vecs, axis=1)[:, -1])
            for qi in range(len(q_ids)):
                dots = np.cumsum(vecs * q_mat[qi], axis=1)[:, -1]
                cos = dots / (q_norms[qi] * cand_norms)
                mask = ids != q_ids[qi]
                yield pa.record_batch(
                    {
                        "query_id": pa.array(np.full(int(mask.sum()), q_ids[qi])),
                        "cand_id": pa.array(ids[mask]),
                        "cosine": pa.array(cos[mask]),
                    }
                )

    scored = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    ).mapInArrow(score, "query_id long, cand_id long, cosine double")
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
    centroids: DataFrame | None = None,
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
    if centroids is None:
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


# ---------------------------------------------------------------------------
# Embedding near-duplicate detection
# ---------------------------------------------------------------------------

def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dup: every (id_a < id_b) pair with
    round(cosine, 6) ≥ threshold. The O(n²) correctness baseline — norms are
    precomputed once per row (a projection below the join, evaluated once
    per input row, not once per pair), so each pair costs one dot product.

    ``dedup_embedding_lsh`` is the scale path; this brute-force form is for
    small/medium tables and for recall evaluation of the approximate one.

    The STREAMED side is explicitly repartitioned to the session's default
    parallelism: the whole table is a few MB, so the file scan yields ONE
    split and the nested-loop condition (an interpreted per-pair cosine
    fold) would otherwise run on a single core — measured 32 min for 20k
    vectors (200M pairs) at sf1 vs ~1 min fanned out. The explicit
    numPartitions makes this a user-specified shuffle AQE will not
    coalesce away (a bare repartition() would be folded back to 1 because
    the data is tiny — it's the PAIR work, invisible to size estimates,
    that needs the fan-out).
    """
    nrm = norm_expr(F.col(vec_col))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), nrm.alias("n_a")
    ).repartition(par, F.col("id_a"))
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), nrm.alias("n_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(dot_expr(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# adaptive-tier clamp checks already performed this session, keyed by the
# pre-checkpoint banded plan's semanticHash (same corpus -> same key)
_CLAMP_CHECKED: set = set()


def embedding_band_table(
    embeddings: DataFrame,
    n_planes: int | None = None,
    bands: int | None = None,
    seed: int | None = None,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(base, banded): the shared random-hyperplane LSH band table behind
    ``dedup_embedding_lsh`` and ``embedding_knn_graph`` — ``base`` is the
    (id, vec) projection, ``banded`` the guarded, eagerly-checkpointed
    (id, band_idx, band_val) table.

    Band width is COUNT-ADAPTIVE by default (``n_planes=None``): band keys
    are computed once at EMB_LSH_BITS_MAX bits and coarsened by
    ``band_val % bmod`` where bmod comes from the shared
    ``emb_lsh_bmod_case_sql`` CASE over the corpus count — fixed-width
    bands grow candidates as N²·2^-bits, so bits must be sized to N
    (constants.py policy note). Passing ``n_planes`` pins a fixed tier
    (the streaming twin and recall tests use this)."""
    from ..constants import (
        EMB_DIM,
        EMB_LSH_BANDS,
        EMB_LSH_BITS_MAX,
        EMB_LSH_SEED,
        emb_lsh_bmod_case_sql,
    )
    from ..functions.vectors import hyperplane_matrix

    adaptive = n_planes is None
    bands = bands or EMB_LSH_BANDS
    seed = EMB_LSH_SEED if seed is None else seed
    dim = dim or EMB_DIM
    bits = EMB_LSH_BITS_MAX if adaptive else n_planes // bands
    planes = hyperplane_matrix(bands * bits, dim, seed)

    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    # Banding = one dense matmul per Arrow batch (Pandas UDF). The two
    # expression formulations measured first at sf0.1: plane matrix as
    # inline literals → ~4 s of whole-stage-codegen COMPILE for the 2048
    # literals × 32 unrolled folds; plane matrix as broadcast data +
    # higher-order folds → ~3 s EXECUTE, because ArrayAggregate is
    # CodegenFallback (interpreted per element). Dense linear algebra is
    # exactly the narrow case where the Arrow escape hatch beats native
    # expressions; numpy does n×64 @ 64×32 per batch.
    #
    # Determinism caveat: numpy's dot accumulates in a different float
    # association than the oracle's sequential fold, so a projection within
    # ~1e-15 of zero could flip a band bit vs DuckDB. Candidates only —
    # the exact-cosine verify below (sequential fold, shared rounding)
    # decides membership, so a flipped bit can only add/remove a CANDIDATE
    # pair whose true cosine sits exactly at the LSH boundary — vanishingly
    # rare and checked continuously by the sf0.01 oracle gate.
    from ..functions.vectors import embedding_band_vals_udf

    _band_vals = embedding_band_vals_udf(planes, bands, bits)

    # Corpus count as a 1-row broadcast scalar: each id produces exactly one
    # row per band, so the per-band banded total IS this count — the guard's
    # cap and the adaptive width derive from the same aggregate in one
    # columnar count scan (no second pass over the banded table).
    nrow = base.agg(F.count(F.lit(1)).alias("_n"))
    bmod = (
        F.expr(emb_lsh_bmod_case_sql("_n"))
        if adaptive
        else F.lit(1 << bits).cast("long")
    )
    banded = (
        base.select(
            "id", F.posexplode(_band_vals(F.col("vec"))).alias("band_idx", "band_val_w")
        )
        .crossJoin(F.broadcast(nrow))
        .select(
            "id",
            "band_idx",
            (F.col("band_val_w") % bmod).alias("band_val"),
            F.col("_n"),
            bmod.alias("_bmod"),
        )
    )
    # degenerate-bucket guard (constants.EMB_LSH_MAX_BUCKET_ABS docstring):
    # exclude buckets > max(abs floor, factor·N/bmod) — the cap scales with
    # N so uniform bucket growth never trips it, while mass-collision
    # degeneracy (identical/zero vectors at 100 TB) is cut before it makes
    # the candidate join quadratic. The bucket count is a window over
    # (band_idx, band_val) — the SAME partitioning the self-join shuffles
    # on, so the guard rides the join's own exchange: zero extra passes
    # over the banded table (the r5 two-pass guard cost +36 % wall).
    from ..constants import EMB_LSH_DEGEN_FACTOR, EMB_LSH_MAX_BUCKET_ABS

    wb = Window.partitionBy("band_idx", "band_val")
    cap = F.greatest(
        F.lit(EMB_LSH_MAX_BUCKET_ABS).cast("long"),
        F.expr(f"({EMB_LSH_DEGEN_FACTOR} * _n) div _bmod"),
    )
    banded = (
        banded.withColumn("_c", F.count(F.lit(1)).over(wb))
        .where(F.col("_c") <= cap)
        .select("id", "band_idx", "band_val")
    )
    # Eager checkpoint before the self-join: left to itself the planner
    # broadcasts one self-join side, wrapping it in a BroadcastExchange
    # whose subtree no longer matches the other — the Arrow matmul stage
    # then runs TWICE (measured: the r5 two-pass guard + double matmul was
    # the +36 % headline regression; a merge hint alone still re-ran the
    # matmul under AQE). The banded frame is N·bands (id, band_idx,
    # band_val) rows — a few longs per input vector, far smaller than the
    # vectors themselves — so materializing it once is the cheapest way to
    # guarantee single execution of the matmul + guard across both join
    # sides (the components.py / pagerank.py lineage discipline).
    # key the clamp check below on the PRE-checkpoint logical plan: the
    # checkpointed frame's plan is a new RDD scan per build (never equal),
    # but the pre-checkpoint plan is identical whenever the same corpus is
    # re-banded in one session
    try:
        clamp_key = banded.semanticHash()
    except Exception:  # noqa: BLE001 - visibility must never break the build
        clamp_key = None
    banded = banded.localCheckpoint(eager=True)
    if adaptive and clamp_key not in _CLAMP_CHECKED:
        # Clamp visibility (r7 ADVICE): past the last adaptive tier the
        # CASE's ELSE pins bmod at 2^EMB_LSH_BITS_MAX and random band
        # collisions resume growing ~N²/2^(bits+1) per band, with only the
        # recall-lowering degenerate-bucket cap bounding the join. Extending
        # the table is a deliberate code change (wider planes = +matmul for
        # every corpus), so make the clamp LOUD instead of silent. N is read
        # off the just-materialized checkpoint (rows ≈ N·bands post-guard) —
        # a block scan, no recompute; memoized per logical plan so repeated
        # builds of the same corpus in one session (bench warm loops) pay
        # the ~50 ms count job exactly once.
        from ..constants import EMB_LSH_ADAPTIVE_STEPS

        _CLAMP_CHECKED.add(clamp_key)
        n_est = banded.count() // max(bands, 1)
        last_thr = EMB_LSH_ADAPTIVE_STEPS[-1][0]
        if n_est >= last_thr:
            import logging

            logging.getLogger(__name__).warning(
                "embedding LSH: corpus count ~%d >= %d lands in the clamped "
                "ELSE tier (bmod = 2^%d); candidate pairs now grow "
                "quadratically per band — extend constants."
                "EMB_LSH_ADAPTIVE_STEPS (and widen EMB_LSH_BITS_MAX planes) "
                "before running at this scale.",
                n_est,
                last_thr,
                bits,
            )
    return base, banded


def dedup_embedding_lsh(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int | None = None,
    bands: int | None = None,
    seed: int | None = None,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate embedding near-dup via random-hyperplane LSH.

    Plan shape (the scale path — no O(n²) stage):
      1. the shared adaptive band table (``embedding_band_table``);
      2. self-equi-join on the band — the only shuffle that grows with
         data, keyed by the bucket;
      3. distinct candidate pairs → exact-cosine verify (join the vectors
         back) → round(cosine, 6) ≥ threshold.

    Identical vectors collide at every width, so exact-duplicate recall
    is 1; 0.99-cosine recall is ~0.99/0.97/0.93 at 8/12/16 bits."""
    base, banded = embedding_band_table(
        embeddings, n_planes, bands, seed, dim, id_col, vec_col
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    nrm = norm_expr(F.col("vec"))
    va = base.select(F.col("id").alias("id_a"), F.col("vec").alias("v_a"), nrm.alias("n_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("vec").alias("v_b"), nrm.alias("n_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine", F.round(dot_expr(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6)
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_knn_graph(
    embeddings: DataFrame,
    k: int,
    n_planes: int | None = None,
    bands: int | None = None,
    seed: int | None = None,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN GRAPH over the whole table (every vector's top-k
    cosine neighbors among its LSH band candidates) — the building block
    for graph-based semantic dedup, cluster discovery, and
    retrieval-index QA, distinct from ``cosine_topk`` (query-set search)
    in that the "query set" is the corpus itself, so a broadcast-queries
    plan is impossible and the band table IS the candidate generator.

    Plan shape: the shared adaptive band table self-joins on the bucket
    with ``id != id`` (both directions, since neighbor lists are
    per-vector), exact cosine on the distinct candidate pairs, then one
    window per vector (partitioned by id — never global) keeps
    (cosine DESC, neighbor ASC) row_number ≤ k. Approximate by
    construction: vectors whose buckets are all singletons yield no
    rows, and true neighbors outside every shared band are missed — the
    standard ANN-graph contract; recall is band-width-tunable."""
    base, banded = embedding_band_table(
        embeddings, n_planes, bands, seed, dim, id_col, vec_col
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("nb"))
        .distinct()
    )
    nrm = norm_expr(F.col("vec"))
    va = base.select(F.col("id").alias("id"), F.col("vec").alias("v_a"), nrm.alias("n_a"))
    vb = base.select(F.col("id").alias("nb"), F.col("vec").alias("v_b"), nrm.alias("n_b"))
    scored = (
        cand.join(va, "id")
        .join(vb, "nb")
        .withColumn(
            "cosine",
            F.round(dot_expr(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nb"))
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(
            F.col("id").alias("vec_id"),
            F.col("nb").alias("neighbor_id"),
            "knn_rank",
            "cosine",
        )
    )


def cosine_topk_ivf_kmeans(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF top-k with REAL k-means centroids (pyspark.ml, seeded k-means||)
    instead of the lowest-id heuristic — delegates to ``cosine_topk_ivf``
    with a trained centroid table, so the probe/assign plan is shared by
    construction. Training is one MLlib job over the (small relative to the
    corpus) vectors; at 100 TB the centroids are trained on a sample and
    broadcast, exactly as here. Not SQL-expressible (k-means training) ->
    rows-only driver check; the recall evaluation against exact brute force
    is the quality gate."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    feats = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feats)
    cents = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids = spark.createDataFrame(cents, "cell int, cell_vec array<float>")
    return cosine_topk_ivf(
        embeddings,
        query_ids,
        k=k,
        n_cells=n_cells,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
    )


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup)
# ---------------------------------------------------------------------------

def semantic_dedup(
    embeddings: DataFrame,
    eps: float,
    centroids: DataFrame | None = None,
    n_cells: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding space, then inside each cluster greedily drop every example
    whose cosine to an EARLIER-ordered cluster member reaches ``eps``.

    Semantics (the paper's upper-triangular rule, made engine-independent):
      - every vector is assigned to its max-cosine centroid (ties -> lowest
        cell id, same row_number convention as ``cosine_topk_ivf``);
      - cluster members are ordered by round(cosine-to-centroid, 6)
        ASCENDING, ``id_col`` ascending as tiebreak — the paper's
        best-performing keep policy retains the LEAST prototypical member
        of each duplicate group ("keep low similarity to centroid");
      - a vector is dropped iff ANY earlier-ordered same-cell vector has
        round(pairwise cosine, 6) >= eps — earlier DROPPED vectors still
        shadow later ones, exactly the paper's triangular max over the
        cluster similarity matrix (not connected components, not greedy
        over survivors only).

    Returns the SURVIVORS: (id_col, cell, cent_cos).

    Plan shape / 100 TB notes:
      - centroid table is tiny (n_cells rows) and broadcast on both the
        assignment and (via the planted-centroid callers) the oracle side;
        training, when requested, is one seeded MLlib k-means job — at
        100 TB you train on a sample and broadcast, identical plan.
      - the intra-cell pair stage is an equi-join on ``cell`` followed by
        the ordering predicate; production SemDeDup keeps cells ~O(1k) rows
        by scaling n_cells with N (the paper uses 50k clusters for LAION),
        so per-cell work is bounded and the shuffle key count grows with
        data instead of the cell size;
      - ``max_cell_rows`` is the mega-cell analogue of DEDUP_MAX_BUCKET:
        cells larger than the cap skip the quadratic pair stage entirely
        (all their members survive — a documented recall trade, never an
        OOM). Left None here because callers in this repo bound the input;
        set it whenever n_cells is not scaled with N.
    """
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        spark = embeddings.sparkSession
        feats = base.select(array_to_vector(F.col("vec").cast("array<double>")).alias("features"))
        model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(feats)
        cents = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
        centroids = spark.createDataFrame(cents, "cell int, cell_vec array<float>")

    assign_w = Window.partitionBy("id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    assigned = (
        base.join(F.broadcast(centroids))
        .withColumn("cell_cos", cosine_expr(F.col("vec"), F.col("cell_vec")))
        .withColumn("_rn", F.row_number().over(assign_w))
        .where(F.col("_rn") == 1)
        .select("id", "vec", "cell", F.round("cell_cos", 6).alias("cent_cos"))
    )
    paired = assigned
    if max_cell_rows is not None:
        ok_cells = (
            assigned.groupBy("cell").count()
            .where(F.col("count") <= max_cell_rows)
            .drop("count")
        )
        paired = assigned.join(ok_cells, "cell", "left_semi")
    a, b = paired.alias("a"), paired.alias("b")
    earlier = (F.col("a.cent_cos") < F.col("b.cent_cos")) | (
        (F.col("a.cent_cos") == F.col("b.cent_cos")) & (F.col("a.id") < F.col("b.id"))
    )
    dropped = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & earlier)
        .where(F.round(cosine_expr(F.col("a.vec"), F.col("b.vec")), 6) >= eps)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dropped, "id", "left_anti")
        .select(F.col("id").alias(id_col), "cell", "cent_cos")
    )
