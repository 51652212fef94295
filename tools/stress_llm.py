"""Scale stress for the LLM headline set: dedup_minhash_lsh,
dedup_embedding_lsh, sim_cosine_topk at 1×/3×/10× the sf0.1 corpus.

The bench's 2× gate is measured at sf0.1 only; this harness is the
evidence that the banded/bucketed formulations stay NEAR-LINEAR as the
corpus grows — the property that separates an LSH join from an all-pairs
join (which would grow quadratically and show up immediately in the
wall(k)/wall(1) ratios printed at the end).

Replicas are PERTURBED, not copied — and the perturbation must change the
ANSWER linearly, or the measurement is meaningless: a verbatim k× copy
makes every document a k-clique of exact duplicates, growing TRUE pair
counts by k(k-1)/2, and quadratic answer growth would wrongly read as
candidate blowup. So each replica r > 0 applies a STRUCTURE-PRESERVING relabeling:
- every token is prefixed with the replica tag (``quick`` → ``r2_quick``)
  — a bijective vocabulary renaming, so every within-replica Jaccard is
  EXACTLY the base corpus's, while cross-replica token sets are disjoint
  (Jaccard 0). Appending shared filler instead would RAISE every
  within-replica Jaccard and melt the LSH buckets — measured: 9× wall at
  3× data before this construction;
- every embedding is CYCLICALLY ROLLED by r·11 coordinates (a fixed
  permutation preserves all pairwise cosines WITHIN the replica exactly,
  while across replicas rolled vectors decorrelate to ~0 cosine, far
  below the 0.4 pair threshold).
True-pair density per replica is therefore constant and the answer grows
~k, so the wall(k)/wall(1) ratios measure the ENGINE, not the workload.

Usage: python tools/stress_llm.py [base_sf_dir] [out_root] [query_prefix ...]
  base_sf_dir   default /root/testdata/sf0.1
  out_root      default /tmp/llm_scale
  query_prefix  optional: only stress queries starting with any prefix
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = [1, 3, 10]
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "sim_cosine_topk",
    # span-grain substring dedup: the token renaming preserves every
    # within-replica repeated span exactly, so the answer stays TOPK-sized
    # while the span stream grows k× — pure engine scaling
    "dedup_repeated_spans_merged",
    # suffix-grain LRS: renaming preserves every within-replica repeat
    # exactly (answer LENGTH is scale-invariant); the capped sort's span
    # stream and the hash-probe passes both grow k× — linearity here is
    # the substring-dedup scale proof
    "docs_lrs_capped",
    "docs_longest_repeated_substring",
    # SemDeDup under the production discipline: n_cells scales with N
    # (constant expected cell size ≈250), so the quadratic-in-cell pair
    # stage does ~constant work per cell and TOTAL work grows ~k. The
    # registered dedup_semantic runs on the capped fixture (constant work
    # by design); this entry is the uncapped scale proof. eps-level
    # matches barely exist in the near-random corpus, but the engine cost
    # (assignment + intra-cell scoring) is match-independent. k-means
    # training with k ∝ N over N points is itself superlinear — at real
    # scale you train on a bounded sample; the scoring path is what this
    # harness measures, so training time is EXCLUDED from the wall (the
    # centroid table is built once, outside the timer).
    "dedup_semantic_scaled",
    # DSIR: the replica token renaming keeps per-replica bucket profiles
    # structurally identical while the lang column is copied verbatim, so
    # target/pool feature streams both grow exactly k×; the log-ratio
    # table stays B-bounded (512 rows) regardless of scale, so the wall
    # should track the explode+partial-agg stages ~linearly
    "docs_dsir_select",
    # BPE: the replica token renaming grows the word VOCABULARY ~k×, so
    # the corpus-sized word-count pass grows k× while the merge rounds
    # stay top-V-bounded by construction — the wall should track the
    # count pass, not the rounds
    "text_bpe_learn",
    # CCNet bigram LM: bigram stream grows k×; the model table stays
    # B²-bounded and broadcast; tertile cut machinery moves one histogram
    # row per distinct score — ~linear end to end
    "docs_ccnet_perplexity_buckets",
    # NB language-ID: feature stream grows k×; the (L·B)-bounded model is
    # broadcast; argmax windows partition per doc — ~linear
    "docs_nb_langid_confusion",
    # inverted index: the posting stream grows k× but the per-token cap
    # (rank-limit pushdown) keeps every task's sort K-bounded
    "text_inverted_index",
    # containment join: replica token renaming keeps the per-replica
    # shingle df profile identical while cross-replica shingles are
    # disjoint, so rare-shingle candidates (and answers) grow exactly k×
    "dedup_containment_pairs",
]


_SEMDEDUP_CENTS: dict[str, object] = {}


def _semdedup_scaled_build(spark, sf_dir: str):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F  # noqa: N812

    from yanwenxian_week3_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if sf_dir not in _SEMDEDUP_CENTS:
        n = emb.count()
        feats = emb.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
        )
        model = KMeans(k=max(8, n // 250), seed=42, maxIter=10).fit(feats)
        _SEMDEDUP_CENTS[sf_dir] = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cell int, cell_vec array<float>",
        )
    return semantic_dedup(
        emb, 0.9, centroids=_SEMDEDUP_CENTS[sf_dir], max_cell_rows=4000
    )


EXTRA_BUILDS = {"dedup_semantic_scaled": _semdedup_scaled_build}


def generate(spark, base_dir: str, out_dir: str, k: int) -> None:
    from pyspark.sql import functions as F  # noqa: N812

    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = spark.range(k).withColumnRenamed("id", "rep")

    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(F.lit("r"), F.col("rep"), F.lit("_"), t),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
            F.when(F.col("rep") == 0, F.col("n_chars"))
            .otherwise(
                F.col("n_chars")
                + F.size(F.split("text", " ")) * (F.length(F.col("rep").cast("string")) + 2)
            )
            .alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n_vecs).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.element_at(
                    "embedding",
                    ((i + F.col("rep") * 11) % F.size("embedding") + 1).cast("int"),
                ),
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )


def main() -> None:
    # Usage: stress_llm.py [base_sf_dir] [out_root] [query_prefix ...]
    # Timing protocol (r6): one warm run (plan + shuffle files + JIT),
    # then MEDIAN OF 3 timed runs per (query, scale). The r5 harness
    # timed a single run right after corpus generation, and the 1x base
    # — measured first, on the coldest JVM — could read ~2x slow,
    # inflating every wall(k)/wall(1) ratio (ROUND5.md saw 6.15x for
    # docs_lrs_capped cold vs 3.4-4.2x warm re-measures).
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/llm_scale"
    prefixes = sys.argv[3:]
    queries = [
        q for q in QUERIES if not prefixes or any(q.startswith(p) for p in prefixes)
    ]

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("stress_llm")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    walls: dict[str, dict[int, float]] = {q: {} for q in queries}
    for k in SCALES:
        out = f"{root}_{k}x"
        generate(spark, base, out, k)
        n_docs = spark.read.parquet(f"{out}/documents.parquet").count()
        n_vecs = spark.read.parquet(f"{out}/embeddings.parquet").count()
        print(f"-- scale {k}x: {n_docs} docs / {n_vecs} vectors")
        for name in queries:
            build = EXTRA_BUILDS.get(name) or qs[name].build
            build(spark, out).count()  # warm (plan + shuffle files)
            samples = []
            for _ in range(3):
                t0 = time.time()
                rows = build(spark, out).count()
                samples.append(time.time() - t0)
            dt = sorted(samples)[1]
            walls[name][k] = dt
            print(
                f"{name}: {dt:.2f}s (3 warm: "
                f"{' '.join(f'{s:.2f}' for s in samples)}) rows={rows} "
                f"docs_per_s={n_docs / dt:,.0f}"
            )

    print("-- linearity (wall(k)/wall(1) vs k; ~k = linear, ~k^2 = quadratic)")
    for name in queries:
        w1 = walls[name][SCALES[0]]
        ratios = " ".join(f"{k}x:{walls[name][k] / w1:.2f}" for k in SCALES)
        print(f"{name}: {ratios}")


if __name__ == "__main__":
    main()
