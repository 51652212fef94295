"""Interleaved A/B: landed counting-identity dedup_containment vs the same
shape with the shingle df-count table (dfc) cut to an eager
localCheckpoint. Motivation: the landed plan's census shows the
posts->groupBy(s) document-frequency pipeline re-expanded in SIX branches
(rare x2 self-join sides, common x2 posts_c sides, plus the rare/common
splits themselves) because per-branch column pruning de-unifies the
subtrees and exchange reuse does not kick in (the docs_lrs r7 lesson).
dfc is vocabulary-sized (distinct shingles: 260k rows at sf0.1), so one
materialization could replace ~6 corpus scans + their exchanges.

Usage: python tools/ab_containment_ckpt.py [sf_dir] [rounds=6]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ckpt_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.constants import (
        CONTAIN_MAX_DF,
        CONTAIN_THRESHOLD,
    )
    from yanwenxian_week3_data_pipeline_spark.operators.dedup import doc_shingles
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import _cleaned_docs
    from yanwenxian_week3_data_pipeline_spark.plans.relational import _gated_dim

    threshold, max_df = CONTAIN_THRESHOLD, CONTAIN_MAX_DF
    hint = lambda side: _gated_dim(side, sf_dir, "documents")
    df = _cleaned_docs(spark, sf_dir).select("doc_id", "c")
    sh = doc_shingles(df, "c", "doc_id")
    posts = sh.select("id", F.explode("shingles").alias("s"))
    dfc = (
        posts.groupBy("s").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    )
    rare = dfc.where((F.col("n") >= 2) & (F.col("n") <= max_df)).select("s")
    common = dfc.where(F.col("n") > max_df).select("s")
    posts_r = posts.join(rare, "s", "left_semi")
    a, b = posts_r.alias("a"), posts_r.alias("b")
    n_rare = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    sizes = sh.select("id", F.size("shingles").alias("n"))
    c_tot = common.agg(F.count(F.lit(1)).alias("c_tot"))
    min_n = F.least("na", "nb").cast("long")
    cand = (
        n_rare.join(hint(sizes.withColumnsRenamed({"id": "id_a", "n": "na"})), "id_a")
        .join(hint(sizes.withColumnsRenamed({"id": "id_b", "n": "nb"})), "id_b")
        .crossJoin(F.broadcast(c_tot))
        .where(F.round((F.col("n_rare") + F.col("c_tot")) / min_n, 6) >= threshold)
    )
    posts_c = posts.join(hint(common), "s", "left_semi")
    n_common = (
        cand.select("id_a", "id_b")
        .join(posts_c.withColumnsRenamed({"id": "id_a"}), "id_a")
        .join(posts_c.withColumnsRenamed({"id": "id_b"}), ["s", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        cand.join(n_common, ["id_a", "id_b"], "left")
        .withColumn(
            "n_inter",
            (F.col("n_rare") + F.coalesce("n_common", F.lit(0))).cast("long"),
        )
        .withColumn("containment", F.round(F.col("n_inter") / min_n, 6))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("long"),
                6,
            ),
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import (
        get_spark,
        release_persistent_rdds,
    )

    spark = get_spark("contain-ab-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["dedup_containment_pairs"]

    ra = sorted(map(str, spec.build(spark, sf_dir).collect()))
    rb = sorted(map(str, ckpt_variant(spark, sf_dir).collect()))
    release_persistent_rdds(spark)
    print(f"rows {len(ra)} vs {len(rb)} identical: {ra == rb}", flush=True)
    if ra != rb:
        return 1

    def run(which: str) -> float:
        df = spec.build(spark, sf_dir) if which == "landed" else ckpt_variant(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_persistent_rdds(spark)
        return wall

    run("landed"), run("ckpt")  # cold
    walls: dict[str, list[float]] = {"landed": [], "ckpt": []}
    for r in range(rounds):
        order = ("landed", "ckpt") if r % 2 == 0 else ("ckpt", "landed")
        for v in order:
            walls[v].append(run(v))
        print(
            f"round {r + 1}/{rounds}: landed={walls['landed'][-1]:.3f}"
            f" ckpt={walls['ckpt'][-1]:.3f}",
            flush=True,
        )
    for v, w in walls.items():
        s = sorted(w)
        print(f"{v}: median {statistics.median(s):.3f}s samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
