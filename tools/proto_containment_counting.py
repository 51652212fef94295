"""Prototype + interleaved A/B: counting-identity verify for
dedup_containment_pairs (r10 evidence package; adoption queued for r11).

Committed shape: rare-postings self-join -> 1.13M distinct candidate
pairs (sf0.1) -> verify by joining the full shingle arrays twice and
array_intersect. Measured decomposition (OPTIMIZATION_r10.md): candidate
gen + verify is 70% of an ~11.1s wall; the df<=64 "rare" filter removes
only 207 of 260,388 postings at this corpus.

Counting-identity shape (exact — shingles are DISTINCT per doc, so
postings are unique (id, s) rows and the per-pair co-occurrence count IS
the intersection; the dedup_minhash_recall GT precedent):
  n_rare   = groupBy(id_a, id_b).count() over rare postings
  n_common = count over the <=207-row common postings (broadcast),
             computed only for pairs surviving the SOUND pre-filter
             n_rare + C_common_total >= t * min(|A|, |B|)
             (n_inter can never exceed its rare part plus the
             corpus-wide number of distinct common shingles)
  n_inter  = n_rare + n_common;  containment/jaccard as committed.
No shingle arrays shipped, two scans dropped, identical output.

Measured (interleaved, 6 rounds, sf0.1, results asserted bit-identical,
256 rows): committed 8.442s vs counting 6.166s — -27%, counting won all
6 rounds with fully separated samples (max 7.155 < committed min 7.197).

Usage: python tools/proto_containment_counting.py [sf_dir] [rounds=6]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def counting_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.constants import (
        CONTAIN_MAX_DF,
        CONTAIN_THRESHOLD,
    )
    from yanwenxian_week3_data_pipeline_spark.operators.dedup import doc_shingles
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import _cleaned_docs

    t = CONTAIN_THRESHOLD
    docs = _cleaned_docs(spark, sf_dir).select("doc_id", "c")
    sh = doc_shingles(docs, "c", "doc_id")
    posts = sh.select("id", F.explode("shingles").alias("s"))
    dfc = posts.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    rare = dfc.where((F.col("n") >= 2) & (F.col("n") <= CONTAIN_MAX_DF)).select("s")
    common = dfc.where(F.col("n") > CONTAIN_MAX_DF).select("s")
    posts_r = posts.join(rare, "s", "left_semi")
    a, b = posts_r.alias("a"), posts_r.alias("b")
    n_rare = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    sizes = sh.select("id", F.size("shingles").alias("n"))
    c_tot = common.agg(F.count(F.lit(1)).alias("c_tot"))
    cand = (
        n_rare.join(F.broadcast(sizes.withColumnsRenamed({"id": "id_a", "n": "na"})), "id_a")
        .join(F.broadcast(sizes.withColumnsRenamed({"id": "id_b", "n": "nb"})), "id_b")
        .crossJoin(F.broadcast(c_tot))
        .where((F.col("n_rare") + F.col("c_tot")) >= F.lit(t) * F.least("na", "nb"))
    )
    posts_c = posts.join(F.broadcast(common), "s", "left_semi")
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
            "n_inter", (F.col("n_rare") + F.coalesce("n_common", F.lit(0))).cast("long")
        )
        .withColumn(
            "containment", F.round(F.col("n_inter") / F.least("na", "nb").cast("long"), 6)
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("long"),
                6,
            ),
        )
        .where(F.col("containment") >= t)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("contain-proto")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["dedup_containment_pairs"]

    ra = sorted(map(str, spec.build(spark, sf_dir).collect()))
    rb = sorted(map(str, counting_variant(spark, sf_dir).collect()))
    print(f"rows {len(ra)} vs {len(rb)} identical: {ra == rb}", flush=True)
    if ra != rb:
        sa, sb = set(ra), set(rb)
        print("only committed:", sorted(sa - sb)[:3])
        print("only variant:", sorted(sb - sa)[:3])
        return 1

    def run(which: str) -> float:
        df = spec.build(spark, sf_dir) if which == "committed" else counting_variant(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("committed"), run("counting")  # cold
    walls: dict[str, list[float]] = {"committed": [], "counting": []}
    for r in range(rounds):
        order = ("committed", "counting") if r % 2 == 0 else ("counting", "committed")
        for v in order:
            walls[v].append(run(v))
        print(
            f"round {r + 1}/{rounds}: committed={walls['committed'][-1]:.3f}"
            f" counting={walls['counting'][-1]:.3f}",
            flush=True,
        )
    for v, w in walls.items():
        s = sorted(w)
        print(f"{v}: median {statistics.median(s):.3f}s samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
