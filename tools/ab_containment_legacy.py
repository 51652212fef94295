"""Interleaved A/B: the LANDED counting-identity dedup_containment (r11)
vs the r10 LEGACY array-intersect formulation (inlined below verbatim from
the pre-r11 operators/dedup.py), asserting bit-identical results first.

The r10 prototype measured the same comparison the other way round
(tools/proto_containment_counting.py: committed-legacy 8.442 s vs
counting 6.166 s at sf0.1, −27 %, 6/6 rounds separated samples; sf0.01
INVERTED — fixed join overhead dominates tiny candidate sets). This tool
re-certifies the landed operator against the legacy shape at any scale,
in particular sf1 where the win should grow with Σdf².

Usage: python tools/ab_containment_legacy.py [sf_dir] [rounds=6]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def legacy_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.constants import (
        CONTAIN_MAX_DF,
        CONTAIN_THRESHOLD,
    )
    from yanwenxian_week3_data_pipeline_spark.operators.dedup import doc_shingles
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import _cleaned_docs

    threshold, max_df = CONTAIN_THRESHOLD, CONTAIN_MAX_DF
    df = _cleaned_docs(spark, sf_dir).select("doc_id", "c")
    sh = doc_shingles(df, "c", "doc_id")
    posts = sh.select("id", F.explode("shingles").alias("s"))
    rare = (
        posts.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= max_df))
        .select("s")
    )
    posts_r = posts.join(rare, "s", "left_semi")
    a, b = posts_r.alias("a"), posts_r.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        )
        .withColumn(
            "containment",
            F.round(
                F.col("n_inter")
                / F.least(F.size("sh_a"), F.size("sh_b")).cast("long"),
                6,
            ),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (
                    F.size("sh_a") + F.size("sh_b") - F.col("n_inter")
                ).cast("long"),
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
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("contain-ab-legacy")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["dedup_containment_pairs"]

    ra = sorted(map(str, spec.build(spark, sf_dir).collect()))
    rb = sorted(map(str, legacy_variant(spark, sf_dir).collect()))
    print(f"rows {len(ra)} vs {len(rb)} identical: {ra == rb}", flush=True)
    if ra != rb:
        sa, sb = set(ra), set(rb)
        print("only counting:", sorted(sa - sb)[:3])
        print("only legacy:", sorted(sb - sa)[:3])
        return 1

    def run(which: str) -> float:
        df = spec.build(spark, sf_dir) if which == "counting" else legacy_variant(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def load1m() -> str:
        try:
            with open("/proc/loadavg") as f:
                return f.read().split()[0]
        except (OSError, ValueError, IndexError):
            return "?"

    run("legacy"), run("counting")  # cold
    walls: dict[str, list[float]] = {"legacy": [], "counting": []}
    for r in range(rounds):
        order = ("legacy", "counting") if r % 2 == 0 else ("counting", "legacy")
        for v in order:
            walls[v].append(run(v))
        print(
            f"round {r + 1}/{rounds}: legacy={walls['legacy'][-1]:.3f}"
            f" counting={walls['counting'][-1]:.3f} load={load1m()}",
            flush=True,
        )
    for v, w in walls.items():
        s = sorted(w)
        print(f"{v}: median {statistics.median(s):.3f}s samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
