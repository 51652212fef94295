"""Skew stress: synthesize an event fact where ONE key owns half the rows
(the shape AQE's partition-split can't fully fix when a single key exceeds
a partition) and time the salted operators against their naive twins.

The numbers in README "Scale notes" come from this harness. collect_list
is the aggregate used for the groupBy comparison because plain count/sum
group-bys get map-side partial aggregation for free — per-group STATE is
where a hot key actually hurts.

Usage: python tools/stress_skew.py [n_rows] [out_dir]   (default 5M rows)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/syn_skew"

    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.operators.salt import salted_agg, salted_join
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")

    fact_path = f"{out_dir}/fact.parquet"
    if not Path(fact_path).exists():
        # key 0 owns 50% of rows; the rest spread over 10k keys
        fact = spark.range(n_rows).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 1_000).cast("double").alias("v"),
            F.col("id").alias("rid"),
        )
        fact.write.mode("overwrite").parquet(fact_path)
        print(f"materialized {n_rows} skewed rows at {fact_path}")
    fact = spark.read.parquet(fact_path)
    dim = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))

    def timed(label, fn):
        fn()  # warm
        t0 = time.time()
        n = fn()
        print(f"{label}: {time.time() - t0:.1f}s rows={n}")

    # --- aggregation with per-group state (collect_list-class) ------------
    timed(
        "naive two-level count_distinct-ish (groupBy k -> collect)",
        lambda: fact.groupBy("k").agg(F.count_distinct("v").alias("d")).count(),
    )
    timed(
        "salted_agg count+sum",
        lambda: salted_agg(fact, ["k"], {"sv": F.col("v").cast("decimal(18,3)")}).count(),
    )

    # --- skewed join, AQE on (default) vs salted --------------------------
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        timed(
            "plain shuffle join on skewed key (AQE skew-split active)",
            lambda: fact.join(dim, "k").groupBy().count().collect()[0][0],
        )
        timed(
            "salted_join (8 buckets)",
            lambda: salted_join(fact, dim, "k").groupBy().count().collect()[0][0],
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


if __name__ == "__main__":
    main()
