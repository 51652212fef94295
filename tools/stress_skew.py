"""Skew stress: synthesize an event fact where ONE key owns half the rows
(the shape AQE's partition-split can't fully fix when a single key exceeds
a partition) and time the salted operators against their naive twins.

The numbers in README "Scale notes" come from this harness. The groupBy
comparison runs the SAME count+sum aggregate both ways (naive vs salted)
— plain count/sum group-bys get map-side partial aggregation for free, so
expect parity there; the join comparison is run twice, with AQE's skew
split active and disabled, because that switch is where salting matters.

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

    from yanwenxian_week3_data_pipeline_spark.operators.salt import (
        auto_skew_join,
        estimate_top_key_share,
        salted_agg,
        salted_join,
    )
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

    # --- aggregation: IDENTICAL count+sum computed naive vs salted --------
    timed(
        "naive groupBy count+sum",
        lambda: fact.groupBy("k").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,3)")).alias("sv"),
        ).count(),
    )
    timed(
        "salted_agg count+sum",
        lambda: salted_agg(fact, ["k"], {"sv": F.col("v").cast("decimal(18,3)")}).count(),
    )

    # --- skewed join: plain vs salted, with AQE skew-split on AND off -----
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    try:
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            label = "AQE skew-split active" if aqe == "true" else "AQE OFF"
            timed(
                f"plain shuffle join on skewed key ({label})",
                lambda: fact.join(dim, "k").groupBy().count().collect()[0][0],
            )
            timed(
                f"salted_join 8 buckets ({label})",
                lambda: salted_join(fact, dim, "k").groupBy().count().collect()[0][0],
            )
            timed(
                f"auto_skew_join guarded ({label})",
                lambda: auto_skew_join(fact, dim, "k").groupBy().count().collect()[0][0],
            )
        share = estimate_top_key_share(fact, "k")
        print(f"sampled top-key share: {share:.3f} (threshold 0.2 -> salted branch)")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


if __name__ == "__main__":
    main()
