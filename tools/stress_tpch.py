"""Relational scale stress: replicate sf0.1's fact tables K× (order keys
shifted per replica so orders↔lineitem join integrity holds; dimension keys
untouched so star joins still resolve) and time the headline relational
queries at each scale. Linear wall-clock growth here is the evidence that
the plan shapes (broadcast dims, single fact shuffle, pushdown) hold as
data outgrows the bench point.

Usage: python tools/stress_tpch.py [K] [out_dir]   (default K=10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q18_large_volume_orders",
    "join_region_revenue",
    "q21_waiting_suppliers",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/syn_tpch"

    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-tpch")
    spark.sparkContext.setLogLevel("ERROR")

    out = Path(out_dir)
    src_li_rows = spark.read.parquet(f"{SRC}/lineitem.parquet").count()
    cached_ok = (
        (out / "lineitem.parquet").exists()
        and spark.read.parquet(f"{out_dir}/lineitem.parquet").count() == k * src_li_rows
    )
    if not cached_ok:
        out.mkdir(parents=True, exist_ok=True)
        orders = spark.read.parquet(f"{SRC}/orders.parquet")
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        shift = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
        o_parts = [
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * shift))
            for i in range(k)
        ]
        l_parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
            for i in range(k)
        ]
        o_all, l_all = o_parts[0], l_parts[0]
        for o_p, l_p in zip(o_parts[1:], l_parts[1:]):
            o_all, l_all = o_all.unionByName(o_p), l_all.unionByName(l_p)
        o_all.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
        l_all.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
        for t in ("region", "nation", "customer", "supplier", "part"):
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
                f"{out_dir}/{t}.parquet"
            )
        print(f"materialized {k}x sf0.1 facts in {out_dir}")

    qs = all_queries()
    n_li = spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    print(f"lineitem rows: {n_li}")
    for name in QUERIES:
        # warm run after a cold run; report both
        t0 = time.time()
        qs[name].build(spark, out_dir).count()
        cold = time.time() - t0
        t0 = time.time()
        n = qs[name].build(spark, out_dir).count()
        print(f"{name}: cold={cold:.1f}s warm={time.time() - t0:.1f}s rows={n}")


if __name__ == "__main__":
    main()
