"""Prototype + interleaved A/B: q9 shuffle-byte narrowing (VERDICT r10
next-round item 5, guide §2.3 "project before the exchange").

Committed q9 carries the RAW profit inputs (l_quantity, l_extendedprice,
l_discount, p_retailprice, n_name) through the orderkey exchange feeding
the lineitem⋈orders sort-merge join (broadcast at sf0.1; SMJ at sf1+)
and evaluates the profit expression in the aggregate. The variant
evaluates the per-row profit DECIMAL right after the broadcast probes —
decimal arithmetic is per-row and exact, so evaluating it before or
after the join is the same function — and ships (l_orderkey, n_name,
profit) instead; the orders side likewise pre-projects year(o_orderdate)
(int) instead of the timestamp.

Usage: python tools/proto_q9_narrow.py [sf_dir] [rounds=6]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def narrow_variant(spark, sf_dir):
    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.plans import canonical_projection
    from yanwenxian_week3_data_pipeline_spark.plans.relational import _gated_dim
    from yanwenxian_week3_data_pipeline_spark.plans.tpch_depth import (
        DEC,
        QTY,
        _revenue,
        _t,
        _t_shuffle_input,
    )

    li = _t_shuffle_input(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t_shuffle_input(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    cost = F.col("p_retailprice").cast(DEC) * F.lit("0.8").cast("decimal(2,1)")
    profit = _revenue() - F.col("l_quantity").cast(QTY) * cost
    return canonical_projection(
        li.join(_gated_dim(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(_gated_dim(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(li.l_orderkey.alias("l_orderkey"), F.col("n_name"), profit.alias("_profit"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year").alias("o_year"))
        .agg(F.sum("_profit").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("q9-narrow-proto")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["q9_product_profit"]

    ra = [tuple(r) for r in spec.build(spark, sf_dir).collect()]
    rb = [tuple(r) for r in narrow_variant(spark, sf_dir).collect()]
    print(f"rows {len(ra)} vs {len(rb)} identical (ordered): {ra == rb}", flush=True)
    if ra != rb:
        print("first diff:", next((x, y) for x, y in zip(ra, rb) if x != y))
        return 1

    def run(which: str) -> float:
        df = spec.build(spark, sf_dir) if which == "committed" else narrow_variant(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("committed"), run("narrow")  # cold
    walls: dict[str, list[float]] = {"committed": [], "narrow": []}
    for r in range(rounds):
        order = ("committed", "narrow") if r % 2 == 0 else ("narrow", "committed")
        for v in order:
            walls[v].append(run(v))
        print(
            f"round {r + 1}/{rounds}: committed={walls['committed'][-1]:.3f}"
            f" narrow={walls['narrow'][-1]:.3f}",
            flush=True,
        )
    for v, w in walls.items():
        s = sorted(w)
        print(f"{v}: median {statistics.median(s):.3f}s samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
