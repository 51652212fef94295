"""Prototype + interleaved A/B: q18 shuffle-byte narrowing (VERDICT r10
next-round item 5, guide §2.3 "narrower types").

Committed q18 shuffles (l_orderkey, partial sum of decimal(18,1)) — the
decimal(28,1) sum buffer is a 16-byte non-compact decimal in the shuffle
row. The variant sums the EXACT scaled integer cast(qty_dec * 10 as
long) (qty_dec = the same cast(l_quantity as decimal(18,1)) the
committed query quantizes through, so *10 is exact at scale 1 and the
long sum is exact — per-order sums are bounded by 7 lineitems x 50) and
rescales once per group: (sum_scaled::decimal(27,0) * 0.1::decimal(2,1))
— an exact product at scale 1. Same values; the top-level decimal is
canonicalized to double by the registry either way.

Usage: python tools/proto_q18_narrow.py [sf_dir] [rounds=6]
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
    from yanwenxian_week3_data_pipeline_spark.plans.tpch_shapes import (
        _t,
        _t_shuffle_input,
    )

    li = _t_shuffle_input(spark, sf_dir, "lineitem")
    orders = _t_shuffle_input(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    scaled = (F.col("l_quantity").cast("decimal(18,1)") * 10).cast("long")
    total = (
        F.col("_sq").cast("decimal(27,0)") * F.lit("0.1").cast("decimal(2,1)")
    ).cast("decimal(28,1)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(scaled).alias("_sq"))
        .select("l_orderkey", total.alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return canonical_projection(
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(
            _gated_dim(cust.select("c_custkey", "c_name"), sf_dir, "customer"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("q18-narrow-proto")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["q18_large_volume_orders"]

    ra = sorted(map(str, spec.build(spark, sf_dir).collect()))
    rb = sorted(map(str, narrow_variant(spark, sf_dir).collect()))
    print(f"rows {len(ra)} vs {len(rb)} identical: {ra == rb}", flush=True)
    if ra != rb:
        sa, sb = set(ra), set(rb)
        print("only committed:", sorted(sa - sb)[:3])
        print("only variant:", sorted(sb - sa)[:3])
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
