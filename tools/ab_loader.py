"""Interleaved fan-out-vs-plain loader A/B for a registered query.

The r9 lesson (join_region_revenue): the scan fan-out's round-robin
repartition is a measured WIN for map-heavy first consumers (q1-class
scan+partial-agg) and a pure extra exchange of the table when the first
consumer is a key shuffle. This harness measures one query both ways,
interleaved A/B/A/B within one session so JIT warmth and machine load hit
both variants equally, and prints warm medians.

Usage:
    python tools/ab_loader.py <sf_dir> <query_name> [rounds=6]

Variant A = the registered plan as committed (whatever loader it uses).
Variant B = the SAME plan with the defining module's ``_t`` monkeypatched
to a plain ``spark.read.parquet`` (no fan-out). If the committed plan
already uses a plain loader for a table, A and B coincide for that table.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from pyspark.sql import DataFrame, SparkSession

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spec = all_queries()[name]
    mod = sys.modules[spec.build.__module__]
    if not hasattr(mod, "_t"):
        print(f"{name}: defining module {mod.__name__} has no _t loader")
        return 2
    orig_t = mod._t

    def plain_t(spark: SparkSession, sf: str, table: str) -> DataFrame:
        return spark.read.parquet(f"{sf}/{table}.parquet")

    spark = get_spark("ab_loader")
    spark.sparkContext.setLogLevel("ERROR")

    def run(variant: str) -> float:
        mod._t = plain_t if variant == "plain" else orig_t
        try:
            t0 = time.time()
            spec.build(spark, sf_dir).collect()
            return time.time() - t0
        finally:
            mod._t = orig_t

    def load1m() -> str:
        try:
            with open("/proc/loadavg") as f:
                return f.read().split()[0]
        except (OSError, ValueError, IndexError):
            return "?"

    # one throwaway cold run per variant so JIT/codegen of shared stages is
    # paid before any counted sample
    run("fanout")
    run("plain")
    walls: dict[str, list[float]] = {"fanout": [], "plain": []}
    for r in range(rounds):
        order = ("fanout", "plain") if r % 2 == 0 else ("plain", "fanout")
        for v in order:
            walls[v].append(run(v))
        print(
            f"round {r + 1}/{rounds}: fanout={walls['fanout'][-1]:.3f}"
            f" plain={walls['plain'][-1]:.3f} load={load1m()}",
            flush=True,
        )
    for v in ("fanout", "plain"):
        s = sorted(walls[v])
        med = statistics.median(s)
        iqr = s[(3 * len(s)) // 4] - s[len(s) // 4]
        print(f"{name} {v}: median {med:.3f}s iqr {iqr:.3f} samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
