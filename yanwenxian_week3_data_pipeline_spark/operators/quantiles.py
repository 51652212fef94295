"""Exact rank-based cut values without a global sort.

``exact_rank_cuts`` finds, for each requested fraction num/den, the value
of the ceil(n·num/den)-th row (1-indexed, ascending) of a column — the
exact order statistic — using the histogram-cumsum formulation factored
out of the round-3 equidepth rewrite (plans/curation_ext.py):

  1. value histogram (groupBy value — the only corpus-sized shuffle,
     map-side combinable),
  2. repartitionByRange + sortWithinPartitions on the value, cut to an
     EAGER localCheckpoint so the range partitioning is pinned across the
     offsets-collect job and the cumsum job (RangePartitioner re-samples
     per job otherwise — the ADVICE-r3 pipeline.py lesson),
  3. per-partition subtotals collected (K-bounded: one row per
     partition), converted to running offsets on the driver,
  4. a mapInPandas running cumsum over the sorted histogram,
  5. a broadcast join of the K targets against the [cum_lo, cum_hi)
     containment intervals.

No single-partition exchange anywhere; the collect is O(partitions).
Ties are handled by construction: equal values are one histogram row, so
every engine picks the same cut value for a target that lands inside it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def exact_rank_cuts(
    df: DataFrame, col: str, fractions: Sequence[tuple[int, int]]
) -> DataFrame:
    """Exact order-statistic values of ``df[col]`` at ranks
    ceil(n·num/den) for each (num, den) in ``fractions``.
    Returns (cut_id int — 1-based position in ``fractions``, cut)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    dtype = df.schema[col].dataType.simpleString()
    hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    nparts = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        hist.repartitionByRange(nparts, col)
        .sortWithinPartitions(col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = {
        int(r["_pid"]): int(r["s"])
        for r in ranged.groupBy("_pid").agg(F.sum("cnt").alias("s")).collect()
    }
    n = sum(psums.values())
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]

    def running_cum(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            c = pdf["cnt"].to_numpy()
            hi = run + np.cumsum(c)
            run = int(hi[-1])
            yield pd.DataFrame({col: pdf[col], "cnt": c, "cum_hi": hi})

    cum = ranged.mapInPandas(running_cum, f"{col} {dtype}, cnt long, cum_hi long")
    targets = spark.createDataFrame(
        [
            (i + 1, max(1, (n * num + den - 1) // den))
            for i, (num, den) in enumerate(fractions)
        ],
        "cut_id int, target long",
    )
    return cum.join(
        F.broadcast(targets),
        (F.col("cum_hi") >= F.col("target"))
        & (F.col("cum_hi") - F.col("cnt") < F.col("target")),
    ).select("cut_id", F.col(col).alias("cut"))
