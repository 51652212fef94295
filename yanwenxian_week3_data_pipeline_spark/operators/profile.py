"""One-pass table profiler — the reference's per-column completeness
report (cleaner.py:193-202) generalized to any table: for every column,
null ratio, distinct count, and min/max, computed in a SINGLE scan.

Shape: one wide ``agg`` row (count + per-column count/countDistinct/
min/max) pivoted to one output row per column with ``stack``. At 100 TB
the one-scan property is the point — a per-column loop of ``describe``
style queries re-reads the table N times. Exact ``countDistinct`` over
many columns plans one Expand (rows × #distinct-aggs) before the
aggregate; for wide tables at scale switch ``exact_distinct=False`` to
``approx_count_distinct`` which needs no Expand.

Numeric (floating) min/max are surfaced as DECIMAL(18,6) strings so the
profile is engine-portable (double→string rendering differs between
engines; a fixed-scale decimal does not)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType, FloatType


def _to_str(c: Column, is_float: bool) -> Column:
    return (c.cast("decimal(18,6)") if is_float else c).cast("string")


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    cols = cols or df.columns
    floats = {
        f.name for f in df.schema.fields if isinstance(f.dataType, (DoubleType, FloatType))
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        v = F.col(c)
        nd = F.countDistinct(v) if exact_distinct else F.approx_count_distinct(v)
        aggs += [
            F.count(v).alias(f"_nn_{c}"),
            nd.alias(f"_nd_{c}"),
            F.min(v).alias(f"_mn_{c}"),
            F.max(v).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = []
    for c in cols:
        stacked += [
            F.lit(c),
            F.col(f"_nn_{c}"),
            F.col(f"_nd_{c}"),
            _to_str(F.col(f"_mn_{c}"), c in floats),
            _to_str(F.col(f"_mx_{c}"), c in floats),
        ]
    return row.select(
        F.col("_n").alias("n_rows"),
        F.stack(F.lit(len(cols)), *stacked).alias(
            "column_name", "n_nonnull", "n_distinct", "min_str", "max_str"
        ),
    )
