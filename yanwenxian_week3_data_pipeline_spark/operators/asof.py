"""As-of (backward) join — an operator Spark's DataFrame API lacks natively.

``asof_join(left, right, on, by)`` matches every left row to the single
right row with the greatest ``on`` value ≤ the left row's, within the same
``by`` key (left-join semantics: unmatched left rows keep nulls).

Execution shape (the scale path, equivalent to a sort-merge as-of):
  1. tag both sides and union them into one frame (right side sorts FIRST
     at equal timestamps so an exactly-simultaneous right row is visible);
  2. one shuffle on ``by``, sort by (on, side) inside each partition;
  3. ``last(right_col, ignoreNulls)`` over the running window carries the
     latest right values forward;
  4. keep the left rows.

One shuffle + one sort over |L| + |R| rows — no range-explosion join, no
per-key collect. This is the standard streaming/merge formulation; a naive
``l JOIN r ON l.by = r.by AND r.ts <= l.ts`` + max-window would shuffle
|L|·avg-matches rows instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of left join. Right-side payload columns (everything but
    ``by``) come back prefixed with ``right_prefix``; the matched right
    ``on`` value is ``{right_prefix}{on}``."""
    r_payload = [c for c in right.columns if c != by]  # includes `on`
    l_cols = left.columns

    tagged_left = left.select(
        F.col(by),
        F.col(on).alias("_ord"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c not in (by,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}") for c in r_payload],
    )
    tagged_right = right.select(
        F.col(by),
        F.col(on).alias("_ord"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in (by,)],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )
    unioned = tagged_left.unionByName(tagged_right)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_ord").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        by,
        "_side",
        *[c for c in l_cols if c not in (by,)],
        *[
            F.last(f"{right_prefix}{c}", ignorenulls=True).over(w).alias(f"{right_prefix}{c}")
            for c in r_payload
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
