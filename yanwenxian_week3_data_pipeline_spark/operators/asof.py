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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """Nearest as-of left join: each left row matches the right row with the
    smallest |on_left - on_right| within the ``by`` key; ties prefer the
    backward (earlier-or-equal) match.

    Same union-tag shape as ``asof_join`` but carried in BOTH directions:
    the backward pass is ``last(..., ignoreNulls)`` over the running window,
    the forward pass is ``first(..., ignoreNulls)`` over the mirrored
    window. Both windows share the one shuffle on ``by``; picking the
    nearer side is a row-local projection. Still one shuffle over |L|+|R| —
    a naive |diff|-min join would be a range explosion.
    """
    import pyspark.sql.types as T

    r_payload = [c for c in right.columns if c != by]
    l_cols = left.columns

    def ord_num(col: F.Column, dtype) -> F.Column:
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(col.cast("timestamp"))
        return col.cast("double")

    tagged_left = left.select(
        F.col(by),
        F.col(on).alias("_ord"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c != by],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in r_payload
        ],
    )
    tagged_right = right.select(
        F.col(by),
        F.col(on).alias("_ord"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != by],
        *[F.col(c).alias(f"_r_{c}") for c in r_payload],
    )
    unioned = tagged_left.unionByName(tagged_right)

    wb = (
        Window.partitionBy(by)
        .orderBy(F.col("_ord").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(F.col("_ord").asc(), F.col("_side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        by,
        "_side",
        "_ord",
        *[c for c in l_cols if c != by],
        *[F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}") for c in r_payload],
        *[F.first(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}") for c in r_payload],
    )
    on_dtype = right.schema[on].dataType
    me = ord_num(F.col("_ord"), on_dtype)
    bd = me - ord_num(F.col(f"_b_{on}"), on_dtype)
    fd = ord_num(F.col(f"_f_{on}"), on_dtype) - me
    # backward wins ties; a missing side loses automatically via null checks
    use_b = F.col(f"_b_{on}").isNotNull() & (F.col(f"_f_{on}").isNull() | (bd <= fd))
    picked = carried.where(F.col("_side") == 1).select(
        by,
        *[c for c in l_cols if c != by],
        *[
            F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")).alias(f"{right_prefix}{c}")
            for c in r_payload
        ],
    )
    return picked
