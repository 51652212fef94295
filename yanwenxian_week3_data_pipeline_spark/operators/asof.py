"""As-of joins — operators Spark's DataFrame API lacks natively.

``asof_join(left, right, on, by)`` matches every left row to the single
right row with the greatest ``on`` value ≤ the left row's, within the same
``by`` key (left-join semantics: unmatched left rows keep nulls).
``asof_join_nearest`` matches the right row with the smallest |Δon| in
either direction (backward wins ties).

Execution shape (the scale path, equivalent to a sort-merge as-of):
  1. tag both sides and union them into one frame (right side sorts FIRST
     at equal timestamps so an exactly-simultaneous right row is visible);
  2. one shuffle on ``by``, sort by (on, side) inside each partition;
  3. carry the right side's payload over the running window — as ONE
     struct, so every output row's payload fields come from the SAME right
     row even when individual payload columns are null;
  4. keep the left rows.

One shuffle + one sort over |L| + |R| rows — no range-explosion join, no
per-key collect. A naive ``l JOIN r ON l.by = r.by AND r.ts <= l.ts`` +
max-window would shuffle |L|·avg-matches rows instead.

Null ordinals: right rows with a null ``on`` can never match and are
dropped; left rows with a null ``on`` are kept with null payloads (never
spuriously matched).
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _tag_union(
    left: DataFrame, right: DataFrame, on: str, by: str
) -> tuple[DataFrame, list[str], list[str]]:
    """Union-tag both sides. The right payload rides as one nullable struct
    column ``_r`` (null on left rows), so ignore-nulls carries move whole
    right rows, never a stitch of fields from different rows."""
    r_payload = [c for c in right.columns if c != by]  # includes `on`
    l_cols = left.columns
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in r_payload]
    )

    tagged_left = left.select(
        F.col(by),
        F.col(on).alias("_ord"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c != by],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    tagged_right = right.where(F.col(on).isNotNull()).select(
        F.col(by),
        F.col(on).alias("_ord"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != by],
        F.struct(*[F.col(c) for c in r_payload]).alias("_r"),
    )
    return tagged_left.unionByName(tagged_right), l_cols, r_payload


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
    unioned, l_cols, r_payload = _tag_union(left, right, on, by)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_ord").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        by,
        "_side",
        "_ord",
        *[c for c in l_cols if c != by],
        F.last("_r", ignorenulls=True).over(w).alias("_b"),
    )
    # a left row with a null ordinal sorts first (nulls-first asc) and so
    # has no backward match by construction — no special-casing needed
    return carried.where(F.col("_side") == 1).select(
        by,
        *[c for c in l_cols if c != by],
        *[F.col("_b").getField(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )


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

    Same union-tag shape as ``asof_join`` but carried in BOTH directions
    (backward ``last`` + forward ``first``, whole-struct ignore-nulls over
    the one shuffle on ``by``); picking the nearer side is a row-local
    projection.
    """
    on_dtype = right.schema[on].dataType

    def ord_num(col: F.Column) -> F.Column:
        if isinstance(on_dtype, T.TimestampNTZType):
            # WALL-CLOCK micros via pure NTZ arithmetic — casting through
            # TIMESTAMP would measure real-instant deltas in the SESSION
            # zone, and a DST transition between two candidates then
            # changes which neighbor is "nearest" with the zone setting;
            # the contract is the naive difference of the NTZ values
            return F.timestamp_diff(
                "MICROSECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                col,
            )
        if isinstance(on_dtype, T.TimestampType):
            return F.unix_micros(col)
        if isinstance(on_dtype, T.DateType):
            return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
        if isinstance(on_dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            # keep integral ordinals exact: casting e.g. epoch-nanos bigints
            # to double loses precision above 2^53 and can invert |delta|
            return col.cast("long")
        if isinstance(on_dtype, T.NumericType):
            return col.cast("double")
        raise TypeError(f"asof_join_nearest: unsupported ordinal type {on_dtype}")

    unioned, l_cols, r_payload = _tag_union(left, right, on, by)

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
        F.last("_r", ignorenulls=True).over(wb).alias("_b"),
        F.first("_r", ignorenulls=True).over(wf).alias("_f"),
    )
    b_on = F.col("_b").getField(on)
    f_on = F.col("_f").getField(on)
    me = ord_num(F.col("_ord"))
    bd = me - ord_num(b_on)
    fd = ord_num(f_on) - me
    # backward wins ties; a missing side loses automatically via null checks
    use_b = b_on.isNotNull() & (f_on.isNull() | (bd <= fd))
    chosen = F.when(
        F.col("_ord").isNull(), F.lit(None).cast(carried.schema["_b"].dataType)
    ).otherwise(F.when(use_b, F.col("_b")).otherwise(F.col("_f")))
    return carried.where(F.col("_side") == 1).select(
        by,
        *[c for c in l_cols if c != by],
        *[chosen.getField(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )
