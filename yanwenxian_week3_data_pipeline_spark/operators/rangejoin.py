"""Point-in-interval range join — bucketized so it scales.

Spark has no native range/interval join; a naive
``l JOIN r ON l.by = r.by AND r.pt BETWEEN l.start AND l.end`` plans as a
BroadcastNestedLoopJoin (O(|L|·|R|) per key) the moment the equi-part alone
doesn't bound the match set. The scale formulation here is the standard
bucketized interval join:

  1. quantize time into fixed-width buckets (``bucket_seconds``);
  2. explode each left interval into the (few) buckets it covers —
     conservatively padded by one second each side so truncation at the
     epoch cast can never lose a boundary match;
  3. equi-join on ``(by, bucket)`` — a plain shuffled hash join;
  4. re-apply the exact ``BETWEEN`` predicate to discard bucket-collision
     false positives.

Each (left, right) pair matches in exactly one bucket (the right point's
own bucket), so no post-join dedup is needed. Shuffle volume is
|L|·(interval/bucket + 2) + |R| rows — linear, skew-friendly (the bucket is
part of the join key, so a hot ``by`` key still spreads across buckets),
and AQE-coalescible. Pick ``bucket_seconds`` ≈ the typical interval width
so left rows explode into ~2-3 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_start: str,
    left_end: str,
    right_point: str,
    bucket_seconds: int,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Join each left interval ``[left_start, left_end]`` (timestamp cols)
    to the right rows whose ``right_point`` falls inside it, within the same
    ``by`` key. Right columns keep their names — they must not collide with
    left's. ``how='left'`` additionally keeps interval rows with no points
    (right cols null) and requires ``left_id``, a unique non-null left key
    column, for the unmatched-row recovery anti-join."""
    # double cast TIMESTAMP_NTZ → TIMESTAMP → epoch seconds is used ONLY
    # for bucket assignment, where any MONOTONE wall→number mapping is
    # sound (java.time's gap/overlap rules keep the session-zone mapping
    # monotone, so a point inside an interval always lands in one of the
    # interval's exploded buckets); the join predicate itself compares the
    # raw NTZ values, so RESULTS are session-zone-independent even though
    # the bucket ids are not.
    e_start = F.col(left_start).cast("timestamp").cast("long")
    e_end = F.col(left_end).cast("timestamp").cast("long")
    w = F.lit(bucket_seconds)

    exploded = left.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor((e_start - 1) / w), F.floor((e_end + 1) / w))),
    )
    bucketed_right = right.withColumn(
        "_bucket", F.floor(F.col(right_point).cast("timestamp").cast("long") / w)
    )

    joined = (
        exploded.join(
            bucketed_right,
            on=[
                exploded["_bucket"] == bucketed_right["_bucket"],
                exploded[by] == bucketed_right[by],
                F.col(right_point).between(F.col(left_start), F.col(left_end)),
            ],
            how="inner",
        )
        .drop(bucketed_right["_bucket"])
        .drop(bucketed_right[by])
        .drop("_bucket")
    )

    if how == "inner":
        return joined
    if how != "left":
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    if left_id is None:
        raise ValueError("how='left' requires left_id (unique non-null left key)")
    unmatched = left.join(
        joined.select(left_id).distinct(), on=left_id, how="left_anti"
    )
    for c in right.columns:
        if c != by:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return joined.unionByName(unmatched)
