"""Lakehouse table-maintenance operators (EXT; no reference counterpart —
the reference never mutates data after writing, cleaner.py:146-154):

- ``tbl_upsert_snapshot`` — SCD-1 MERGE semantics expressed relationally:
  a key-hashed snapshot full-outer-joins a change feed; matched keys take
  the feed's new values (update), unmatched feed keys insert, unmatched
  snapshot keys keep. This is the logical plan a MERGE INTO statement
  lowers to, and the shape is one shuffle on the merge key (at cluster
  scale the snapshot is bucketed by key so the merge is a co-located
  join + rewrite of only the touched buckets).
- ``tbl_scd2_history`` — SCD-2 effective-dated history built from an event
  log: consecutive equal values collapse into validity ranges
  (valid_from, valid_to, is_current) via change-point detection (lag) and
  a running change counter — the standard two-window formulation, both
  windows partitioned by the entity key so no global sort exists.

Both deterministic and fully SQL-expressible; money math stays in DECIMAL
(exact under parallel reduction; rounding half-away-from-zero agrees across
engines for the non-negative amounts here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import hash60_expr, hash60_sql
from . import QuerySpec

DEC = "decimal(18,2)"

# key-hash buckets (of 1000) splitting orders into the merge fixture:
# snapshot = buckets < 900, change feed = buckets >= 700 — so 700-899 are
# updates to existing keys and 900-999 are fresh inserts
UPSERT_SNAPSHOT_MAX = 900
UPSERT_FEED_MIN = 700


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _q_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    bkt = hash60_expr(F.col("o_orderkey").cast("string")) % 1000
    snap = o.where(bkt < UPSERT_SNAPSHOT_MAX).select(
        "o_orderkey", F.col("o_totalprice").cast(DEC).alias("old_price")
    )
    feed = o.where(bkt >= UPSERT_FEED_MIN).select(
        "o_orderkey",
        F.round(
            F.col("o_totalprice").cast(DEC) * F.lit("1.1").cast("decimal(2,1)"), 2
        )
        .cast(DEC)
        .alias("new_price"),
    )
    m = snap.join(feed, "o_orderkey", "full_outer")
    action = (
        F.when(F.col("old_price").isNotNull() & F.col("new_price").isNotNull(), "update")
        .when(F.col("new_price").isNotNull(), "insert")
        .otherwise("keep")
    )
    return m.select(
        "o_orderkey",
        F.coalesce(F.col("new_price"), F.col("old_price")).alias("final_price"),
        action.alias("action"),
    )


_SQL_UPSERT_SNAPSHOT = f"""
WITH b AS (SELECT o_orderkey, o_totalprice,
                  ({hash60_sql('CAST(o_orderkey AS VARCHAR)')} % 1000) AS bkt
           FROM orders),
snap AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS old_price
         FROM b WHERE bkt < {UPSERT_SNAPSHOT_MAX}),
feed AS (SELECT o_orderkey,
                CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2)
                     AS DECIMAL(18,2)) AS new_price
         FROM b WHERE bkt >= {UPSERT_FEED_MIN})
SELECT coalesce(s.o_orderkey, f.o_orderkey) AS o_orderkey,
       coalesce(f.new_price, s.old_price) AS final_price,
       CASE WHEN s.o_orderkey IS NOT NULL AND f.o_orderkey IS NOT NULL THEN 'update'
            WHEN f.o_orderkey IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM snap s FULL OUTER JOIN feed f ON f.o_orderkey = s.o_orderkey
"""


def _q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_events

    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("int")
    runs = e.withColumn("grp", F.sum(changed).over(w))
    spans = runs.groupBy("user_id", "grp", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return spans.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


_SQL_SCD2_HISTORY = """
WITH flags AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flags),
spans AS (
  SELECT user_id, grp, event_type, min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, grp, event_type)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER w3 AS valid_to,
       n_events,
       (lead(valid_from) OVER w3 IS NULL) AS is_current
FROM spans
WINDOW w3 AS (PARTITION BY user_id ORDER BY valid_from)
"""


QUERIES = [
    QuerySpec("tbl_upsert_snapshot", _q_upsert_snapshot, _SQL_UPSERT_SNAPSHOT),
    QuerySpec("tbl_scd2_history", _q_scd2_history, _SQL_SCD2_HISTORY),
]
