"""Generate an sf1-equivalent table set (~6M lineitem) by STRUCTURE-
PRESERVING 10× replication of the driver's sf0.1 tables — one more order
of magnitude of scale evidence for the correctness sweep and bench,
without touching the read-only /root/testdata.

Replication rules (replica r ∈ 0..k-1):
- region/nation: copied verbatim (dimension tables; FKs into them keep
  their meaning in every replica).
- customer/supplier/part/orders/lineitem/events: every PRIMARY and
  FOREIGN key is offset by r × (max_key + 1), so each replica is a
  self-consistent sub-database and joins never cross replicas. Entity
  NAMES (c_name/s_name/p_name) get an ``_r{r}`` suffix for r > 0 —
  without it, 10 name-tied rows with identical aggregates make
  order-by-name-limit queries nondeterministic across engines.
  Categorical columns (mktsegment, brand, type, returnflag, priority,
  event_type) and all dates/amounts are kept verbatim, so every filter's
  selectivity and every group's identity is exactly the base table's and
  answers scale by k in counts/sums.
- documents/embeddings: the stress_llm transform (bijective per-replica
  token renaming; cyclic embedding roll) — within-replica Jaccard and
  cosine structure exactly preserved, cross-replica similarity ~0, so
  near-dup answer density stays constant per replica instead of melting
  the LSH buckets with a k-clique of exact copies.

Usage: python tools/make_sf1.py [base_sf_dir] [out_dir] [k]
  defaults: /root/testdata/sf0.1  /tmp/sf1  10
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _as_single_file(out: str, t: str) -> None:
    """Replace the Spark output DIRECTORY {out}/{t}.parquet with a single
    parquet FILE of the same name — the driver's testdata layout, which
    both spark.read.parquet and DuckDB read_parquet accept verbatim."""
    import shutil
    from glob import glob

    d = Path(out) / f"{t}.parquet"
    tmp = Path(out) / f"_{t}_dir"
    if tmp.exists():
        shutil.rmtree(tmp)
    d.rename(tmp)
    parts = sorted(glob(str(tmp / "part-*.parquet")))
    assert len(parts) == 1, (t, parts)
    shutil.move(parts[0], d)
    shutil.rmtree(tmp)


def make(spark, base: str, out: str, k: int) -> None:
    from pyspark.sql import functions as F  # noqa: N812

    from tools.stress_llm import generate as gen_docs_emb

    for t in ("region", "nation"):
        spark.read.parquet(f"{base}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        _as_single_file(out, t)

    def load(t):
        return spark.read.parquet(f"{base}/{t}.parquet")

    def off(t, col):
        return load(t).agg(F.max(col)).collect()[0][0] + 1

    c_off, s_off, p_off = off("customer", "c_custkey"), off("supplier", "s_suppkey"), off("part", "p_partkey")
    o_off, e_off = off("orders", "o_orderkey"), off("events", "event_id")
    u_off = off("events", "user_id")
    reps = spark.range(k).withColumnRenamed("id", "rep")

    def suffixed(col):
        return F.when(F.col("rep") == 0, F.col(col)).otherwise(
            F.concat(F.col(col), F.lit("_r"), F.col("rep"))
        ).alias(col)

    def write(df, t):
        df.drop("rep").coalesce(1).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        _as_single_file(out, t)

    write(
        load("customer").crossJoin(reps).select(
            (F.col("c_custkey") + F.col("rep") * c_off).alias("c_custkey"),
            suffixed("c_name"), "c_nationkey", "c_acctbal", "c_mktsegment", "rep",
        ),
        "customer",
    )
    write(
        load("supplier").crossJoin(reps).select(
            (F.col("s_suppkey") + F.col("rep") * s_off).alias("s_suppkey"),
            suffixed("s_name"), "s_nationkey", "s_acctbal", "rep",
        ),
        "supplier",
    )
    write(
        load("part").crossJoin(reps).select(
            (F.col("p_partkey") + F.col("rep") * p_off).alias("p_partkey"),
            suffixed("p_name"), "p_brand", "p_type", "p_size", "p_retailprice", "rep",
        ),
        "part",
    )
    write(
        load("orders").crossJoin(reps).select(
            (F.col("o_orderkey") + F.col("rep") * o_off).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * c_off).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority", "rep",
        ),
        "orders",
    )
    write(
        load("lineitem").crossJoin(reps).select(
            (F.col("l_orderkey") + F.col("rep") * o_off).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("rep") * p_off).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("rep") * s_off).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate", "rep",
        ),
        "lineitem",
    )
    write(
        load("events").crossJoin(reps).select(
            (F.col("event_id") + F.col("rep") * e_off).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * u_off).alias("user_id"),
            "event_type", "value", "props", "rep",
        ),
        "events",
    )
    gen_docs_emb(spark, base, out, k)
    # stress_llm's generator writes Spark directories; flatten to the
    # driver's single-file layout (documents/embeddings)
    import shutil

    for t in ("documents", "embeddings"):
        d = Path(out) / f"{t}.parquet"
        tmp_dir = Path(out) / f"_{t}_flat"
        spark.read.parquet(str(d)).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_dir)
        )
        shutil.rmtree(d)
        from glob import glob

        parts = sorted(glob(str(tmp_dir / "part-*.parquet")))
        assert len(parts) == 1, (t, parts)
        shutil.move(parts[0], d)
        shutil.rmtree(tmp_dir)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    make(spark, base, out, k)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())


if __name__ == "__main__":
    main()
