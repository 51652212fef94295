"""DSIR selection behavior tests (the oracle sweep certifies cross-engine
equality; these pin the STATISTICAL behavior — importance weights must
actually rank target-like pool docs first — and partition-independence)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from yanwenxian_week3_data_pipeline_spark.constants import (
    DSIR_BUCKETS,
    DSIR_SEED,
    DSIR_TARGET_LANG,
)
from yanwenxian_week3_data_pipeline_spark.functions.hashing import hash52_expr, hash60_expr
from yanwenxian_week3_data_pipeline_spark.functions.textstats import tokens_expr


def _dsir_logw(spark, docs):
    """The weight stage of docs_dsir_select over an in-memory (doc_id,
    lang, text) frame — same constants, same expressions, no file I/O."""
    b_lit = F.lit(DSIR_BUCKETS)
    d = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    tk = tokens_expr(F.col("text"))
    feats = d.select("doc_id", "lang", F.explode(tk).alias("g")).select(
        "doc_id", "lang", F.pmod(hash60_expr(F.col("g")), b_lit).alias("b")
    )
    is_tgt = F.col("lang") == DSIR_TARGET_LANG
    tgt_b = feats.where(is_tgt).groupBy("b").agg(F.count(F.lit(1)).alias("np"))
    pool = feats.where(~is_tgt)
    pool_b = pool.groupBy("b").agg(F.count(F.lit(1)).alias("nq"))
    tp = tgt_b.agg(F.coalesce(F.sum("np"), F.lit(0)).alias("tp"))
    tq = pool_b.agg(F.coalesce(F.sum("nq"), F.lit(0)).alias("tq"))
    ratio = (
        ((F.coalesce(F.col("np"), F.lit(0)) + 1) * (F.col("tq") + b_lit)).cast("double")
        / ((F.col("nq") + 1) * (F.col("tp") + b_lit)).cast("double")
    )
    lr = (
        pool_b.join(tgt_b, "b", "left")
        .crossJoin(tp)
        .crossJoin(tq)
        .select("b", F.round(F.log(ratio) * 1e6, 0).cast("long").alias("lr_micro"))
    )
    per_doc = pool.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("n"))
    return per_doc.join(F.broadcast(lr), "b").groupBy("doc_id").agg(
        F.sum(F.col("n") * F.col("lr_micro")).cast("long").alias("logw_micro")
    )


def test_dsir_ranks_target_like_pool_docs_first(spark):
    rng = random.Random(5)
    vocab_a = [f"alpha{i}" for i in range(40)]  # target vocabulary
    vocab_b = [f"beta{i}" for i in range(40)]  # off-target vocabulary
    docs = []
    for i in range(30):  # target slice: pure A
        docs.append((i, "en", " ".join(rng.choice(vocab_a) for _ in range(30))))
    for i in range(30, 50):  # pool, A-like
        docs.append((i, "de", " ".join(rng.choice(vocab_a) for _ in range(30))))
    for i in range(50, 70):  # pool, B-like
        docs.append((i, "fr", " ".join(rng.choice(vocab_b) for _ in range(30))))
    lw = {r["doc_id"]: r["logw_micro"] for r in _dsir_logw(spark, docs).collect()}
    a_like = [lw[i] for i in range(30, 50)]
    b_like = [lw[i] for i in range(50, 70)]
    # every A-like pool doc outweighs every B-like one, and the weights
    # carry the right signs (A-like buckets are target-dense)
    assert min(a_like) > max(b_like)
    assert min(a_like) > 0 > max(b_like)


def test_dsir_query_partition_independent(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    q = all_queries()["docs_dsir_select"].build
    base = [tuple(r) for r in q(spark, sf_dir).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = [tuple(r) for r in q(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt and len(base) > 0


def test_dsir_gumbel_key_is_seeded_and_stable(spark):
    # the Gumbel uniform must be a pure function of (seed, doc_id):
    # identical across sessions/partitions by construction
    df = spark.range(0, 64).select(
        (
            (hash52_expr(F.col("id").cast("string"), seed=DSIR_SEED) + 1)
            / F.lit(float(2**52))
        ).alias("u")
    )
    us = [r["u"] for r in df.collect()]
    assert all(0.0 < u <= 1.0 for u in us)
    assert len(set(us)) == len(us)  # 52-bit hashes: no collisions expected
