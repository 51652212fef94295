"""EXT language-model surface: tokenizer training and LM-based quality
bucketing — the two corpus-level LM steps of a training-data pipeline the
reference (a single-table pandas cleaner, cleaner.py:1-5) has no
counterpart for.

- ``text_bpe_learn`` — distributed BPE vocabulary learning (Sennrich et
  al. 2016) in the word-frequency formulation: the corpus collapses to a
  deterministic top-V word-count table, then every merge round is
  V-bounded. Greedy non-overlap pair semantics are pure window algebra
  (see operators/bpe.py); the oracle unrolls the identical recurrence as
  MATERIALIZED CTEs (the pagerank.py discipline).
- ``docs_ccnet_perplexity_buckets`` — CCNet-style head/middle/tail
  corpus split (Wenzek et al. 2020, arXiv:1911.00359): a hashed-bucket
  conditional bigram model is trained on the target-language slice,
  every doc is scored by mean negative log-probability per bigram, and
  the corpus is cut at exact rank tertiles. All model math rides exact
  integer micro-nats (the DSIR recipe — integer sums are exact under any
  reduction order); the tertile cuts come from
  operators/quantiles.exact_rank_cuts (no global sort, no
  single-partition exchange).

Scale shape (100 TB): BPE's corpus-sized work is ONE tokenize → explode
→ word-count shuffle; the ~10 merge rounds touch 2000-row frames. The
perplexity query's model table is ≤ B² rows and BROADCAST; per-doc
scoring is one (doc, bp, bw) partial aggregation; tertile cuts move one
histogram-row per distinct score plus one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import QuerySpec
from ..constants import (
    BPE_MAX_WORD_LEN,
    BPE_MERGES,
    BPE_VOCAB_TOP,
    LM_BUCKETS,
    LM_TRAIN_LANG,
    SCAN_FANOUT_TEXT_MIN_BYTES,
)
from ..functions.hashing import hash60_expr, hash60_sql
from ..functions.text import clean_text_expr
from ..functions.textstats import tokens_expr, tokens_sql
from ..operators.bpe import bpe_learn, bpe_oracle_sql
from ..sources.tables import read_parquet_fanout
from .documents_domain import CLEAN_SQL


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_fanout(
        spark, f"{sf_dir}/documents.parquet", SCAN_FANOUT_TEXT_MIN_BYTES
    )


# ---------------------------------------------------------------------------
# text_bpe_learn
# ---------------------------------------------------------------------------

def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(clean_text_expr(F.col("text")).alias("c"))
    return (
        d.select(F.explode(tokens_expr(F.col("c"))).alias("word"))
        .where(F.length("word") <= BPE_MAX_WORD_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .orderBy(F.desc("wcount"), F.asc("word"))
        .limit(BPE_VOCAB_TOP)
    )


def _q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_learn(spark, _word_counts(spark, sf_dir), BPE_MERGES)


_WORDS_SQL = f"""
SELECT g AS word, CAST(count(*) AS BIGINT) AS wcount
FROM (SELECT {CLEAN_SQL} AS c FROM documents) d, UNNEST({tokens_sql('c')}) AS un(g)
WHERE length(g) <= {BPE_MAX_WORD_LEN}
GROUP BY g ORDER BY wcount DESC, word ASC LIMIT {BPE_VOCAB_TOP}
"""


# ---------------------------------------------------------------------------
# docs_ccnet_perplexity_buckets
# ---------------------------------------------------------------------------

def _doc_bigram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, bp, bw) — one row per adjacent-token bigram, both
    sides hashed into LM_BUCKETS buckets."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", clean_text_expr(F.col("text")).alias("c")
    )
    tk = tokens_expr(F.col("c"))
    # F.sequence on size<2 would yield a DESCENDING range — gate it (the
    # F.sequence-on-empty pitfall, same as the DSIR bigram build)
    pairs = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("prev"),
                F.element_at(tk, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    return d.select(
        "doc_id", "lang", F.explode(pairs).alias("pr")
    ).select(
        "doc_id",
        "lang",
        F.pmod(hash60_expr(F.col("pr.prev")), F.lit(LM_BUCKETS)).alias("bp"),
        F.pmod(hash60_expr(F.col("pr.cur")), F.lit(LM_BUCKETS)).alias("bw"),
    )


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import exact_rank_cuts

    bi = _doc_bigram_buckets(spark, sf_dir)
    train = bi.where(F.col("lang") == LM_TRAIN_LANG)
    c2 = train.groupBy("bp", "bw").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("bp").agg(F.sum("c2").alias("c1"))

    per_doc = bi.groupBy("doc_id", "bp", "bw").agg(
        F.count(F.lit(1)).alias("n")
    )
    # smoothed conditional: (c2+1)/(c1+B) — a quotient of exact integers
    # (< 2^53), so the double division and its ln round identically on
    # both engines; micro-nat integers from there on
    logp_micro = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col("c1"), F.lit(0)) + LM_BUCKETS).cast("double")
        )
        * 1e6,
        0,
    ).cast("long")
    scored = (
        per_doc.join(F.broadcast(c2), ["bp", "bw"], "left")
        .join(F.broadcast(c1), ["bp"], "left")
        .withColumn("lp", logp_micro)
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            (-F.sum(F.col("n") * F.col("lp"))).cast("long").alias("nlp_micro"),
        )
        .withColumn(
            "avg_micro", F.expr("nlp_micro div n_bigrams").cast("long")
        )
    )
    cuts = exact_rank_cuts(scored, "avg_micro", [(1, 3), (2, 3)])
    cut_row = cuts.groupBy().agg(
        F.max(F.when(F.col("cut_id") == 1, F.col("cut"))).alias("cut1"),
        F.max(F.when(F.col("cut_id") == 2, F.col("cut"))).alias("cut2"),
    )
    return scored.crossJoin(F.broadcast(cut_row)).select(
        "doc_id",
        "n_bigrams",
        "nlp_micro",
        "avg_micro",
        (F.col("avg_micro") / F.lit(1e6)).alias("avg_nats"),
        F.when(F.col("avg_micro") <= F.col("cut1"), F.lit("head"))
        .when(F.col("avg_micro") <= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _sql_ccnet_buckets() -> str:
    b = LM_BUCKETS
    return f"""
WITH d AS (SELECT doc_id, lang, {CLEAN_SQL} AS c FROM documents),
t AS (SELECT doc_id, lang, {tokens_sql('c')} AS tk FROM d),
bi AS (
  SELECT doc_id, lang,
         ({hash60_sql('pv')}) % {b} AS bp,
         ({hash60_sql('cu')}) % {b} AS bw
  FROM (SELECT doc_id, lang,
               unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS pv,
               unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS cu
        FROM t)),
c2 AS (SELECT bp, bw, count(*) AS c2 FROM bi
       WHERE lang = '{LM_TRAIN_LANG}' GROUP BY 1, 2),
c1 AS (SELECT bp, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
pd AS (SELECT doc_id, bp, bw, count(*) AS n FROM bi GROUP BY 1, 2, 3),
sc AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
         CAST(-sum(n * CAST(round(ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
                                     / CAST(COALESCE(c1.c1, 0) + {b} AS DOUBLE))
                                  * 1e6, 0) AS BIGINT)) AS BIGINT) AS nlp_micro
  FROM pd LEFT JOIN c2 USING (bp, bw) LEFT JOIN c1 USING (bp)
  GROUP BY doc_id),
av AS (SELECT doc_id, n_bigrams, nlp_micro,
              nlp_micro // n_bigrams AS avg_micro FROM sc),
nn AS (SELECT count(*) AS n FROM av),
cut1 AS (SELECT avg_micro AS c FROM av ORDER BY avg_micro
         LIMIT 1 OFFSET (SELECT GREATEST(1, (n * 1 + 2) // 3) FROM nn) - 1),
cut2 AS (SELECT avg_micro AS c FROM av ORDER BY avg_micro
         LIMIT 1 OFFSET (SELECT GREATEST(1, (n * 2 + 2) // 3) FROM nn) - 1)
SELECT doc_id, n_bigrams, nlp_micro, avg_micro,
       avg_micro / 1e6 AS avg_nats,
       CASE WHEN avg_micro <= (SELECT c FROM cut1) THEN 'head'
            WHEN avg_micro <= (SELECT c FROM cut2) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM av
"""


QUERIES = [
    QuerySpec(
        name="text_bpe_learn",
        build=_q_bpe_learn,
        oracle=bpe_oracle_sql(_WORDS_SQL, BPE_MERGES),
        doc=f"Distributed BPE vocabulary learning: top-{BPE_VOCAB_TOP} "
        f"word-frequency table, {BPE_MERGES} greedy merge rounds with "
        "exact window-algebra non-overlap semantics; oracle unrolls the "
        "identical recurrence as materialized CTEs.",
    ),
    QuerySpec(
        name="docs_ccnet_perplexity_buckets",
        build=_q_ccnet_buckets,
        oracle=_sql_ccnet_buckets(),
        doc="CCNet head/middle/tail perplexity split: hashed-bucket "
        "bigram LM trained on the target-language slice, per-doc mean "
        "negative log-prob in exact micro-nats, exact rank tertiles.",
    ),
]
