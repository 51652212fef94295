"""Candidate-count instrumentation for the PPJoin-style positional prefix
filter on dedup_containment candidate generation (VERDICT r10 next-round
item 2; target was a >=10x candidate reduction).

Prefix lemma (containment form): designate the doc with lexicographically
smaller (|shingles|, id) as B; a qualifying pair needs
|R(A) ∩ R(B)| >= o_B = max(1, ceil((t - eps)·n_B - c_tot)), and any
intersection of that size must hit the first (r_B - o_B + 1) of B's rare
shingles in a fixed global order (here: ascending df, then s). Only the
SMALLER side admits a prefix — with min-normalization the larger side's
required overlap is set by its (unknown, possibly tiny) partner.

MEASURED at sf0.1 (this tool) — DO NOT RETRY without a new corpus shape:
  c_tot = 0; full self-join emits 1,265,779 pair rows (1,130,536
  distinct); the prefix join still emits 491,179 rows and 465,690
  DISTINCT candidates — a 2.4x reduction, not 10x, because the pair mass
  comes from df=2-3 shingles spread across every doc, not from high-df
  shingles that prefixes exclude. And the landed counting verify gets
  the exact n_rare as a FREE byproduct of the full self-join's groupBy;
  a prefix join forfeits it, forcing an n_rare recount join for ~466k
  candidate pairs (each x ~50 postings) that costs more than the ~2.3 s
  the smaller emission saves. Architecturally dominated; rejected.

Usage: python tools/prefix_filter_counts.py [sf_dir]
"""

import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
from yanwenxian_week3_data_pipeline_spark.constants import CONTAIN_MAX_DF, CONTAIN_THRESHOLD
from yanwenxian_week3_data_pipeline_spark.operators.dedup import doc_shingles
from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import _cleaned_docs
from yanwenxian_week3_data_pipeline_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("prefix-counts"); spark.sparkContext.setLogLevel("ERROR")
t, max_df = CONTAIN_THRESHOLD, CONTAIN_MAX_DF
EPS = 1e-6

df = _cleaned_docs(spark, sf_dir).select("doc_id", "c")
sh = doc_shingles(df, "c", "doc_id")
posts = sh.select("id", F.explode("shingles").alias("s"))
dfc = posts.groupBy("s").agg(F.count(F.lit(1)).alias("nd")).localCheckpoint(eager=True)
rare = dfc.where((F.col("nd") >= 2) & (F.col("nd") <= max_df))
c_tot = rare.sparkSession.createDataFrame([], "x int")  # placeholder
common_cnt = dfc.where(F.col("nd") > max_df).count()
print("c_tot (distinct common shingles):", common_cnt)

# emitted pair rows today = sum over rare shingles of C(df,2)
emit = rare.agg(F.sum(F.col("nd") * (F.col("nd") - 1) / 2)).collect()[0][0]
print("pair rows emitted by full self-join:", int(emit))

sizes = sh.select("id", F.size("shingles").alias("n"))
pr = (posts.join(rare, "s")  # carries nd
      .join(F.broadcast(sizes), "id"))
rk = W.partitionBy("id").orderBy(F.col("nd").asc(), F.col("s").asc())
o = F.greatest(F.lit(1), F.ceil((F.lit(t) - F.lit(EPS)) * F.col("n") - F.lit(common_cnt)))
pr = (pr.withColumn("rk", F.row_number().over(rk))
        .withColumn("rcnt", F.count(F.lit(1)).over(W.partitionBy("id")))
        .withColumn("plen", F.col("rcnt") - o + 1))
prefix = pr.where(F.col("rk") <= F.col("plen"))
print("rare postings:", pr.count(), "prefix postings:", prefix.count())
pj = prefix.alias("p").join(
    pr.alias("f"),
    (F.col("p.s") == F.col("f.s"))
    & ((F.col("p.n") < F.col("f.n")) | ((F.col("p.n") == F.col("f.n")) & (F.col("p.id") < F.col("f.id")))),
)
print("prefix-join emitted rows:", pj.count())
cand = pj.select(F.least("p.id", "f.id").alias("id_a"), F.greatest("p.id", "f.id").alias("id_b")).distinct()
print("distinct prefix candidates:", cand.count())
