"""EXT graph-analytics surface: PageRank centrality over the purchase
graph (customer → supplier via orders ⋈ lineitem).

Corpus-curation motivation: crawl-graph centrality is a standard quality
prior for training-data pipelines (rank-weighted sampling, hub/boilerplate
demotion); here the same operator runs on the star schema's natural graph,
whose edge count scales with the fact table. The reference has no graph
surface (SURVEY.md §2.10) — EXT scope, like the LSH family.

Node encoding: customers ↦ 2·custkey, suppliers ↦ 2·suppkey+1 (disjoint
integer namespaces, mirrored verbatim in the oracle). Suppliers have no
out-edges, so every iteration exercises the dangling-mass redistribution
path — the part naive PageRank ports get wrong.

Scale shape: edge derivation is one fact-table join + distinct; the
iteration inherits operators/pagerank.py's contract (degree-annotated edge
table built once and checkpointed partitioned-on-src; two map-side-combine
shuffles per round; per-round eager checkpoints; 1-row dangling scalar).
The top-40 output is TakeOrderedAndProject — per-partition heaps, K-row
final merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import QuerySpec
from ..constants import SCAN_FANOUT_TABLE_MIN_BYTES
from ..operators.pagerank import pagerank, pagerank_oracle_sql
from ..sources.tables import read_parquet_fanout

_PR_ITERS = 10
_PR_TOPK = 40


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_fanout(
        spark, f"{sf_dir}/{name}.parquet", SCAN_FANOUT_TABLE_MIN_BYTES
    )


def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )


def _q_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(_purchase_edges(spark, sf_dir), iters=_PR_ITERS)
    return ranks.orderBy(
        F.col("rank_scaled").desc(), F.col("node").asc()
    ).limit(_PR_TOPK)


_EDGES_SQL = (
    "SELECT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS d"
    " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
)

_SQL_PAGERANK_PURCHASES = (
    pagerank_oracle_sql(_EDGES_SQL, iters=_PR_ITERS)
    .replace(
        f"FROM r{_PR_ITERS}",
        f"FROM r{_PR_ITERS} ORDER BY rank_scaled DESC, node ASC LIMIT {_PR_TOPK}",
    )
)


QUERIES = [
    QuerySpec(
        name="graph_pagerank_purchases",
        build=_q_pagerank_purchases,
        oracle=_SQL_PAGERANK_PURCHASES,
        doc="Top-40 PageRank centrality on the customer→supplier purchase "
        "graph — exact scaled-integer power iteration (10 rounds, "
        "damping 0.85, dangling redistribution), bit-identical across "
        "engines and partitionings.",
    ),
]
