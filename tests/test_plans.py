"""Physical-plan shape assertions — the scale properties the engine claims
(broadcast dimension joins, filter pushdown, column pruning, no
nested-loop/cartesian fallbacks, single-Expand grouping sets, join-free
as-of) are verified here against ``explain`` output, so a regression that
silently degrades the 100 TB plan fails CI even though results stay
correct."""

from __future__ import annotations

import contextlib
import io
import re

from yanwenxian_week3_data_pipeline_spark.plans import all_queries

SPECS = all_queries()


def plan_of(spark, name: str, sf_dir: str, mode: str = "formatted") -> str:
    df = SPECS[name].build(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def node_count(plan: str, node: str) -> int:
    """Count physical nodes via their detail headers ('(3) Scan parquet') —
    formatted mode prints every node twice (tree + details)."""
    return len(re.findall(rf"^\(\d+\) {node}", plan, flags=re.M))


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, "join_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    # the shipdate filter must reach the parquet scan…
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # …and unused columns must not be read at all
    assert "l_orderkey" not in plan
    assert "l_partkey" not in plan
    # partial aggregation before the exchange (map-side combine)
    assert node_count(plan, "HashAggregate") >= 2


def test_exists_subquery_decorrelates_to_semi_join(spark, sf_dir):
    plan = plan_of(spark, "subq_exists_big_open_order", sf_dir)
    assert "SemiJoin" in plan or "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_stays_equi(spark, sf_dir):
    plan = plan_of(spark, "join_range_views_before_purchase", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_grouping_sets_single_expand_single_scan(spark, sf_dir):
    plan = plan_of(spark, "groupby_grouping_sets", sf_dir)
    assert node_count(plan, "Expand") == 1
    assert node_count(plan, "Scan parquet") == 1


def test_asof_join_is_join_free(spark, sf_dir):
    # union-tag-window formulation: one shuffle + one sort, no join operator
    plan = plan_of(spark, "join_asof_purchase_view", sf_dir)
    assert "Join" not in plan
    assert "Window" in plan


def test_funnel_single_scan(spark, sf_dir):
    # single-pass funnel: one scan of documents feeds all four stage counts
    plan = plan_of(spark, "agg_counts_funnel", sf_dir)
    assert node_count(plan, "Scan parquet") == 1
