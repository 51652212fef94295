"""Recount batch 11 — sequential third opinion for q21_waiting_suppliers.

r10 replaced q21's multi-distinct aggregate with a manual two-level
(o_orderkey, l_suppkey) -> o_orderkey aggregate. The Spark build and the
DuckDB oracle both express the count logic relationally, so their
agreement does not rule out a shared relational-rewrite blind spot (the
r4 basket-inflation class). This replay computes the waiting-supplier
counts the OTHER way — plain Python dicts of sets over the raw parquet,
one sequential pass per table — and compares the full top-20 result.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq


def test_q21_waiting_suppliers_full_replay(spark, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus", "o_orderdate"]
    ).to_pylist()
    odate = {o["o_orderkey"]: o["o_orderdate"] for o in orders if o["o_orderstatus"] == "F"}

    lineitem = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).to_pylist()
    supps: dict[int, set[int]] = defaultdict(set)
    late: dict[int, set[int]] = defaultdict(set)
    for li in lineitem:
        ok = li["l_orderkey"]
        if ok not in odate:
            continue
        supps[ok].add(li["l_suppkey"])
        if li["l_shipdate"] > odate[ok]:
            late[ok].add(li["l_suppkey"])

    sname = {
        s["s_suppkey"]: s["s_name"]
        for s in pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
        ).to_pylist()
    }
    numwait: dict[str, int] = defaultdict(int)
    for ok, members in supps.items():
        if len(members) > 1 and len(late[ok]) == 1:
            # the query's deterministic representative: min late supplier
            numwait[sname[min(late[ok])]] += 1

    expected = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert expected, "fixture must contain waiting suppliers"

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    rows = all_queries()["q21_waiting_suppliers"].build(spark, sf_dir).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == expected
