"""Third recount batch: anomaly scoring, range-frame rolling spend, set
operations, distinct counts, and grouped medians — same independent-
recomputation discipline as test_independent_recounts.py."""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict
from datetime import timedelta

import pyarrow.parquet as pq
import pytest

from tests.test_independent_recounts import _round_half_up


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pylist()


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()


def test_hourly_anomaly_recount(spark, sf_dir, events):
    got = {
        r["window_start"]: (
            r["n_events"],
            r["trailing_mean"],
            r["z_score"],
            r["is_anomaly"],
        )
        for r in _run(spark, sf_dir, "events_hourly_anomaly")
    }

    def hour(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    counts = defaultdict(int)
    for e in events:
        counts[hour(e["ts"])] += 1
    lo = hour(min(e["ts"] for e in events))
    hi = hour(max(e["ts"] for e in events))
    spine, h = [], lo
    while h <= hi:
        spine.append((h, counts.get(h, 0)))
        h += timedelta(hours=1)
    exp = {}
    for i in range(24, len(spine)):
        win = [n for _h, n in spine[i - 24 : i]]
        n = spine[i][1]
        s1, s2 = sum(win), sum(x * x for x in win)
        mean = float(s1) / 24
        var = (float(s2) - float(s1) * float(s1) / 24) / 23
        if var > 0:
            z = (n - mean) / math.sqrt(var)
            zr, anom = float(_round_half_up(z, 6)), abs(z) > 3
        else:
            zr, anom = None, False
        exp[spine[i][0]] = (n, float(_round_half_up(mean, 6)), zr, anom)
    assert got == exp


def test_rolling_7d_spend_recount(spark, sf_dir, orders):
    got = {
        r["o_orderkey"]: (r["o_custkey"], r["spend_7d"], r["n_orders_7d"])
        for r in _run(spark, sf_dir, "window_rolling_7d_spend")
    }

    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o["o_custkey"]].append(o)
    exp = {}
    week = timedelta(days=7)
    for cust, os_ in by_cust.items():
        for o in os_:
            frame = [
                p
                for p in os_
                if o["o_orderdate"] - week <= p["o_orderdate"] <= o["o_orderdate"]
            ]
            spend = sum(_round_half_up(p["o_totalprice"], 2) for p in frame)
            exp[o["o_orderkey"]] = (cust, float(spend), len(frame))
    assert got == exp


def test_set_ops_recount(spark, sf_dir, orders):
    urgent = {o["o_custkey"] for o in orders if o["o_orderpriority"] == "1-URGENT"}
    high = {o["o_custkey"] for o in orders if o["o_orderpriority"] == "2-HIGH"}
    low = {o["o_custkey"] for o in orders if o["o_orderpriority"] == "5-LOW"}

    got_union = {r["o_custkey"] for r in _run(spark, sf_dir, "set_union_priorities")}
    assert got_union == urgent | high

    got_inter = {
        r["o_custkey"] for r in _run(spark, sf_dir, "set_intersect_priorities")
    }
    assert got_inter == urgent & low

    # EXCEPT ALL is bag semantics: per key, count(all) - count(status F)
    all_c = Counter(o["o_custkey"] for o in orders)
    f_c = Counter(o["o_custkey"] for o in orders if o["o_orderstatus"] == "F")
    exp_bag = Counter()
    for k, n in all_c.items():
        keep = n - f_c.get(k, 0)
        if keep > 0:
            exp_bag[k] = keep
    got_bag = Counter(
        r["o_custkey"] for r in _run(spark, sf_dir, "set_except_all_open_orders")
    )
    assert got_bag == exp_bag


def test_count_distinct_recount(spark, sf_dir):
    row = _run(spark, sf_dir, "agg_count_distinct")[0]
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_orderkey"],
    ).to_pylist()
    assert (row["n_parts"], row["n_supps"], row["n_orders"]) == (
        len({r["l_partkey"] for r in li}),
        len({r["l_suppkey"] for r in li}),
        len({r["l_orderkey"] for r in li}),
    )


def test_median_by_lang_recount(spark, sf_dir):
    got = {
        r["lang"]: (r["n_docs"], r["median_chars"])
        for r in _run(spark, sf_dir, "docs_median_length_by_lang")
    }
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    ).to_pylist()
    by_lang = defaultdict(list)
    for d in docs:
        by_lang[d["lang"]].append(d["n_chars"])
    exp = {
        lang: (len(v), float(statistics.median(v))) for lang, v in by_lang.items()
    }
    assert got == exp
