"""Fifth recount batch (VERDICT r5 item #3): the lakehouse family
(tbl_upsert_snapshot, tbl_scd2_history, join_scd2_point_in_time,
tbl_incremental_hourly_agg, tbl_version_diff), dq_expectations_orders,
and the two join shapes (full outer, range) — independent sequential
recomputation from raw parquet with plain dicts/sets, sharing nothing
with the Spark/DuckDB recipe beyond the frozen constants."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from tests.test_independent_recounts import _hash60, _round_half_up
from yanwenxian_week3_data_pipeline_spark.plans.lakehouse_ext import (
    UPSERT_FEED_MIN,
    UPSERT_SNAPSHOT_MAX,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pylist()


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderstatus",
            "o_orderdate",
        ],
    ).to_pylist()


def _spans(events):
    """Pure-Python SCD-2 twin: per user, sort by (ts, event_id), collapse
    consecutive equal event_type runs into (valid_from, valid_to,
    n_events, is_current) spans."""
    per_user = defaultdict(list)
    for e in events:
        per_user[e["user_id"]].append(e)
    spans = []
    for uid, evs in per_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        runs = []  # (event_type, valid_from, n_events)
        for e in evs:
            if runs and runs[-1][0] == e["event_type"]:
                runs[-1][2] += 1
            else:
                runs.append([e["event_type"], e["ts"], 1])
        for i, (etype, vfrom, n) in enumerate(runs):
            vto = runs[i + 1][1] if i + 1 < len(runs) else None
            spans.append((uid, etype, vfrom, vto, n, vto is None))
    return spans


def test_scd2_history_recount(spark, sf_dir, events):
    got = {
        (
            r["user_id"],
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in _run(spark, sf_dir, "tbl_scd2_history")
    }
    assert got == set(_spans(events))


def test_scd2_point_in_time_recount(spark, sf_dir, events):
    got = {
        r["purchase_id"]: (
            r["user_id"],
            r["purchase_ts"],
            r["span_type"],
            r["span_from"],
            r["span_events"],
        )
        for r in _run(spark, sf_dir, "join_scd2_point_in_time")
    }
    live = defaultdict(list)
    for uid, etype, vfrom, vto, n, _cur in _spans(events):
        if vto is None or vto > vfrom:
            live[uid].append((vfrom, vto, etype, n))
    exp = {}
    for e in events:
        if e["event_type"] != "purchase":
            continue
        hits = [
            (vfrom, etype, n)
            for vfrom, vto, etype, n in live[e["user_id"]]
            if vfrom <= e["ts"] and (vto is None or e["ts"] < vto)
        ]
        assert len(hits) <= 1  # non-degenerate spans tile the timeline
        if hits:
            vfrom, etype, n = hits[0]
            exp[e["event_id"]] = (e["user_id"], e["ts"], etype, vfrom, n)
    assert got == exp


def test_upsert_snapshot_recount(spark, sf_dir, orders):
    got = {
        r["o_orderkey"]: (r["final_price"], r["action"])
        for r in _run(spark, sf_dir, "tbl_upsert_snapshot")
    }
    cent = Decimal("0.01")
    exp = {}
    for o in orders:
        bkt = _hash60(str(o["o_orderkey"])) % 1000
        in_snap, in_feed = bkt < UPSERT_SNAPSHOT_MAX, bkt >= UPSERT_FEED_MIN
        if not (in_snap or in_feed):
            continue
        old = _round_half_up(o["o_totalprice"], 2)
        new = (old * Decimal("1.1")).quantize(cent, ROUND_HALF_UP)
        # the registered query canonicalizes DECIMAL -> DOUBLE (dec_as_double)
        if in_snap and in_feed:
            exp[o["o_orderkey"]] = (float(new), "update")
        elif in_feed:
            exp[o["o_orderkey"]] = (float(new), "insert")
        else:
            exp[o["o_orderkey"]] = (float(old), "keep")
    assert got == exp


def test_incremental_hourly_agg_recount(spark, sf_dir, events):
    got = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in _run(spark, sf_dir, "tbl_incremental_hourly_agg")
    }
    counts: dict = defaultdict(int)
    sums: dict = defaultdict(lambda: Decimal(0))
    for e in events:
        if e["ts"] is None:
            continue
        h = e["ts"].replace(minute=0, second=0, microsecond=0)
        counts[h] += 1
        if e["value"] is not None:
            sums[h] += _round_half_up(e["value"], 2)
    # dec_as_double canonicalization on the collected side
    assert got == {h: (counts[h], float(sums[h])) for h in counts}


def test_version_diff_recount(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pylist()
    got = {
        (r["lang"], r["status"]): r["n_docs"]
        for r in _run(spark, sf_dir, "tbl_version_diff")
    }
    v1, v2, langs = {}, {}, {}
    for d in docs:
        langs[d["doc_id"]] = d["lang"]
        if d["doc_id"] % 11 != 0:
            v1[d["doc_id"]] = _hash60(d["text"])
        if d["doc_id"] % 13 != 0:
            t = d["text"] + " [edited]" if d["doc_id"] % 7 == 0 else d["text"]
            v2[d["doc_id"]] = _hash60(t)
    exp: dict = defaultdict(int)
    for did in set(v1) | set(v2):
        if did not in v1:
            status = "added"
        elif did not in v2:
            status = "removed"
        elif v1[did] != v2[did]:
            status = "changed"
        else:
            status = "unchanged"
        exp[(langs[did], status)] += 1
    assert got == dict(exp)


def test_dq_expectations_recount(spark, sf_dir, orders):
    got = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in _run(spark, sf_dir, "dq_expectations_orders")
    }
    parents = {
        c["c_custkey"]
        for c in pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        ).to_pylist()
    }
    n = len(orders)
    # o_orderdate is stored as a timestamp; Spark's between() casts the
    # string bounds to timestamps at midnight
    lo, hi = datetime(2020, 1, 1), datetime(2030, 1, 1)
    m = {
        "completeness_custkey": sum(
            1 for o in orders if o["o_custkey"] is not None
        ),
        "uniqueness_orderkey": len({o["o_orderkey"] for o in orders}),
        "non_negative_totalprice": sum(
            1
            for o in orders
            if o["o_totalprice"] is not None and o["o_totalprice"] >= 0
        ),
        "accepted_values_status": sum(
            1 for o in orders if o["o_orderstatus"] in ("O", "F", "P")
        ),
        "referential_custkey": sum(1 for o in orders if o["o_custkey"] in parents),
        "range_orderdate": sum(
            1
            for o in orders
            if o["o_orderdate"] is not None and lo <= o["o_orderdate"] <= hi
        ),
    }
    exp = {}
    for name, k in m.items():
        metric = float(_round_half_up(k / n, 6))
        exp[name] = (metric, metric >= 1.0)
    assert got == exp


def test_full_outer_nation_activity_recount(spark, sf_dir):
    got = {
        r["nationkey"]: (r["n_customers"], r["n_suppliers"])
        for r in _run(spark, sf_dir, "join_full_outer_nation_activity")
    }
    nc: dict = defaultdict(int)
    ns: dict = defaultdict(int)
    for c in pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey"]
    ).to_pylist():
        nc[c["c_nationkey"]] += 1
    for s in pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]
    ).to_pylist():
        ns[s["s_nationkey"]] += 1
    assert got == {k: (nc[k], ns[k]) for k in set(nc) | set(ns)}


def test_triangles_capped_recount(spark, sf_dir):
    """Sequential rebuild of the hub-capped triangle census from part-SET
    baskets: support>=2 edges, degree orientation, hot-apex (dout > cap)
    exclusion with exact dropped-wedge accounting, wedge closure."""
    from yanwenxian_week3_data_pipeline_spark.plans.graph_ext import (
        _TRI_MIN_SUPPORT,
        TRI_HUB_CAP,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    sup: dict = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                sup[(u, v)] += 1
    edges = {e for e, s in sup.items() if s >= _TRI_MIN_SUPPORT}
    deg: dict = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    out = defaultdict(set)
    for u, v in edges:
        lt = (deg[u], u) < (deg[v], v)
        src, dst = (u, v) if lt else (v, u)
        out[src].add(dst)
    hot = {s for s, ds in out.items() if len(ds) > TRI_HUB_CAP}
    dropped = sum(
        len(out[s]) * (len(out[s]) - 1) // 2 for s in hot
    )
    oriented = {(s, d) for s, ds in out.items() for d in ds}
    tri = 0
    for s, ds in out.items():
        if s in hot:
            continue
        dl = sorted(ds)
        for i, a in enumerate(dl):
            for b in dl[i + 1 :]:
                # closure edge in its (degree, id)-oriented form
                la, lb = (a, b) if (deg[a], a) < (deg[b], b) else (b, a)
                if (la, lb) in oriented:
                    tri += 1
    [row] = _run(spark, sf_dir, "graph_triangles_capped")
    assert (
        row["n_nodes"],
        row["n_edges"],
        row["n_wedges"],
        row["n_triangles"],
        row["capped"],
        row["n_wedges_dropped"],
    ) == (len(deg), len(edges), n_wedges, tri, True, dropped)


def test_range_views_before_purchase_recount(spark, sf_dir, events):
    got = {
        r["purchase_id"]: (r["user_id"], r["n_views_1h"])
        for r in _run(spark, sf_dir, "join_range_views_before_purchase")
    }
    views = defaultdict(list)
    for e in events:
        if e["event_type"] == "view" and e["ts"] is not None:
            views[e["user_id"]].append(e["ts"])
    hour = timedelta(hours=1)
    exp = {}
    for e in events:
        if e["event_type"] != "purchase":
            continue
        n = (
            sum(1 for v in views[e["user_id"]] if e["ts"] - hour <= v <= e["ts"])
            if e["ts"] is not None
            else 0
        )
        exp[e["event_id"]] = (e["user_id"], n)
    assert got == exp
