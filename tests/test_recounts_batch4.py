"""Fourth recount batch: pivot/unpivot, grouping sets, hash sampling, and
token counting — independent sequential recomputation from raw parquet."""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from tests.test_independent_recounts import _clean, _hash60, _round_half_up
from yanwenxian_week3_data_pipeline_spark.constants import BPE_PIECE_REGEX


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pq.read_table(f"{sf_dir}/orders.parquet").to_pylist()


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    ).to_pylist()


def _fsum(vals, places=2):
    ds = [_round_half_up(v, places) for v in vals]
    return float(sum(ds)) if ds else None


def test_pivot_status_revenue_recount(spark, sf_dir, orders):
    got = {
        r["o_orderpriority"]: (r["total_F"], r["total_O"], r["total_P"])
        for r in _run(spark, sf_dir, "pivot_status_revenue")
    }
    cells = defaultdict(list)
    prios = set()
    for o in orders:
        prios.add(o["o_orderpriority"])
        cells[(o["o_orderpriority"], o["o_orderstatus"])].append(o["o_totalprice"])
    exp = {
        p: tuple(_fsum(cells.get((p, s), [])) for s in ("F", "O", "P"))
        for p in prios
    }
    assert got == exp


def test_unpivot_recount(spark, sf_dir, lineitem):
    got = {
        (r["l_returnflag"], r["measure"]): (r["total"], r["n"])
        for r in _run(spark, sf_dir, "unpivot_charge_components")
    }
    exp = {}
    for m in ("l_extendedprice", "l_discount", "l_tax"):
        per = defaultdict(list)
        for li in lineitem:
            per[li["l_returnflag"]].append(li[m])
        for flag, vals in per.items():
            exp[(flag, m)] = (_fsum(vals, 6), len(vals))
    assert got == exp


def test_sample_hash_recount(spark, sf_dir, orders):
    got = {
        r["o_orderstatus"]: (r["n_sampled"], r["sampled_price"])
        for r in _run(spark, sf_dir, "sample_hash_orders")
    }
    per = defaultdict(list)
    for o in orders:
        if _hash60(str(o["o_orderkey"])) % 100 < 5:
            per[o["o_orderstatus"]].append(o["o_totalprice"])
    exp = {s: (len(v), _fsum(v)) for s, v in per.items()}
    assert got == exp
    # determinism sanity: the sample is a fixed ~5% slice of orders
    n = sum(v[0] for v in exp.values())
    assert 0 < n < len(orders) // 10


def test_rollup_and_cube_recount(spark, sf_dir, orders, lineitem):
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): (
            r["n_orders"],
            r["total_price"],
            r["g_status"],
            r["g_priority"],
        )
        for r in _run(spark, sf_dir, "groupby_rollup_orders")
    }
    base = defaultdict(list)
    for o in orders:
        base[(o["o_orderstatus"], o["o_orderpriority"])].append(o["o_totalprice"])
    exp = {}
    for (s, p), vals in base.items():
        exp[(s, p)] = (len(vals), _fsum(vals), 0, 0)
    by_status = defaultdict(list)
    for o in orders:
        by_status[o["o_orderstatus"]].append(o["o_totalprice"])
    for s, vals in by_status.items():
        exp[(s, None)] = (len(vals), _fsum(vals), 0, 1)
    allv = [o["o_totalprice"] for o in orders]
    exp[(None, None)] = (len(allv), _fsum(allv), 1, 1)
    assert got == exp

    got_cube = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["sum_qty"])
        for r in _run(spark, sf_dir, "groupby_cube_lineitem")
    }
    cells = defaultdict(list)
    for li in lineitem:
        cells[(li["l_returnflag"], li["l_linestatus"])].append(li["l_quantity"])
    exp_cube = {}
    for (f, s), vals in cells.items():
        exp_cube[(f, s)] = (len(vals), _fsum(vals))
    for f in {k[0] for k in cells}:
        vals = [q for (ff, _s), qs in cells.items() if ff == f for q in qs]
        exp_cube[(f, None)] = (len(vals), _fsum(vals))
    for s in {k[1] for k in cells}:
        vals = [q for (_f, ss), qs in cells.items() if ss == s for q in qs]
        exp_cube[(None, s)] = (len(vals), _fsum(vals))
    allq = [li["l_quantity"] for li in lineitem]
    exp_cube[(None, None)] = (len(allq), _fsum(allq))
    assert got_cube == exp_cube


def test_token_count_recount(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_pieces"])
        for r in _run(spark, sf_dir, "text_token_count")
    }
    pat = re.compile(BPE_PIECE_REGEX)
    exp = {}
    for d in docs:
        c = _clean(d["text"])
        toks = c.split(" ") if c else []
        exp[d["doc_id"]] = (len(toks), len(pat.findall(c)))
    assert got == exp
