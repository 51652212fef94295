"""Pure-Python third implementations for the round-4 analytic additions
(decayed heavy hitters, A-priori triples, item-item CF). The oracle sweep
certifies Spark == DuckDB; these pin the SEMANTICS against independent
sequential code."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def baskets(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_orderkey, list(DISTINCT l_partkey)
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            GROUP BY l_orderkey"""
    ).fetchall()
    return {okey: sorted(parts) for okey, parts in rows}


def test_decayed_heavy_hitters_matches_python(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        _DECAY_HALFLIFE_S,
        _q_decayed_heavy_hitters,
    )

    got = {
        r["event_type"]: (r["n_events"], r["decayed_mass_micro"])
        for r in _q_decayed_heavy_hitters(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, epoch_us(ts) FROM
            read_parquet('{sf_dir}/events.parquet')
            WHERE event_type IS NOT NULL"""
    ).fetchall()
    ref = max(us for _t, us in rows)
    exp: dict[str, list[int]] = {}
    for t, us in rows:
        w = round(
            math.pow(2.0, -(ref - us) / (_DECAY_HALFLIFE_S * 1e6)) * 1e6
        )
        e = exp.setdefault(t, [0, 0])
        e[0] += 1
        e[1] += w
    assert got == {t: tuple(v) for t, v in exp.items()}


def test_basket_pairs_match_python(spark, sf_dir, baskets):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        _q_basket_pairs,
    )

    got = [tuple(r) for r in _q_basket_pairs(spark, sf_dir).collect()]

    pair_c: Counter = Counter()
    for parts in baskets.values():
        for p in combinations(parts, 2):
            pair_c[p] += 1
    exp = sorted(
        ((a, b, n) for (a, b), n in pair_c.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    assert got == exp


def test_frequent_triples_match_python(spark, sf_dir, baskets):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        _TRIPLE_MIN_SUP,
        _q_basket_triples,
    )

    got = [tuple(r) for r in _q_basket_triples(spark, sf_dir).collect()]

    pair_c: Counter = Counter()
    for parts in baskets.values():
        for p in combinations(parts, 2):
            pair_c[p] += 1
    freq_pairs = {p for p, n in pair_c.items() if n >= _TRIPLE_MIN_SUP}
    tri_c: Counter = Counter()
    for parts in baskets.values():
        for t in combinations(parts, 3):
            if (
                (t[0], t[1]) in freq_pairs
                and (t[0], t[2]) in freq_pairs
                and (t[1], t[2]) in freq_pairs
            ):
                tri_c[t] += 1
    exp = sorted(
        (
            (t[0], t[1], t[2], n)
            for t, n in tri_c.items()
            if n >= _TRIPLE_MIN_SUP
        ),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )[:20]
    assert got == exp


def test_item_item_cf_matches_python(spark, sf_dir, baskets):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        _CF_ANCHORS,
        _CF_NEIGHBORS,
        _q_item_item_topk,
    )

    got = {
        (r["i"], r["j"]): (r["c_ij"], r["sim"], r["rank"])
        for r in _q_item_item_topk(spark, sf_dir).collect()
    }

    pair_c: Counter = Counter()
    item_c: Counter = Counter()
    for parts in baskets.values():
        for p in parts:
            item_c[p] += 1
        for a, b in combinations(parts, 2):
            pair_c[(a, b)] += 1
    sym: dict[tuple[int, int], int] = {}
    for (a, b), n in pair_c.items():
        sym[(a, b)] = n
        sym[(b, a)] = n
    co_total: Counter = Counter()
    for (a, _b), n in sym.items():
        co_total[a] += n
    anchors = sorted(co_total, key=lambda i: (-co_total[i], i))[:_CF_ANCHORS]
    exp = {}
    for i in anchors:
        neigh = [
            (j, n, round(n / math.sqrt(item_c[i] * item_c[j]), 6))
            for (a, j), n in sym.items()
            if a == i
        ]
        neigh.sort(key=lambda r: (-r[2], r[0]))
        for rank, (j, n, s) in enumerate(neigh[:_CF_NEIGHBORS], start=1):
            exp[(i, j)] = (n, s, rank)
    assert got == exp
