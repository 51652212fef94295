"""Recount batch 7 — the sketch family's sequential third opinions.

The r6 verdict flagged these as the last oracle-only families without an
independent replay: the existing recounts for events_hll_rollup_daily and
agg_heavy_hitters_mg recompute the EXACT parts but take the sketch claims
(the HLL ±5 % bound, the MG candidate-set soundness) on Spark's word, and
dedup_survivors_by_priority had no recount at all (its Spark build and
DuckDB oracle share the minhash recipe end-to-end — agreement is not
intent). Everything here is plain Python dicts/sets over raw parquet,
sharing only the frozen constants (hash definitions, band/row counts,
thresholds) with the engine.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from yanwenxian_week3_data_pipeline_spark.constants import (
    DEDUP_MAX_BUCKET,
    HTML_ENTITIES,
    MINHASH_BANDS,
    MINHASH_JACCARD_THRESHOLD,
    MINHASH_NUM_HASHES,
    MINHASH_PRIME,
    MINHASH_ROWS_PER_BAND,
    MINHASH_SHINGLE_K,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pylist()


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


_WS = re.compile("[ \t\n\r\f\x0b\xa0]+")


def _clean(t: str | None) -> str:
    if t is None:
        return ""
    for ent, ch in HTML_ENTITIES:
        t = t.replace(ent, ch)
    return _WS.sub(" ", t).strip(" ")


def _round_half_up(x: float, places: int) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)


# ---------------------------------------------------------------------------
# dedup_survivors_by_priority — FULL sequential replay of the chain:
# clean -> 3-gram shingles -> one md5 per shingle split into the (h1, h2)
# Kirsch-Mitzenmacher pair -> 32 min-hashes -> 8 band keys (md5 of the
# 4-value slice) -> bucket pairs (guard <= DEDUP_MAX_BUCKET) -> exact
# Jaccard verify -> union-find -> min-label clusters -> priority pick.
# ---------------------------------------------------------------------------


def _shingles(text: str | None) -> set[str]:
    toks = _clean(text).split(" ") if _clean(text) else []
    k = MINHASH_SHINGLE_K
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _signature(shingles: set[str]) -> list[int]:
    p = MINHASH_PRIME
    sig = [None] * MINHASH_NUM_HASHES
    for s in shingles:
        d = hashlib.md5(s.encode()).hexdigest()
        h1 = int(d[0:15], 16)  # 60-bit half
        h2 = int(d[15:29], 16)  # 56-bit half (hex chars 16..29, 1-based)
        for i in range(MINHASH_NUM_HASHES):
            g = h1 if i == 0 else (h1 + (i * h2) % p) % p
            if sig[i] is None or g < sig[i]:
                sig[i] = g
    return sig


def test_survivors_by_priority_full_replay(spark, sf_dir, documents):
    # --- minhash pairs ---
    sh = {d["doc_id"]: _shingles(d["text"]) for d in documents}
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for doc_id in sorted(sh):
        if not sh[doc_id]:
            continue  # empty-shingle docs drop out at the explode
        sig = _signature(sh[doc_id])
        for b in range(MINHASH_BANDS):
            sl = sig[b * MINHASH_ROWS_PER_BAND : (b + 1) * MINHASH_ROWS_PER_BAND]
            key = hashlib.md5(",".join(str(v) for v in sl).encode()).hexdigest()
            buckets[(b, key)].append(doc_id)
    cand = set()
    for ids in buckets.values():
        if len(ids) > DEDUP_MAX_BUCKET:
            continue  # mega-bucket guard
        for i, a in enumerate(ids):
            for b_ in ids[i + 1 :]:
                cand.add((min(a, b_), max(a, b_)))
    pairs = []
    thr = Decimal(repr(MINHASH_JACCARD_THRESHOLD))
    for a, b_ in sorted(cand):
        inter = len(sh[a] & sh[b_])
        union = len(sh[a]) + len(sh[b_]) - inter
        if union and _round_half_up(inter / union, 6) >= thr:
            pairs.append((a, b_))
    assert pairs, "fixture must contain verified near-dup pairs"

    # --- union-find -> min-label clusters ---
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b_ in pairs:
        ra, rb = find(a), find(b_)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_members: dict[int, list[int]] = defaultdict(list)
    for node in parent:
        comp_members[find(node)].append(node)
    cluster_of = {d["doc_id"]: d["doc_id"] for d in documents}
    for root, members in comp_members.items():
        lab = min(min(members), root)
        for m in members:
            cluster_of[m] = lab

    # --- priority pick over multi-member clusters ---
    prio: dict[int, int | None] = {}
    for d in documents:
        m = re.search(r"([0-9]+)", d["source"] or "")
        prio[d["doc_id"]] = int(m.group(1)) % 5 if m else None
    clusters: dict[int, list[int]] = defaultdict(list)
    for doc_id, cl in cluster_of.items():
        clusters[cl].append(doc_id)
    exp = {}
    for cl, members in clusters.items():
        if len(members) < 2:
            continue
        # desc priority NULLS LAST, then asc doc_id — Spark's F.desc default
        best = min(
            members,
            key=lambda x: (prio[x] is None, -(prio[x] if prio[x] is not None else 0), x),
        )
        exp[cl] = (len(members), best, prio[best])
    assert exp, "fixture must contain multi-member clusters"

    got = {
        r["cluster_id"]: (r["n_members"], r["survivor_id"], r["survivor_priority"])
        for r in _run(spark, sf_dir, "dedup_survivors_by_priority")
    }
    assert got == exp


# ---------------------------------------------------------------------------
# events_hll_rollup_daily — independent 2^p-register HLL replay. The
# existing recount pins n_days / exact counts but takes hll_within_bound
# (derived from Spark's DataSketches estimate) on faith. This replay
# builds its OWN classic HLL (p = 12, md5-derived 64-bit hash), sketches
# each day, merges days into weeks by register max — the same
# union-then-estimate the query claims — and asserts the merged estimate
# lands within the query's ±5 % bound on every week. It validates the
# bound CLAIM with an independent sketch, not DataSketches bit-parity
# (which would just re-vendor the library).
# ---------------------------------------------------------------------------

_HLL_P = 12
_HLL_M = 1 << _HLL_P


def _hll_add(regs: list[int], value: str) -> None:
    h = int(hashlib.md5(value.encode()).hexdigest()[:16], 16)  # 64 bits
    idx = h >> (64 - _HLL_P)
    rest = h & ((1 << (64 - _HLL_P)) - 1)
    rho = (64 - _HLL_P) - rest.bit_length() + 1
    if rho > regs[idx]:
        regs[idx] = rho


def _hll_estimate(regs: list[int]) -> float:
    m = _HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def test_hll_rollup_register_replay(spark, sf_dir, events):
    day_users: dict[tuple[datetime, object], set] = defaultdict(set)
    for e in events:
        if e["user_id"] is None:
            continue
        d = e["ts"].date()
        monday = datetime.combine(d - timedelta(days=d.weekday()), datetime.min.time())
        day_users[(monday, d)].add(e["user_id"])

    week_regs: dict[datetime, list[int]] = defaultdict(lambda: [0] * _HLL_M)
    week_exact: dict[datetime, set] = defaultdict(set)
    for (week, _day), users in day_users.items():
        regs = [0] * _HLL_M
        for u in users:
            _hll_add(regs, str(u))
        wr = week_regs[week]
        for i, r in enumerate(regs):  # union = register max
            if r > wr[i]:
                wr[i] = r
        week_exact[week] |= users

    assert week_exact, "fixture must contain weeks"
    for week, regs in week_regs.items():
        exact = len(week_exact[week])
        est = _hll_estimate(regs)
        assert abs(est - exact) / max(exact, 1) <= 0.05, (week, est, exact)

    got = _run(spark, sf_dir, "events_hll_rollup_daily")
    assert got and all(r["hll_within_bound"] for r in got)
    assert {r["week"]: r["exact_distinct_users"] for r in got} == {
        w: len(u) for w, u in week_exact.items()
    }


# ---------------------------------------------------------------------------
# agg_heavy_hitters_mg — candidate-set soundness replay. The query's
# correctness argument is: a key with global frequency > n/k exceeds
# n_p/k in >= 1 partition (pigeonhole), and MG(k) never evicts such a
# key — so phase 1's candidate union provably contains every true heavy
# hitter no matter how Spark partitions the scan. The existing recount
# checks the final exact answer; this replays the MG sketch itself over
# ADVERSARIAL partitionings (single, uneven, interleaved, many-splits)
# and asserts the soundness invariant the plan relies on. Pure Python,
# no Spark session needed.
# ---------------------------------------------------------------------------


def _mg(values: list, k: int) -> dict:
    counters: dict = {}
    for v in values:
        if v is None:
            continue
        if v in counters:
            counters[v] += 1
        elif len(counters) < k - 1:
            counters[v] = 1
        else:
            counters = {key: c - 1 for key, c in counters.items() if c > 1}
    return counters


def test_heavy_hitters_mg_candidate_soundness(events):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import HH_K

    vals = [e["event_type"] for e in events]
    n = len(vals)
    counts: dict = defaultdict(int)
    for v in vals:
        if v is not None:
            counts[v] += 1
    true_hh = {v for v, c in counts.items() if c * HH_K > n}
    assert true_hh, "fixture must contain heavy hitters"

    def split(xs, cuts):
        out, prev = [], 0
        for c in cuts:
            out.append(xs[prev:c])
            prev = c
        out.append(xs[prev:])
        return out

    partitionings = [
        [vals],                                   # single partition
        split(vals, [n // 10, n // 3, n // 2]),   # uneven sizes
        [vals[i::7] for i in range(7)],           # interleaved round-robin
        split(vals, list(range(200, n, 200))),    # many small splits
        [sorted(vals, key=lambda v: (v is None, v))],  # worst case: sorted runs
    ]
    for parts in partitionings:
        cand = set()
        for p in parts:
            cand |= set(_mg(p, HH_K))
        assert true_hh <= cand, (true_hh - cand, len(parts))


# ---------------------------------------------------------------------------
# emb_knn_recall — sequential replay of BOTH sides of the recall gate:
# brute-force exact top-k for the sampled queries (sequential float folds,
# the engines' evaluation order) and the banded approximate graph (frozen
# adaptive step table, bucket guard, per-vector top-k), then the per-query
# recall ratio. Pins the reported recall VALUES, not just their shape.
# ---------------------------------------------------------------------------


def test_emb_knn_recall_replay(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.constants import (
        EMB_DIM,
        EMB_LSH_ADAPTIVE_STEPS,
        EMB_LSH_BANDS,
        EMB_LSH_BITS_MAX,
        EMB_LSH_BMOD_MAX,
        EMB_LSH_DEGEN_FACTOR,
        EMB_LSH_MAX_BUCKET_ABS,
        EMB_LSH_SEED,
    )
    from yanwenxian_week3_data_pipeline_spark.functions.vectors import (
        hyperplane_matrix,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        EMB_KNN_K,
        EMB_KNN_RECALL_MAX_QUERIES,
        EMB_KNN_RECALL_MOD,
    )

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_pylist()
    }

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    def cosine(a, b):
        return dot(vecs[a], vecs[b]) / math.sqrt(
            dot(vecs[a], vecs[a]) * dot(vecs[b], vecs[b])
        )

    sample = sorted(
        v
        for v in vecs
        if v % EMB_KNN_RECALL_MOD == 0
        and v < EMB_KNN_RECALL_MOD * EMB_KNN_RECALL_MAX_QUERIES
    )
    assert sample, "fixture must contain sampled query ids"
    exact = {
        q: {
            nb
            for _negc, nb in sorted(
                (-cosine(q, c), c) for c in vecs if c != q
            )[:EMB_KNN_K]
        }
        for q in sample
    }

    # approximate side: banding replay (frozen constants)
    n = len(vecs)
    bmod = EMB_LSH_BMOD_MAX
    for thr, m in EMB_LSH_ADAPTIVE_STEPS:
        if n < thr:
            bmod = m
            break
    planes = hyperplane_matrix(EMB_LSH_BANDS * EMB_LSH_BITS_MAX, EMB_DIM, EMB_LSH_SEED)
    buckets = defaultdict(list)
    for vid, v in vecs.items():
        for b in range(EMB_LSH_BANDS):
            val = 0
            for j in range(EMB_LSH_BITS_MAX):
                if dot(v, planes[b * EMB_LSH_BITS_MAX + j]) >= 0:
                    val += 1 << j
            buckets[(b, val % bmod)].append(vid)
    cap = max(EMB_LSH_MAX_BUCKET_ABS, (EMB_LSH_DEGEN_FACTOR * n) // bmod)
    cand = defaultdict(set)
    for members in buckets.values():
        if len(members) > cap:
            continue
        for a in members:
            for b_ in members:
                if a != b_:
                    cand[a].add(b_)
    approx = {}
    for q in sample:
        ranked = sorted(
            (float(_round_half_up(cosine(q, nb), 6)) * -1, nb) for nb in cand.get(q, ())
        )[:EMB_KNN_K]
        approx[q] = {nb for _negc, nb in ranked}

    exp = {}
    for q in sample:
        hits = len(exact[q] & approx[q])
        exp[q] = (
            len(exact[q]),
            hits,
            float(_round_half_up(hits / len(exact[q]), 6)),
        )
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall_at_k"])
        for r in _run(spark, sf_dir, "emb_knn_recall")
    }
    assert got == exp
    # the gate must measure something: at least one sampled query recalls
    # at least one true neighbour on every fixture scale
    assert any(h > 0 for _ne, h, _r in got.values())
