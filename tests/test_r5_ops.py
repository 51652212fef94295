"""Round-5 operator wave: independent pure-Python references for
docs_token_budget_waterfill, docs_stratified_split, emb_int8_quant_error,
docs_contamination_report, and text_bpe_encode_topk. Same discipline as
test_independent_recounts.py: sequential recomputation from raw parquet,
sharing only frozen constants/definitions with the engine."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

from tests.test_independent_recounts import (
    _clean,
    _grams5,
    _hash60,
    _round_half_up,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


def _hash52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_token_budget_waterfill_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import BUDGET_DEN

    got = {
        r["source"]: (r["n_tokens"], r["kept_tokens"], r["keep_rate"])
        for r in _run(spark, sf_dir, "docs_token_budget_waterfill")
    }

    per = defaultdict(int)
    for d in documents:
        c = _clean(d["text"])
        per[d["source"]] += len(c.split(" ")) if c else 0
    rows = sorted((n, s) for s, n in per.items())
    total = sum(n for n, _ in rows)
    T, S = total // BUDGET_DEN, len(rows)
    cum = k = cum_k = 0
    for i, (n, _s) in enumerate(rows, start=1):
        cum += n
        if cum + n * (S - i) <= T:
            k, cum_k = i, cum
    c_level = rows[-1][0] if k == S else (T - cum_k) // (S - k)

    exp = {}
    for s, n in per.items():
        kept = min(n, c_level)
        exp[s] = (n, kept, float(_round_half_up(kept / max(n, 1), 6)))
    assert got == exp
    # water-fill invariants: budget respected, and the level is maximal
    assert sum(v[1] for v in exp.values()) <= T
    assert (
        k == S
        or sum(min(n, c_level + 1) for n, _ in rows) > T
    )


def test_stratified_split_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import SPLIT_VAL_DEN

    got = {
        (r["lang"], r["source"]): (
            r["n_docs"],
            r["n_val"],
            r["n_train"],
            r["val_id_sum"],
        )
        for r in _run(spark, sf_dir, "docs_stratified_split")
    }

    strata = defaultdict(list)
    for d in documents:
        strata[(d["lang"], d["source"])].append(d["doc_id"])
    exp = {}
    for key, ids in strata.items():
        ranked = sorted(ids, key=lambda i: (_hash52(str(i)), i))
        n_val = len(ids) // SPLIT_VAL_DEN
        val = ranked[:n_val]
        exp[key] = (len(ids), n_val, len(ids) - n_val, sum(val))
    assert got == exp


def test_int8_quant_error_recount(spark, sf_dir):
    got = {
        r["label"]: (r["n_vecs"], r["n_elems"], r["sum_err2_e12"], r["mse"])
        for r in _run(spark, sf_dir, "emb_int8_quant_error")
    }

    vecs = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    dims = len(vecs[0]["embedding"])
    mn = [min(float(v["embedding"][d]) for v in vecs) for d in range(dims)]
    mx = [max(float(v["embedding"][d]) for v in vecs) for d in range(dims)]
    agg = defaultdict(lambda: [set(), 0, 0])
    for v in vecs:
        cell = agg[v["label"]]
        cell[0].add(v["vec_id"])
        for d in range(dims):
            x = float(v["embedding"][d])
            if mx[d] > mn[d]:
                scale = (mx[d] - mn[d]) / 255.0
                q = min(255.0, max(0.0, math.floor((x - mn[d]) / scale + 0.5)))
            else:
                scale, q = (mx[d] - mn[d]) / 255.0, 0.0
            err = x - (mn[d] + q * scale)
            cell[1] += 1
            cell[2] += int(math.floor(err * err * 1e12 + 0.5))
    exp = {
        lab: (len(s), n, e2, (e2 / n) / 1e12) for lab, (s, n, e2) in agg.items()
    }
    assert got == exp


def test_contamination_report_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        DECON_BENCH_MIN_BUCKET,
        DECON_HASH_SEED,
        DECON_TRAIN_MAX_BUCKET,
    )

    got = {
        r["bench_id"]: (r["n_train_docs"], r["n_leaked_grams"])
        for r in _run(spark, sf_dir, "docs_contamination_report")
    }

    dg = {}
    for d in documents:
        c = _clean(d["text"])
        toks = c.split(" ") if c else []
        dg[d["doc_id"]] = (
            _hash60(str(d["doc_id"])) % 1000,
            _grams5(toks, DECON_HASH_SEED),
        )
    exp = {}
    for bid, (bkt, bgrams) in dg.items():
        if bkt < DECON_BENCH_MIN_BUCKET:
            continue
        docs, grams = set(), set()
        for tid, (tbkt, tgrams) in dg.items():
            if tbkt >= DECON_TRAIN_MAX_BUCKET:
                continue
            inter = tgrams & bgrams
            if inter:
                docs.add(tid)
                grams |= inter
        if docs:
            exp[bid] = (len(docs), len(grams))
    assert got == exp


# ---------------------------------------------------------------------------
# BPE encode — sequential Python reference: greedy left-to-right merge
# application in learned-rank order (the classic encoder loop)
# ---------------------------------------------------------------------------

def _py_encode(word: str, merges: list[tuple[str, str]], end: str) -> list[str]:
    syms = list(word) + [end]
    for x, y in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == x and s == y:
                out[-1] = x + y
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_matches_python(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.operators.bpe import END_MARK
    from yanwenxian_week3_data_pipeline_spark.plans.lm_ext import (
        BPE_ENCODE_TOPK,
        BPE_MAX_WORD_LEN,
        BPE_MERGES,
        _q_bpe_encode,
        _word_counts,
    )
    from yanwenxian_week3_data_pipeline_spark.operators.bpe import bpe_learn

    got = [tuple(r) for r in _q_bpe_encode(spark, sf_dir).collect()]

    # merges from the engine's learn (its own independent test pins learn
    # against a sequential reference; this test pins the ENCODE fold)
    merges = [
        (r["x"], r["y"])
        for r in bpe_learn(spark, _word_counts(spark, sf_dir), BPE_MERGES).collect()
    ]
    wcounts: Counter = Counter()
    for d in documents:
        c = _clean(d["text"])
        for w in c.split(" ") if c else []:
            if len(w) <= BPE_MAX_WORD_LEN:
                wcounts[w] += 1
    occ: Counter = Counter()
    nwords = defaultdict(set)
    for w, n in wcounts.items():
        for piece in _py_encode(w, merges, END_MARK):
            occ[piece] += n
            nwords[piece].add(w)
    exp = sorted(
        ((p, c, len(nwords[p])) for p, c in occ.items()),
        key=lambda r: (-r[1], r[0]),
    )[:BPE_ENCODE_TOPK]
    assert got == exp


def test_bpe_encode_fold_unit(spark):
    """The Column fold on adversarial inputs: x==y runs (parity), chained
    merges, merge-created symbols that must NOT re-merge."""
    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.operators.bpe import (
        END_MARK,
        bpe_encode_expr,
        word_syms_expr,
    )

    words = ["aaaa", "aaa", "abab", "ba", "b"]
    merges = [("a", "a"), ("a", "b"), ("aa", "aa")]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["pieces"]
        for r in df.select(
            "word",
            bpe_encode_expr(word_syms_expr(F.col("word")), merges).alias("pieces"),
        ).collect()
    }
    exp = {w: _py_encode(w, merges, END_MARK) for w in words}
    assert got == exp


# ---------------------------------------------------------------------------
# sim_rrf_hybrid — sequential recount of both retrievers and the fusion
# ---------------------------------------------------------------------------

def test_rrf_hybrid_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.constants import MINHASH_SHINGLE_K
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        RRF_K,
        RRF_PER_LIST,
        RRF_QUERY_DOCS,
        RRF_TOPK,
    )

    got = [tuple(r) for r in _run(spark, sf_dir, "sim_rrf_hybrid")]

    feats_tok, feats_shin = {}, {}
    for d in documents:
        c = _clean(d["text"])
        toks = c.split(" ") if c else []
        feats_tok[d["doc_id"]] = set(toks)
        feats_shin[d["doc_id"]] = {
            " ".join(toks[i : i + MINHASH_SHINGLE_K])
            for i in range(len(toks) - MINHASH_SHINGLE_K + 1)
        }

    def ranked(feats):
        out = {}
        for q in RRF_QUERY_DOCS:
            scores = [
                (len(feats[q] & feats[d]), d)
                for d in feats
                if d != q and feats[q] & feats[d]
            ]
            scores.sort(key=lambda r: (-r[0], r[1]))
            out[q] = {
                d: rank
                for rank, (_s, d) in enumerate(scores[:RRF_PER_LIST], start=1)
            }
        return out

    ra, rb = ranked(feats_tok), ranked(feats_shin)
    exp = []
    for q in RRF_QUERY_DOCS:
        fused = []
        for d in set(ra[q]) | set(rb[q]):
            s = 0
            if d in ra[q]:
                s += 1000000 // (RRF_K + ra[q][d])
            if d in rb[q]:
                s += 1000000 // (RRF_K + rb[q][d])
            fused.append((d, s))
        fused.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d, s) in enumerate(fused[:RRF_TOPK], start=1):
            exp.append((q, d, s, rank))
    assert got == sorted(exp, key=lambda r: (r[0], r[3]))


# ---------------------------------------------------------------------------
# emb_kmeans_exact — sequential Lloyd replay on the quantized integers
# ---------------------------------------------------------------------------

def test_kmeans_exact_matches_python(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.operators.kmeans_exact import (
        KM_OFFSET,
        KM_SCALE,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import (
        KM_K,
        KM_ROUNDS,
    )

    got = {
        r["cell"]: (r["n_vecs"], r["inertia_e6"], r["centroid_sum"])
        for r in _run(spark, sf_dir, "emb_kmeans_exact")
    }

    vecs = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    sq = {
        v["vec_id"]: [
            int(math.floor(float(x) * KM_SCALE + 0.5)) + KM_OFFSET
            for x in v["embedding"]
        ]
        for v in vecs
    }
    dims = len(next(iter(sq.values())))
    cents = {c: list(sq[c]) for c in range(KM_K)}

    def assign(cents):
        return {
            v: min(
                (sum((a - b) * (a - b) for a, b in zip(x, cents[c])), c)
                for c in cents
            )
            for v, x in sq.items()
        }

    for _ in range(KM_ROUNDS):
        a = assign(cents)
        sums = {}
        for v, (_d, c) in a.items():
            s = sums.setdefault(c, [[0] * dims, 0])
            s[1] += 1
            for i, val in enumerate(sq[v]):
                s[0][i] += val
        cents = {
            c: ([s // sums[c][1] for s in sums[c][0]] if c in sums else cents[c])
            for c in range(KM_K)
        }
    fa = assign(cents)
    stats = {}
    for v, (d, c) in fa.items():
        st = stats.setdefault(c, [0, 0])
        st[0] += 1
        st[1] += d
    exp = {
        c: (n, d // KM_SCALE, sum(cents[c])) for c, (n, d) in stats.items()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# tbl_compaction_plan — sequential capacity-binning replay over hours
# ---------------------------------------------------------------------------

def test_compaction_plan_recount(spark, sf_dir):
    from datetime import datetime

    from yanwenxian_week3_data_pipeline_spark.plans.lakehouse_ext import (
        COMPACT_TARGET_ROWS,
    )

    got = {
        (r["day"], r["grp"]): (
            r["n_partitions"],
            r["total_rows"],
            r["hr_lo"],
            r["hr_hi"],
            r["needs_compaction"],
        )
        for r in _run(spark, sf_dir, "tbl_compaction_plan")
    }

    events = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    hourly = defaultdict(int)
    for e in events:
        hourly[(e["ts"].date(), e["ts"].hour)] += 1
    exp = {}
    days = defaultdict(list)
    for (day, hr), n in hourly.items():
        days[day].append((hr, n))
    for day, rows in days.items():
        rows.sort()
        cum = 0
        for hr, n in rows:
            grp = cum // COMPACT_TARGET_ROWS
            key = (datetime.combine(day, datetime.min.time()), grp)
            if key not in exp:
                exp[key] = [0, 0, hr, hr]
            cell = exp[key]
            cell[0] += 1
            cell[1] += n
            cell[3] = hr
            cum += n
    exp = {
        k: (p, t, lo, hi, p > 1) for k, (p, t, lo, hi) in exp.items()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# dedup_embedding_lsh degenerate-bucket guard
# ---------------------------------------------------------------------------

def test_emb_lsh_degenerate_bucket_guard(spark, monkeypatch):
    import yanwenxian_week3_data_pipeline_spark.constants as C
    from yanwenxian_week3_data_pipeline_spark.operators.similarity import (
        dedup_embedding_lsh,
    )

    dim = C.EMB_DIM
    base = [1.0] + [0.0] * (dim - 1)
    near = [1.0, 0.05] + [0.0] * (dim - 2)  # cosine ~0.9988 >= 0.99... no
    # cosine(base, near) = 1/sqrt(1.0025) = 0.99875 -> passes 0.99 threshold
    degenerate = [0.0] * (dim - 1) + [1.0]
    rows = [(0, base), (1, near)] + [(100 + i, degenerate) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # ungated: the 40-clone cluster floods the output with C(40,2) pairs
    pairs_open = {
        (r["id_a"], r["id_b"])
        for r in dedup_embedding_lsh(df, 0.99).collect()
    }
    assert (0, 1) in pairs_open
    assert sum(1 for a, b in pairs_open if a >= 100 and b >= 100) == 40 * 39 // 2

    # gated (cap forced below the clone-cluster bucket): degenerate pairs
    # are cut, the genuine near-dup pair survives in its small bucket
    monkeypatch.setattr(C, "EMB_LSH_MAX_BUCKET_ABS", 5)
    monkeypatch.setattr(C, "EMB_LSH_DEGEN_FACTOR", 1)
    pairs_gated = {
        (r["id_a"], r["id_b"])
        for r in dedup_embedding_lsh(df, 0.99).collect()
    }
    assert (0, 1) in pairs_gated
    assert not any(a >= 100 and b >= 100 for a, b in pairs_gated)
