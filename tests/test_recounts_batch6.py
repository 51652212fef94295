"""Sixth recount batch: the r6 query wave (within-doc repetition ratio,
keep-best exact-dup clusters, Zipf slope) — independent sequential
recomputation from raw parquet with plain dicts/sets."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime

import pyarrow.parquet as pq
import pytest

from tests.test_independent_recounts import _clean, _quality, _round_half_up
from yanwenxian_week3_data_pipeline_spark.constants import (
    REP_DUP_FRAC_MAX,
    REP_NGRAM,
    ZIPF_LN_SCALE,
    ZIPF_TOP_K,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pylist()


def test_repetition_ratio_recount(spark, sf_dir, documents):
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_repetitive"],
            r["gram_positions"],
            r["distinct_grams"],
            r["corpus_dup_frac"],
        )
        for r in _run(spark, sf_dir, "docs_repetition_ratio")
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_docs, n_rep, n5, d5
    for d in documents:
        toks = _clean(d["text"]).split(" ") if _clean(d["text"]) else []
        n5 = max(len(toks) - (REP_NGRAM - 1), 0)
        grams = {
            " ".join(toks[i : i + REP_NGRAM]) for i in range(n5)
        }
        d5 = len(grams)
        dup = float(_round_half_up((n5 - d5) / max(n5, 1), 6))
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += 1 if (n5 > 0 and dup > REP_DUP_FRAC_MAX) else 0
        a[2] += n5
        a[3] += d5
    exp = {
        lang: (
            a[0],
            a[1],
            a[2],
            a[3],
            float(_round_half_up((a[2] - a[3]) / max(a[2], 1), 6)),
        )
        for lang, a in agg.items()
    }
    assert got == exp


def test_best_of_cluster_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import (
        BEST_COPY_OFFSET,
        BEST_HEAD_TOKENS,
        BEST_JUNK_TAIL,
    )

    got = {
        r["keep_id"]: (r["n_copies"], r["best_score"])
        for r in _run(spark, sf_dir, "docs_best_of_cluster")
    }
    rows = [(d["doc_id"], d["text"]) for d in documents] + [
        (d["doc_id"] + BEST_COPY_OFFSET, d["text"] + BEST_JUNK_TAIL)
        for d in documents
        if d["doc_id"] % 7 == 0
    ]
    # cluster by the canonical-head TOKEN STRING itself (stronger than
    # re-deriving the hash): identical head <=> identical hash60
    clusters = defaultdict(list)
    for did, text in rows:
        c = _clean(text)
        toks = c.split(" ") if c else []
        head = " ".join(toks[:BEST_HEAD_TOKENS])
        _nt, score = _quality(c)
        clusters[head].append((score, -did))
    exp = {}
    for members in clusters.values():
        score, ni = max(members)
        exp[-ni] = (len(members), float(score))
    assert got == exp
    n_multi = sum(1 for n, _s in got.values() if n > 1)
    assert n_multi > 0  # the degraded re-captures form real clusters
    # within a mixed cluster the junk tail always loses at fixture doc
    # lengths (the alpha-ratio drop, weight 0.4, dominates the capped
    # len_term gain), so every multi-member cluster keeps an ORIGINAL —
    # this pins the argmax to the score, not an id-order accident
    assert all(k < BEST_COPY_OFFSET for k, (n, _s) in got.items() if n > 1)
    # copies of sub-head-length originals get junk tokens INTO the head,
    # so they form their own singleton clusters — they must appear as
    # keep_ids with n_copies == 1, never swallow their original
    assert any(
        k >= BEST_COPY_OFFSET and n == 1 for k, (n, _s) in got.items()
    )


def test_tokenizer_fertility_recount(spark, sf_dir, documents):
    import re as _re

    from yanwenxian_week3_data_pipeline_spark.constants import BPE_PIECE_REGEX

    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_tokens"],
            r["n_pieces"],
            r["n_chars"],
            r["fertility"],
            r["pieces_per_100_chars"],
        )
        for r in _run(spark, sf_dir, "text_tokenizer_fertility")
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for d in documents:
        c = _clean(d["text"])
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += len(c.split(" ")) if c else 0
        a[2] += len(_re.findall(BPE_PIECE_REGEX, c))
        a[3] += len(c)
    exp = {
        lang: (
            a[0],
            a[1],
            a[2],
            a[3],
            float(_round_half_up(a[2] / max(a[1], 1), 6)),
            float(_round_half_up(a[2] * 100 / max(a[3], 1), 6)),
        )
        for lang, a in agg.items()
    }
    assert got == exp


def test_emb_knn_graph_recount(spark, sf_dir):
    """Sequential rebuild of the approximate kNN graph: hyperplane band
    values via the same left-to-right float folds both engines use,
    count-adaptive modulus from the frozen step table, bucket guard,
    both-direction candidates, exact cosine, per-vector top-k."""
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
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import EMB_KNN_K

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_pylist()
    }
    n = len(vecs)
    bmod = EMB_LSH_BMOD_MAX
    for thr, m in EMB_LSH_ADAPTIVE_STEPS:
        if n < thr:
            bmod = m
            break
    planes = hyperplane_matrix(EMB_LSH_BANDS * EMB_LSH_BITS_MAX, EMB_DIM, EMB_LSH_SEED)

    def band_vals(v):
        vals = []
        for b in range(EMB_LSH_BANDS):
            val = 0
            for j in range(EMB_LSH_BITS_MAX):
                p = planes[b * EMB_LSH_BITS_MAX + j]
                dot = 0.0
                for x, pl in zip(v, p):  # sequential fold, both engines' order
                    dot += float(x) * float(pl)
                if dot >= 0:
                    val += 1 << j
            vals.append(val % bmod)
        return vals

    buckets = defaultdict(list)
    for vid, v in vecs.items():
        for b, val in enumerate(band_vals(v)):
            buckets[(b, val)].append(vid)
    cap = max(EMB_LSH_MAX_BUCKET_ABS, (EMB_LSH_DEGEN_FACTOR * n) // bmod)
    cand = defaultdict(set)
    for members in buckets.values():
        if len(members) > cap:
            continue
        for a in members:
            for b in members:
                if a != b:
                    cand[a].add(b)

    def cosine(a, b):
        va, vb = vecs[a], vecs[b]
        dot = na = nb = 0.0
        for x, y in zip(va, vb):
            dot += float(x) * float(y)
        for x in va:
            na += float(x) * float(x)
        for y in vb:
            nb += float(y) * float(y)
        return float(_round_half_up(dot / (math.sqrt(na) * math.sqrt(nb)), 6))

    exp = {}
    for vid, nbs in cand.items():
        ranked = sorted(((-cosine(vid, nb), nb) for nb in nbs))[:EMB_KNN_K]
        for rank, (negc, nb) in enumerate(ranked, start=1):
            exp[(vid, nb)] = (rank, -negc)
    got = {
        (r["vec_id"], r["neighbor_id"]): (r["knn_rank"], r["cosine"])
        for r in _run(spark, sf_dir, "emb_knn_graph")
    }
    assert got == exp
    assert len(got) > 0


def test_pack_sequences_recount(spark, sf_dir, documents):
    """Sequential rebuild of sequence packing: per source in doc_id
    order, running token total, bin = floor(cum_before / budget)."""
    from yanwenxian_week3_data_pipeline_spark.constants import PACK_TOKEN_BUDGET

    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in _run(spark, sf_dir, "docs_pack_sequences")
    }
    docs_full = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    per_source = defaultdict(list)
    for d in docs_full:
        c = _clean(d["text"])
        per_source[d["source"]].append(
            (d["doc_id"], len(c.split(" ")) if c else 0)
        )
    exp: dict = defaultdict(lambda: [0, 0])
    for src, docs in per_source.items():
        cum = 0
        for _did, nt in sorted(docs):
            b = cum // PACK_TOKEN_BUDGET
            cum += nt
            e = exp[(src, b)]
            e[0] += 1
            e[1] += nt
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_compaction_plan_recount(spark, sf_dir):
    """Sequential rebuild of the compaction planner: hourly row counts,
    per-day running-total capacity binning, per-group rollup."""
    from yanwenxian_week3_data_pipeline_spark.plans.lakehouse_ext import (
        COMPACT_TARGET_ROWS,
    )

    events = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).to_pylist()
    hourly: dict = defaultdict(int)
    for e in events:
        if e["ts"] is None:
            continue
        hourly[(e["ts"].date(), e["ts"].hour)] += 1
    per_day = defaultdict(list)
    for (day, hr), n in hourly.items():
        per_day[day].append((hr, n))
    exp = {}
    for day, hrs in per_day.items():
        cum = 0
        groups: dict = defaultdict(list)
        for hr, n in sorted(hrs):
            groups[cum // COMPACT_TARGET_ROWS].append((hr, n))
            cum += n
        for grp, members in groups.items():
            key = (datetime(day.year, day.month, day.day), grp)
            exp[key] = (
                len(members),
                sum(n for _h, n in members),
                min(h for h, _n in members),
                max(h for h, _n in members),
                len(members) > 1,
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
    assert got == exp


def test_zipf_slope_recount(spark, sf_dir, documents):
    [row] = _run(spark, sf_dir, "text_zipf_slope")
    freq = Counter()
    for d in documents:
        c = _clean(d["text"])
        if c:
            freq.update(c.split(" "))
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_K]
    xs, ys = [], []
    for rank, (_tok, f) in enumerate(top, start=1):
        xs.append(int(_round_half_up(math.log(rank) * ZIPF_LN_SCALE, 0)))
        ys.append(int(_round_half_up(math.log(f) * ZIPF_LN_SCALE, 0)))
    k = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = float(_round_half_up((k * sxy - sx * sy) / (k * sxx - sx * sx), 6))
    assert (
        row["k_tokens"],
        row["sum_lnrank_milli"],
        row["sum_lnfreq_milli"],
        row["zipf_slope"],
    ) == (k, sx, sy, slope)
    assert -2.0 < slope < 0.0  # Zipf-ish decay
