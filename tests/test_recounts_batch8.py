"""Recount batch 8 — the r7 new-operator wave: BM25 retrieval, corpus
unigram entropy, matryoshka prefix-dim recall. Sequential pure-Python
replays over raw parquet, sharing only frozen constants with the engine
(the standing rule: every new count-bearing query lands with a third
opinion in the same round)."""

from __future__ import annotations

import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from yanwenxian_week3_data_pipeline_spark.constants import (
    BM25_QUERY_TERMS,
    BM25_TOPK,
    EMB_PREFIX_DIM,
    EMB_PREFIX_K,
    HTML_ENTITIES,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


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


def _tokens(t: str | None) -> list[str]:
    c = _clean(t)
    return c.split(" ") if c else []


def _round_half_up(x: float, places: int) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)


def test_bm25_topk_recount(spark, sf_dir, documents):
    rows = [(d["doc_id"], _tokens(d["text"])) for d in documents]
    n_docs = len(rows)
    t_tokens = sum(len(toks) for _id, toks in rows)
    tf = {
        doc_id: [toks.count(t) for t in BM25_QUERY_TERMS] for doc_id, toks in rows
    }
    dl = {doc_id: len(toks) for doc_id, toks in rows}
    dfs = [
        sum(1 for doc_id, _ in rows if tf[doc_id][i] > 0)
        for i in range(len(BM25_QUERY_TERMS))
    ]
    idf_milli = [
        int(_round_half_up(math.log((n_docs + 1.0) / (dfs[i] + 0.5)) * 1000, 0))
        for i in range(len(BM25_QUERY_TERMS))
    ]
    scored = []
    for doc_id, _toks in rows:
        if sum(tf[doc_id]) == 0:
            continue
        s = 0.0
        for i in range(len(BM25_QUERY_TERMS)):
            num = 88 * t_tokens * tf[doc_id][i]
            den = 40 * t_tokens * tf[doc_id][i] + 12 * t_tokens + 36 * dl[doc_id] * n_docs
            s = s + float(idf_milli[i]) * (float(num) / float(den)) / 1000.0
        matched = sum(1 for i in range(len(BM25_QUERY_TERMS)) if tf[doc_id][i] > 0)
        scored.append((doc_id, matched, float(_round_half_up(s, 6))))
    exp = sorted(scored, key=lambda r: (-r[2], r[0]))[:BM25_TOPK]
    got = [
        (r["doc_id"], r["n_terms_matched"], r["bm25"])
        for r in _run(spark, sf_dir, "text_bm25_topk")
    ]
    assert got == exp
    assert len(got) == BM25_TOPK  # the fixed terms must match at every scale


def test_unigram_entropy_recount(spark, sf_dir, documents):
    counts: dict = defaultdict(int)
    for d in documents:
        for t in _tokens(d["text"]):
            counts[t] += 1
    t_tokens = sum(counts.values())
    s_clnc = sum(
        c * int(_round_half_up(math.log(float(c)) * 1000, 0))
        for c in counts.values()
    )
    lnt_milli = int(_round_half_up(math.log(float(t_tokens)) * 1000, 0))
    entropy = float(
        _round_half_up((lnt_milli * t_tokens - s_clnc) / (t_tokens * 1000.0), 6)
    )
    [r] = _run(spark, sf_dir, "text_unigram_entropy")
    assert (r["n_tokens"], r["vocab_size"], r["entropy_nats"]) == (
        t_tokens,
        len(counts),
        entropy,
    )
    # corpus-health sanity: entropy is positive and bounded by ln(vocab)
    assert 0 < entropy <= math.log(len(counts)) + 1e-9


def test_emb_prefix_recall_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
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

    def cos(a, b):
        return dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))

    sample = sorted(
        v
        for v in vecs
        if v % EMB_KNN_RECALL_MOD == 0
        and v < EMB_KNN_RECALL_MOD * EMB_KNN_RECALL_MAX_QUERIES
    )
    exp = {}
    for q in sample:
        full = {
            nb
            for _negc, nb in sorted(
                (-cos(vecs[q], vecs[c]), c) for c in vecs if c != q
            )[:EMB_PREFIX_K]
        }
        pre = {
            nb
            for _negc, nb in sorted(
                (
                    -cos(vecs[q][:EMB_PREFIX_DIM], vecs[c][:EMB_PREFIX_DIM]),
                    c,
                )
                for c in vecs
                if c != q
            )[:EMB_PREFIX_K]
        }
        hits = len(full & pre)
        exp[q] = (EMB_PREFIX_K, hits, float(_round_half_up(hits / EMB_PREFIX_K, 6)))
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall_at_k"])
        for r in _run(spark, sf_dir, "emb_prefix_dim_recall")
    }
    assert got == exp
    # truncation must lose SOMETHING on 64-dim near-random vectors (if it
    # didn't, the gate would be measuring nothing)
    assert any(h < EMB_PREFIX_K for _ne, h, _r in got.values())


# ---------------------------------------------------------------------------
# dedup_minhash_estimate_gate — replay the full minhash chain (as in
# batch 7's survivors replay) and the estimator: per verified pair,
# matching signature positions / num_hashes next to the exact Jaccard.
# ---------------------------------------------------------------------------


def test_minhash_estimate_gate_recount(spark, sf_dir, documents):
    import hashlib

    from yanwenxian_week3_data_pipeline_spark.constants import (
        DEDUP_MAX_BUCKET,
        MINHASH_BANDS,
        MINHASH_JACCARD_THRESHOLD,
        MINHASH_NUM_HASHES,
        MINHASH_PRIME,
        MINHASH_ROWS_PER_BAND,
        MINHASH_SHINGLE_K,
    )

    def shingles(text):
        toks = _tokens(text)
        k = MINHASH_SHINGLE_K
        if len(toks) < k:
            return set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def signature(sh_set):
        p = MINHASH_PRIME
        sig = [None] * MINHASH_NUM_HASHES
        for s in sh_set:
            d = hashlib.md5(s.encode()).hexdigest()
            h1, h2 = int(d[0:15], 16), int(d[15:29], 16)
            for i in range(MINHASH_NUM_HASHES):
                g = h1 if i == 0 else (h1 + (i * h2) % p) % p
                if sig[i] is None or g < sig[i]:
                    sig[i] = g
        return sig

    sh = {d["doc_id"]: shingles(d["text"]) for d in documents}
    sig = {i: signature(s) for i, s in sh.items() if s}
    buckets = defaultdict(list)
    for doc_id in sorted(sig):
        for b in range(MINHASH_BANDS):
            sl = sig[doc_id][b * MINHASH_ROWS_PER_BAND : (b + 1) * MINHASH_ROWS_PER_BAND]
            key = hashlib.md5(",".join(str(v) for v in sl).encode()).hexdigest()
            buckets[(b, key)].append(doc_id)
    cand = set()
    for ids in buckets.values():
        if len(ids) > DEDUP_MAX_BUCKET:
            continue
        for i, a in enumerate(ids):
            for b_ in ids[i + 1 :]:
                cand.add((min(a, b_), max(a, b_)))
    thr = Decimal(repr(MINHASH_JACCARD_THRESHOLD))
    exp = {}
    for a, b_ in sorted(cand):
        inter = len(sh[a] & sh[b_])
        union = len(sh[a]) + len(sh[b_]) - inter
        if not union:
            continue
        jac = _round_half_up(inter / union, 6)
        if jac < thr:
            continue
        nm = sum(1 for x, y in zip(sig[a], sig[b_]) if x == y)
        est = _round_half_up(nm / MINHASH_NUM_HASHES, 6)
        err = _round_half_up(abs(float(est) - float(jac)), 6)
        exp[(a, b_)] = (float(jac), float(est), float(err))
    assert exp, "fixture must contain verified pairs"
    got = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["jaccard_est"], r["abs_err"])
        for r in _run(spark, sf_dir, "dedup_minhash_estimate_gate")
    }
    assert got == exp


def test_ngram_novelty_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import NOVELTY_NGRAM

    k = NOVELTY_NGRAM
    doc_grams = {}
    for d in documents:
        toks = _tokens(d["text"])
        doc_grams[d["doc_id"]] = (
            {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            if len(toks) >= k
            else set()
        )
    first = {}
    for doc_id in sorted(doc_grams):
        for g in doc_grams[doc_id]:
            if g not in first or doc_id < first[g]:
                first[g] = doc_id
    by_source = defaultdict(lambda: [0, 0, 0])  # docs with grams? see below
    src = {d["doc_id"]: d["source"] for d in documents}
    for doc_id, grams in doc_grams.items():
        if not grams:
            continue  # docs with no 5-gram vanish at the explode
        cell = by_source[src[doc_id]]
        cell[0] += 1
        cell[1] += len(grams)
        cell[2] += sum(1 for g in grams if first[g] == doc_id)
    exp = {
        s: (nd, ng, nn, float(_round_half_up(nn / ng, 6)))
        for s, (nd, ng, nn) in by_source.items()
    }
    got = {
        r["source"]: (r["n_docs"], r["n_grams"], r["n_novel"], r["novelty_ratio"])
        for r in _run(spark, sf_dir, "docs_ngram_novelty_by_source")
    }
    assert got == exp
    # ingest-order novelty must strictly bind: some gram repeats somewhere
    assert any(nn < ng for _nd, ng, nn, _r in exp.values())


def test_source_lang_kl_recount(spark, sf_dir, documents):
    """Sequential replay of the per-source language-mixture KL gate:
    (source, lang) cells, milli-quantized per-cell log ratios, exact
    integer term sums, one final division per source."""
    cells = defaultdict(int)
    for d in documents:
        if d["lang"] is None or d["source"] is None:
            continue
        cells[(d["source"], d["lang"])] += 1
    n = sum(cells.values())
    n_s = defaultdict(int)
    c_l = defaultdict(int)
    for (s, l), c in cells.items():
        n_s[s] += c
        c_l[l] += c
    s_milli = defaultdict(int)
    for (s, l), c in cells.items():
        lr = int(_round_half_up(math.log((c * n) / (n_s[s] * c_l[l])) * 1000, 0))
        s_milli[s] += c * lr
    exp = {
        s: (n_s[s], float(_round_half_up(s_milli[s] / (n_s[s] * 1000.0), 6)))
        for s in n_s
    }
    got = {
        r["source"]: (r["n_docs"], r["kl_nats"])
        for r in _run(spark, sf_dir, "docs_source_lang_kl")
    }
    assert got == exp
    # milli-rounding can push a near-uniform source a hair below 0; real
    # divergence must stay far from pathological
    assert all(k > -0.001 for _n, k in exp.values())


def test_source_mirror_matrix_recount(spark, sf_dir, documents):
    """Sequential replay of dedup_source_mirror_matrix: the full minhash
    chain (as in the estimate-gate recount), then the unordered
    source x source aggregation with exact micro-int jaccard sums."""
    import hashlib

    from yanwenxian_week3_data_pipeline_spark.constants import (
        DEDUP_MAX_BUCKET,
        MINHASH_BANDS,
        MINHASH_JACCARD_THRESHOLD,
        MINHASH_NUM_HASHES,
        MINHASH_PRIME,
        MINHASH_ROWS_PER_BAND,
        MINHASH_SHINGLE_K,
    )

    def shingles(text):
        toks = _tokens(text)
        k = MINHASH_SHINGLE_K
        if len(toks) < k:
            return set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def signature(sh_set):
        p = MINHASH_PRIME
        sig = [None] * MINHASH_NUM_HASHES
        for s in sh_set:
            d = hashlib.md5(s.encode()).hexdigest()
            h1, h2 = int(d[0:15], 16), int(d[15:29], 16)
            for i in range(MINHASH_NUM_HASHES):
                g = h1 if i == 0 else (h1 + (i * h2) % p) % p
                if sig[i] is None or g < sig[i]:
                    sig[i] = g
        return sig

    sh = {d["doc_id"]: shingles(d["text"]) for d in documents}
    sig = {i: signature(s) for i, s in sh.items() if s}
    buckets = defaultdict(list)
    for doc_id in sorted(sig):
        for b in range(MINHASH_BANDS):
            sl = sig[doc_id][b * MINHASH_ROWS_PER_BAND : (b + 1) * MINHASH_ROWS_PER_BAND]
            key = hashlib.md5(",".join(str(v) for v in sl).encode()).hexdigest()
            buckets[(b, key)].append(doc_id)
    cand = set()
    for ids in buckets.values():
        if len(ids) > DEDUP_MAX_BUCKET:
            continue
        for i, a in enumerate(ids):
            for b_ in ids[i + 1 :]:
                cand.add((min(a, b_), max(a, b_)))

    thr = Decimal(repr(MINHASH_JACCARD_THRESHOLD))
    src = {d["doc_id"]: d["source"] for d in documents}
    agg = defaultdict(lambda: [0, 0])  # (src_a, src_b) -> [n_pairs, sum_jm]
    for a, b_ in sorted(cand):
        inter = len(sh[a] & sh[b_])
        union = len(sh[a]) + len(sh[b_]) - inter
        if not union:
            continue
        jac = _round_half_up(inter / union, 6)
        if jac < thr:
            continue
        # round(jaccard * 1e6) on the already-6dp-rounded double, as both
        # engines compute it
        jm = int(_round_half_up(float(jac) * 1000000.0, 0))
        key = (min(src[a], src[b_]), max(src[a], src[b_]))
        agg[key][0] += 1
        agg[key][1] += jm
    exp = {
        k: (n, float(_round_half_up(sjm / (n * 1000000), 6)))
        for k, (n, sjm) in agg.items()
    }
    assert exp, "fixture must produce at least one mirrored source pair"
    got = {
        (r["source_a"], r["source_b"]): (r["n_pairs"], r["mean_jaccard"])
        for r in _run(spark, sf_dir, "dedup_source_mirror_matrix")
    }
    assert got == exp
