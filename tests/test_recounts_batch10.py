"""Recount batch 10 — sequential third opinion for dedup_minhash_recall.

The query's Spark build and DuckDB oracle share the shingle recipe and the
inverted-index ground-truth construction end-to-end, so their agreement is
not intent. This replay computes ground truth the OTHER way — brute-force
all-pairs set intersection over plain Python sets — and the LSH side via
the batch-7 sequential minhash/banding replay, sharing only the frozen
constants with the engine.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict
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

_WS = re.compile("[ \t\n\r\f\x0b\xa0]+")


def _clean(t: str | None) -> str:
    if t is None:
        return ""
    for ent, ch in HTML_ENTITIES:
        t = t.replace(ent, ch)
    return _WS.sub(" ", t).strip(" ")


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
        h1 = int(d[0:15], 16)
        h2 = int(d[15:29], 16)
        for i in range(MINHASH_NUM_HASHES):
            g = h1 if i == 0 else (h1 + (i * h2) % p) % p
            if sig[i] is None or g < sig[i]:
                sig[i] = g
    return sig


def _round_half_up(x: float, places: int) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


def test_minhash_recall_full_replay(spark, sf_dir, documents):
    sh = {d["doc_id"]: _shingles(d["text"]) for d in documents}
    nonempty = {i: s for i, s in sh.items() if s}

    # ground truth: brute-force all-pairs exact Jaccard, integer threshold
    # form (1+t)*inter >= t*(|A|+|B|) — NOT the inverted index the engine
    # uses, so the construction is independent
    t = MINHASH_JACCARD_THRESHOLD
    ids = sorted(nonempty)
    gt = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(nonempty[a] & nonempty[b])
            if inter and (1.0 + t) * inter >= t * (len(nonempty[a]) + len(nonempty[b])):
                gt.add((a, b))

    # LSH side: the batch-7 sequential replay (sig -> bands -> buckets ->
    # candidates -> rounded exact-Jaccard verify)
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for doc_id in ids:
        sig = _signature(nonempty[doc_id])
        for b in range(MINHASH_BANDS):
            sl = sig[b * MINHASH_ROWS_PER_BAND : (b + 1) * MINHASH_ROWS_PER_BAND]
            key = hashlib.md5(",".join(str(v) for v in sl).encode()).hexdigest()
            buckets[(b, key)].append(doc_id)
    cand = set()
    for members in buckets.values():
        if len(members) > DEDUP_MAX_BUCKET:
            continue
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    thr = Decimal(repr(t))
    lsh = set()
    for a, b in cand:
        inter = len(nonempty[a] & nonempty[b])
        union = len(nonempty[a]) + len(nonempty[b]) - inter
        if union and _round_half_up(inter / union, 6) >= thr:
            lsh.add((a, b))

    n_true, n_lsh = len(gt), len(lsh)
    n_found = len(gt & lsh)
    assert gt, "fixture must contain true near-dup pairs"

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    [row] = all_queries()["dedup_minhash_recall"].build(spark, sf_dir).collect()
    assert (row["n_true"], row["n_lsh"], row["n_found"], row["n_missed"]) == (
        n_true,
        n_lsh,
        n_found,
        n_true - n_found,
    )
    assert row["recall"] == float(_round_half_up(n_found / n_true, 6))
