"""Semantic tests for the round-2 curation extensions — properties the
DuckDB oracle twins cannot express on their own (guarantees on constructed
inputs rather than cross-engine value equality)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from yanwenxian_week3_data_pipeline_spark.constants import (
    WINNOW_GRAM_K,
    WINNOW_WINDOW,
)
from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import (
    _q_bloom_decontaminate,
    _q_label_centroids,
    _q_length_histogram,
    _winnow_fps_expr,
)


def _fps(spark, texts: list[str]) -> list[set[int]]:
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = (
        df.select("doc_id", _winnow_fps_expr(F.col("text")).alias("fps"))
        .orderBy("doc_id")
        .collect()
    )
    return [set(r["fps"]) for r in rows]


def test_winnowing_guarantee_shared_run(spark):
    """Any shared token run of >= k + w - 1 tokens must surface at least one
    shared fingerprint (the winnowing guarantee, Schleimer et al. 2003 §3):
    the run contains >= w consecutive gram hashes, hence one full window,
    and both docs select that window's minimum."""
    run = " ".join(f"tok{i}" for i in range(WINNOW_GRAM_K + WINNOW_WINDOW - 1))
    a = "alpha beta gamma delta " + run + " omega end words here"
    b = "completely different prefix words " + run + " other suffix tokens"
    fa, fb = _fps(spark, [a, b])
    assert fa & fb, "shared run of k+w-1 tokens must share a fingerprint"


def test_winnowing_disjoint_texts_no_overlap(spark):
    fa, fb = _fps(
        spark,
        [
            " ".join(f"left{i}" for i in range(20)),
            " ".join(f"right{i}" for i in range(20)),
        ],
    )
    assert not (fa & fb)


def test_winnowing_short_doc_empty(spark):
    (fa,) = _fps(spark, ["too few tokens"])
    assert fa == set()


def test_winnowing_fp_count_compressed(spark):
    """Winnowing keeps ~1/w of the gram hashes — far fewer fingerprints
    than grams on a long non-repetitive doc."""
    n = 200
    (fa,) = _fps(spark, [" ".join(f"w{i}" for i in range(n))])
    n_grams = n - WINNOW_GRAM_K + 1
    assert 0 < len(fa) < n_grams / 2


def test_winnowing_arrow_kernel_matches_expression(spark, sf_dir):
    """The r11 Arrow/numpy fingerprint kernel (the default path) must be
    bit-identical to the expression reference the DuckDB oracle replays —
    the _minhash_sig_table cross-impl discipline. Exercised on the real
    sf documents (covers empty/short docs, entity unescaping, whitespace
    runs) plus edge docs planted around the k/w boundaries."""
    from pyspark.sql import Row

    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import (
        _winnow_fps_table,
    )

    real = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            Row(doc_id=100001, text=""),  # no tokens
            Row(doc_id=100002, text="a b c"),  # < k tokens
            Row(doc_id=100003, text="a b c d"),  # exactly k -> 1 gram < w
            Row(doc_id=100004, text=" ".join(f"t{i}" for i in range(8))),  # = w grams
            Row(doc_id=100005, text="x y " * 30),  # repetitive: distinct mins
        ]
    )
    d = real.unionByName(edge)
    expr_rows = {
        (r["doc_id"], fp)
        for r in d.select("doc_id", _winnow_fps_expr(F.col("text")).alias("fps")).collect()
        for fp in r["fps"]
    }
    kernel_rows = {(r["doc_id"], r["fp"]) for r in _winnow_fps_table(d).collect()}
    assert kernel_rows == expr_rows


def test_label_centroids_known_vectors(spark, sf_dir):
    out = {r["label"]: r for r in _q_label_centroids(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # cross-check one label against a driver-side exact computation
    label = min(out)
    vecs = [r["embedding"] for r in emb.where(F.col("label") == label).collect()]
    assert out[label]["n_vecs"] == len(vecs)
    dim = len(vecs[0])
    assert len(out[label]["centroid"]) == dim
    for pos in (0, dim // 2, dim - 1):
        exact = sum(float(v[pos]) for v in vecs) / len(vecs)
        assert abs(out[label]["centroid"][pos] - exact) < 1e-6


def test_length_histogram_totals(spark, sf_dir):
    h = _q_length_histogram(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert h.agg(F.sum("n_docs")).first()[0] == docs.count()
    shares = (
        h.groupBy("lang").agg(F.round(F.sum("lang_share"), 4).alias("s")).collect()
    )
    for r in shares:
        assert abs(r["s"] - 1.0) < 1e-3


def test_bloom_superset_invariant(spark, sf_dir):
    """The defining Bloom property: no exact benchmark hit may be missed by
    the bloom probe — superset_ok must hold for every train doc, and bloom
    hits must dominate exact hits."""
    out = _q_bloom_decontaminate(spark, sf_dir)
    assert out.where(~F.col("bloom_superset_ok")).count() == 0
    assert out.where(F.col("n_bloom_hits") < F.col("n_exact_hits")).count() == 0


# ---------------------------------------------------------------------------
# docs_weighted_sample — Efraimidis–Spirakis A-ES
# ---------------------------------------------------------------------------


def _es_sample_python(sf_dir: str, k: int) -> list[tuple[int, float]]:
    """Engine-independent replication of the whole docs_weighted_sample
    pipeline (clean → quality score → seeded uniform → E-S key → top-k) in
    pure Python: hashlib md5, Decimal arithmetic for the score, math.log.
    Independent of Spark AND DuckDB — a third implementation of the spec."""
    import math
    import re
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    from yanwenxian_week3_data_pipeline_spark.constants import (
        HTML_ENTITIES,
        QUALITY_STOPWORDS,
        WHITESPACE_CLASS,
        WSAMPLE_SEED,
    )
    import hashlib

    ws = re.compile(WHITESPACE_CLASS + "+")
    stop = set(QUALITY_STOPWORDS)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        c = text or ""
        for ent, ch in HTML_ENTITIES:
            c = c.replace(ent, ch)
        c = ws.sub(" ", c).strip()
        toks = c.split(" ") if c else []
        n_chars, n_tokens = len(c), len(toks)
        nz, nzt = max(n_chars, 1), max(n_tokens, 1)
        # ratios: round-half-up to 4, as Spark's round() does on doubles
        alpha = len(re.sub("[^A-Za-z]", "", c))
        r4 = lambda x: Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        alpha_ratio = r4(alpha / nz)
        stop_ratio = r4(sum(1 for x in toks if x in stop) / nzt)
        len_term = min(
            (Decimal(n_chars) / Decimal(500)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            ),
            Decimal("1.0"),
        )
        q = (
            len_term * Decimal("0.3")
            + alpha_ratio * Decimal("0.4")
            + stop_ratio * Decimal("0.3")
        ).quantize(Decimal("0.00001"), ROUND_HALF_UP)
        if q <= 0:
            continue
        h = int(
            hashlib.md5(f"{WSAMPLE_SEED}:{doc_id}".encode()).hexdigest()[:13], 16
        )
        u = (h + 1) / 2.0**52
        key = float(
            Decimal(repr(math.log(u) / float(q))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        out.append((doc_id, float(q), key))
    out.sort(key=lambda r: (-r[2], r[0]))
    return [(d, k_) for d, _, k_ in out[:k]]


def test_weighted_sample_matches_python_reference(spark, sf_dir):
    """The full E-S sample on the sf0.001 fixture equals a pure-Python third
    implementation — engine-independent selection, keys, and ordering."""
    from yanwenxian_week3_data_pipeline_spark.constants import WSAMPLE_K
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import (
        _q_weighted_sample,
    )

    got = [
        (r["doc_id"], r["es_key"])
        for r in _q_weighted_sample(spark, sf_dir).collect()
    ]
    assert got == _es_sample_python(sf_dir, WSAMPLE_K)


def test_weighted_sample_weight_monotone(spark, sf_dir):
    """With the uniform held fixed, the E-S key ln(u)/w is increasing in w:
    duplicating one doc's u across two weights must rank the heavier one
    first. Sanity-pins the direction of the weighting (a 1/w-vs-w slip flips
    the whole sampler toward LOW quality)."""
    import math

    u = 0.25
    assert math.log(u) / 0.9 > math.log(u) / 0.2
