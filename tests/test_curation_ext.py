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
