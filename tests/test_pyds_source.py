"""Python DataSource connector (sources/articles_pyds.py): the custom
``articles_envelope`` format must agree with the multiLine reader on a
single envelope file, handle all four envelope shapes, parallelize a
directory one-partition-per-file with disjoint ordered record_ids, and
swallow corrupt documents."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REF_SAMPLE = Path("/root/reference/week3assigment/week3-assignment/sample_data.json")


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory) -> Path:
    d = tmp_path_factory.mktemp("envelope_feed")
    (d / "a_array.json").write_text(
        json.dumps(
            [
                {"title": "A1", "content": "c1", "url": "https://x/1", "published": "2025-01-01"},
                {"title": "A2", "content": "c2", "url": "https://x/2", "published": None},
            ]
        ),
        encoding="utf-8",
    )
    (d / "b_wrapper.json").write_text(
        json.dumps({"articles": [{"title": "B1", "content": "c3", "url": "https://x/3"}]}),
        encoding="utf-8",
    )
    (d / "c_bare.json").write_text(
        json.dumps({"title": "C1", "content": "c4", "url": "https://x/4"}), encoding="utf-8"
    )
    (d / "d_null.json").write_text("null", encoding="utf-8")
    (d / "e_corrupt.json").write_text("{not json", encoding="utf-8")
    (d / "zz_ignored.txt").write_text("not a feed file", encoding="utf-8")
    return d


@pytest.mark.skipif(not REF_SAMPLE.exists(), reason="reference fixture not present")
def test_pyds_matches_multiline_reader_on_reference_fixture(spark):
    from yanwenxian_week3_data_pipeline_spark.schema import ARTICLE_COLUMNS, RECORD_ID, conform
    from yanwenxian_week3_data_pipeline_spark.sources.articles_json import load_articles
    from yanwenxian_week3_data_pipeline_spark.sources.articles_pyds import load_articles_pyds

    cols = [RECORD_ID, *ARTICLE_COLUMNS]
    via_json = load_articles(spark, str(REF_SAMPLE)).select(*cols).collect()
    via_pyds = conform(load_articles_pyds(spark, str(REF_SAMPLE))).select(*cols).collect()
    assert sorted(via_pyds) == sorted(via_json)
    # single file → file_seq 0 → record_id reduces to 0..n-1 ingest order
    assert sorted(r[RECORD_ID] for r in via_pyds) == list(range(len(via_pyds)))


def test_pyds_directory_partitions_and_envelopes(spark, feed_dir):
    from yanwenxian_week3_data_pipeline_spark.sources.articles_pyds import load_articles_pyds

    df = load_articles_pyds(spark, str(feed_dir))
    rows = {r.title: r for r in df.collect()}
    # 2 (array) + 1 (wrapper) + 1 (bare) + 0 (null) + 0 (corrupt)
    assert set(rows) == {"A1", "A2", "B1", "C1"}
    # one scan partition per listed .json file (parallel file decode)
    assert df.rdd.getNumPartitions() == 5
    # record_id = (file_seq << 32) | pos over the SORTED file list
    assert rows["A1"].record_id == 0 and rows["A2"].record_id == 1
    assert rows["B1"].record_id == (1 << 32)
    assert rows["C1"].record_id == (2 << 32)
    # published→published_date alias applies at file grain
    assert rows["A1"].published_date == "2025-01-01"
    assert rows["A2"].published_date is None


def test_pyds_downstream_pipeline_compatible(spark, feed_dir):
    """The connector's frame feeds the standard cleaning stages (conform →
    clean → flag) like any other article source."""
    from yanwenxian_week3_data_pipeline_spark.pipeline import clean_articles, flag_stages
    from yanwenxian_week3_data_pipeline_spark.schema import conform
    from yanwenxian_week3_data_pipeline_spark.sources.articles_pyds import load_articles_pyds

    flagged = flag_stages(clean_articles(conform(load_articles_pyds(spark, str(feed_dir)))))
    got = {r.title: r for r in flagged.collect()}
    assert len(got) == 4 and all("_kept" in r.asDict() for r in got.values())
