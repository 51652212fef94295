"""End-to-end golden test of the article cleaning pipeline on an original
dirty fixture engineered to exercise every failure mode the reference's
fixture covers (SURVEY.md §5.1): whitespace + HTML entities, null/blank
required fields, duplicates (non-adjacent), short content, bad URL schemes,
uppercase-scheme quirk, mixed/invalid date formats, over-long titles,
missing published dates.

Expected outcomes are derived by hand from the operator semantics:
funnel 17 -> 13 (‑4 incomplete) -> 11 (‑2 duplicates) -> 4 valid.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

LONG_CONTENT = ("spark engine keeps every analytics operator declarative " * 4).strip()  # > 120 chars
SHORT_CONTENT = "too short to pass"


def _fixture_records() -> list[dict]:
    base_url = "https://example.org/articles/engine"
    return [
        # 0: valid; needs whitespace collapapse + entity decode, "Jan 15, 2025"
        {
            "title": "  Spark   &amp; Data \t Engines ",
            "content": LONG_CONTENT,
            "url": base_url + "/0",
            "published": "Jan 15, 2025",
            "category": "Technology",
            "author": " A.  Writer ",
        },
        # 1: null title -> incomplete
        {"title": None, "content": LONG_CONTENT, "url": base_url + "/1", "published": "2025-02-01"},
        # 2: whitespace-only title -> incomplete
        {"title": "   ", "content": LONG_CONTENT, "url": base_url + "/2", "published": "2025-02-02"},
        # 3: empty content -> incomplete
        {"title": "Empty body", "content": "", "url": base_url + "/3", "published": "2025-02-03"},
        # 4: null url -> incomplete
        {"title": "No link", "content": LONG_CONTENT, "url": None, "published": "2025-02-04"},
        # 5: duplicate of 0 (same normalized title+url, extra spacing) -> deduped
        {
            "title": "Spark & Data Engines",
            "content": LONG_CONTENT + " duplicate body",
            "url": base_url + "/0",
            "published": "Feb 20, 2025",
        },
        # 6: short content -> short_content
        {"title": "Stub", "content": SHORT_CONTENT, "url": base_url + "/6", "published": "2025-03-01"},
        # 7: ftp scheme -> invalid_url
        {"title": "Bad scheme", "content": LONG_CONTENT, "url": "ftp://example.org/7", "published": "2025-03-02"},
        # 8: schemeless -> invalid_url
        {"title": "No scheme", "content": LONG_CONTENT, "url": "example.org/8", "published": "2025-03-03"},
        # 9: impossible date -> parses to null -> missing_published (golden
        # semantics: the check reads the PARSED date only; the raw string
        # never rescues — see domains/articles.py module doc)
        {"title": "Odd date", "content": LONG_CONTENT, "url": base_url + "/9", "published": "2025-13-99"},
        # 10: uppercase scheme -> invalid_url (case-sensitive startswith quirk)
        {"title": "Loud scheme", "content": LONG_CONTENT, "url": "HTTP://example.org/10", "published": "2025-03-05"},
        # 11: ordinal date "July 1st, 2025" -> valid
        {"title": "Ordinal date", "content": LONG_CONTENT, "url": base_url + "/11", "published": "July 1st, 2025"},
        # 12: second duplicate of 0, non-adjacent -> deduped
        {
            "title": "Spark  &amp;  Data Engines",
            "content": LONG_CONTENT,
            "url": base_url + "/0",
            "published": "2025-04-01",
        },
        # 13: entities in content -> valid
        {
            "title": "Entity body",
            "content": "A&nbsp;B &lt;tag&gt; " + LONG_CONTENT,
            "url": base_url + "/13",
            "published": "15/03/2025",
        },
        # 14: over-long title -> title_too_long
        {"title": "T" * 501, "content": LONG_CONTENT, "url": base_url + "/14", "published": "2025-05-01"},
        # 15: ISO date with Z -> valid
        {"title": "Zulu time", "content": LONG_CONTENT, "url": base_url + "/15", "published": "2025-06-07T14:30:00Z"},
        # 16: no published at all -> missing_published
        {"title": "Dateless", "content": LONG_CONTENT, "url": base_url + "/16", "published": None},
    ]


EXPECTED_VALID_IDS = {0, 11, 13, 15}
EXPECTED_REASONS = {
    6: "short_content",
    7: "invalid_url",
    8: "invalid_url",
    9: "missing_published",
    10: "invalid_url",
    14: "title_too_long",
    16: "missing_published",
}


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("articles") / "dirty_articles.json"
    p.write_text(json.dumps(_fixture_records(), indent=2), encoding="utf-8")
    return str(p)


def test_pipeline_golden(spark, fixture_path, tmp_path_factory):
    from yanwenxian_week3_data_pipeline_spark.domains.articles import article_rules
    from yanwenxian_week3_data_pipeline_spark.operators.dedup import dedup_keep_first
    from yanwenxian_week3_data_pipeline_spark.operators.incomplete import drop_incomplete
    from yanwenxian_week3_data_pipeline_spark.operators.validate import with_validation
    from yanwenxian_week3_data_pipeline_spark.pipeline import clean_articles
    from yanwenxian_week3_data_pipeline_spark.sources.articles_json import load_articles

    raw = load_articles(spark, fixture_path)
    assert raw.count() == 17

    cleaned = clean_articles(raw)
    complete = drop_incomplete(cleaned)
    assert complete.count() == 13  # -4 incomplete

    deduped = dedup_keep_first(complete, key_cols=("title", "url"), order_col="record_id")
    assert deduped.count() == 11  # -2 duplicates
    kept_ids = {r.record_id for r in deduped.select("record_id").collect()}
    assert 0 in kept_ids and 5 not in kept_ids and 12 not in kept_ids

    validated = with_validation(deduped, article_rules())
    rows = {r.record_id: r for r in validated.collect()}

    valid_ids = {rid for rid, r in rows.items() if r.passed}
    assert valid_ids == EXPECTED_VALID_IDS
    for rid, reason in EXPECTED_REASONS.items():
        assert rows[rid].reason == reason, f"record {rid}: {rows[rid].reason} != {reason}"

    # cleaning semantics
    assert rows[0].title == "Spark & Data Engines"
    assert rows[0].author == "A. Writer"
    assert rows[0].published_date == "2025-01-15T00:00:00Z"
    assert rows[11].published_date == "2025-07-01T00:00:00Z"
    assert rows[13].published_date == "2025-03-15T00:00:00Z"  # day-first 15/03/2025
    assert rows[15].published_date == "2025-06-07T14:30:00Z"
    assert rows[9].published_date is None  # 2025-13-99 unparseable
    assert rows[13].content.startswith("A B <tag>")

    # uppercase-scheme quirk message comes from the scheme check
    assert "URL must start with http:// or https://" in rows[10].message


def test_full_pipeline_files(spark, fixture_path, tmp_path_factory):
    from yanwenxian_week3_data_pipeline_spark.pipeline import run_cleaning_pipeline

    out_dir = tmp_path_factory.mktemp("out")
    out_json = out_dir / "cleaned_output.json"
    out_report = out_dir / "quality_report.txt"

    run_cleaning_pipeline(spark, fixture_path, out_json, out_report, verbose=False)

    records = json.loads(out_json.read_text())
    assert len(records) == len(EXPECTED_VALID_IDS)
    titles = {r["title"] for r in records}
    assert "Spark & Data Engines" in titles

    report = out_report.read_text()
    assert "Total records processed:   17" in report
    assert "Cleaned record count:      11" in report
    assert "  Total validation passed:   4" in report
    assert "  Total validation failed:   7" in report
    assert "     3  URL must start with http:// or https:// and have valid format." in report
    assert "End of report" in report


def test_envelope_shapes(spark, tmp_path_factory):
    from yanwenxian_week3_data_pipeline_spark.sources.articles_json import load_articles

    d = tmp_path_factory.mktemp("envelopes")

    wrapped = d / "wrapped.json"
    wrapped.write_text(json.dumps({"articles": _fixture_records()[:3]}))
    assert load_articles(spark, str(wrapped)).count() == 3

    single = d / "single.json"
    single.write_text(json.dumps(_fixture_records()[0]))
    df = load_articles(spark, str(single))
    assert df.count() == 1

    empty = d / "empty.json"
    empty.write_text("[]")
    assert load_articles(spark, str(empty)).count() == 0


def test_cli_main(spark, fixture_path, tmp_path_factory, capsys):
    """python -m yanwenxian_week3_data_pipeline_spark — the Spark twin of the
    reference's `python cleaner.py` entry point (cleaner.py:396-397)."""
    from yanwenxian_week3_data_pipeline_spark.__main__ import main

    out_dir = tmp_path_factory.mktemp("cli")
    out_json = out_dir / "cleaned_output.json"
    out_report = out_dir / "quality_report.txt"

    rc = main(
        [str(fixture_path), "-o", str(out_json), "-r", str(out_report), "-q"],
        spark=spark,
    )
    assert rc == 0
    assert len(json.loads(out_json.read_text())) == len(EXPECTED_VALID_IDS)
    assert "End of report" in out_report.read_text()

    rc = main([str(fixture_path), "--validate-only"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "Validation Report" in out
    assert "Total records:  17" in out


def test_observe_funnel_matches_aggregate(spark, fixture_path):
    """The observe()-metrics funnel (zero extra jobs — metrics piggyback on
    the consuming action) reports the same numbers as the aggregate pass:
    17 loaded -> 13 complete -> 11 deduped -> 4 valid."""
    from yanwenxian_week3_data_pipeline_spark.pipeline import (
        attach_funnel_observation,
        clean_articles,
        flag_stages,
    )
    from yanwenxian_week3_data_pipeline_spark.sources.articles_json import load_articles

    flagged = flag_stages(clean_articles(load_articles(spark, fixture_path)))
    observed, obs = attach_funnel_observation(flagged, "funnel_test")
    n_sink_rows = observed.where(F.col("_kept") & F.col("passed")).count()
    got = obs.get
    assert got == {"n_load": 17, "n_complete": 13, "n_dedup": 11, "n_valid": 4}
    assert n_sink_rows == got["n_valid"]
