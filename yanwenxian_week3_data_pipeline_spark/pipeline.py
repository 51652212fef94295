"""pipe_run — the end-to-end article cleaning pipeline (reference
run_cleaning_pipeline, cleaner.py:284-393):

load → text clean → date standardize → drop incomplete → dedup (keep-first)
→ validate → save valid JSON + quality report.

Spark shape: one lazy transform chain; each stage whose count feeds the
report is cached at its boundary and counted once. The validation filter is
a computed-column filter (no anti-join). Returns the cleaned
(pre-validation-filter) DataFrame exactly as the reference does
(cleaner.py:393).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from .domains.articles import article_rules
from .functions.dates import parse_iso_date_expr
from .functions.text import clean_text_expr
from .operators.dedup import dedup_keep_first
from .operators.incomplete import drop_incomplete
from .operators.validate import with_validation
from .report import ValidationStats, render_quality_report
from .schema import RECORD_ID, TEXT_COLUMNS
from .sinks.json_records import save_records_pretty, save_text
from .sources.articles_json import load_articles


def clean_articles(df: DataFrame) -> DataFrame:
    """Stages 2a+2b: text cleaning on the text columns; permissive date
    standardization of published_date to an ISO string."""
    out = df.withColumns({c: clean_text_expr(F.col(c)) for c in TEXT_COLUMNS if c in df.columns})
    if "published_date" in out.columns:
        out = out.withColumn("published_date", parse_iso_date_expr(F.col("published_date")))
    return out


def run_cleaning_pipeline(
    spark: SparkSession,
    input_path: str | Path,
    output_path: str | Path = "cleaned_output.json",
    report_path: str | Path = "quality_report.txt",
    verbose: bool = True,
) -> DataFrame:
    def say(msg: str) -> None:
        if verbose:
            print(msg)

    # 1. load
    raw = load_articles(spark, str(input_path))
    n_load = raw.count()
    say(f"[1/6] loaded {n_load} records from {input_path}")

    # 2a+2b. clean text + standardize dates
    cleaned = clean_articles(raw)

    # 2c. drop incomplete
    complete = drop_incomplete(cleaned).cache()
    n_complete = complete.count()
    n_dropped = n_load - n_complete
    say(f"[2/6] cleaned; dropped {n_dropped} incomplete, {n_complete} remaining")

    # 2d. dedup keep-first on normalized (title, url)
    deduped = dedup_keep_first(complete, key_cols=("title", "url"), order_col=RECORD_ID).cache()
    n_dedup = deduped.count()
    n_dupes = n_complete - n_dedup
    say(f"[3/6] dedup removed {n_dupes} duplicates, {n_dedup} remaining")

    # 3. validate — one projection adds (passed, reason, message)
    validated = with_validation(deduped, article_rules()).cache()

    agg = validated.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("passed"),
    ).collect()[0]
    total, passed = int(agg["total"]), int(agg["passed"] or 0)
    dist = [
        (r["reason"], int(r["n"]))
        for r in validated.where(~F.col("passed"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("reason"))
        .collect()
    ]
    details = [
        {"index": int(r[RECORD_ID]), "reason": r["reason"], "message": r["message"]}
        for r in validated.where(~F.col("passed"))
        .select(RECORD_ID, "reason", "message")
        .orderBy(RECORD_ID)
        .collect()
    ]
    stats = ValidationStats(
        total=total,
        passed=passed,
        failed=total - passed,
        failure_reasons=dist,
        failed_record_details=details,
    )
    say(f"[4/6] validation: {passed}/{total} passed")

    # completeness over the cleaned (deduped) set
    from .operators.aggregates import completeness, date_range

    report_cols = [c for c in deduped.columns if c != RECORD_ID]
    comp_rows = [
        (r["column"], int(r["non_empty"]), int(r["total"]))
        for r in completeness(deduped, report_cols).collect()
    ]

    dr_row = date_range(
        deduped.withColumn("_ts", F.to_timestamp(F.col("published_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'")),
        "_ts",
    ).collect()[0]
    dr = (
        (dr_row["earliest"], dr_row["latest"], int(dr_row["n_dated"]))
        if dr_row["n_dated"]
        else None
    )

    # 4+6. save valid records
    valid = validated.where(F.col("passed")).drop("passed", "reason", "message")
    n_saved = save_records_pretty(valid.orderBy(RECORD_ID), output_path, columns=report_cols)
    say(f"[5/6] saved {n_saved} valid records to {output_path}")

    # 5. render + save report
    report = render_quality_report(
        original_count=n_load,
        cleaned_count=n_dedup,
        deleted_incomplete=n_dropped,
        deleted_duplicates=n_dupes,
        completeness_rows=comp_rows,
        stats=stats,
        date_range=dr,
        n_cleaned_rows=n_dedup,
    )
    save_text(report, report_path)
    say(f"[6/6] wrote quality report to {report_path}")
    say(f"summary: {n_load} loaded -> {n_dedup} after cleaning -> {n_saved} valid (saved)")

    return validated.drop("passed", "reason", "message")
