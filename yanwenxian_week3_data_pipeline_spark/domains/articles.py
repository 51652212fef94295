"""Article validation rules — exact reference semantics.

Parity map (validator.py:48-96):
- field chains are if/elif: a field yields at most ONE failure;
- ``reason`` = code of the FIRST failing rule in declaration order
  (validator.py:95);
- ``message`` joins all failure messages with a single space
  (validator.py:94);
- messages embed computed values (char counts, truncated url echo);
- the url scheme check is case-SENSITIVE ``startswith`` while the format
  regex is case-insensitive (validator.py:79 vs validator.py:17) — an
  uppercase ``HTTP://`` url fails the scheme check; replicated exactly;
- published: the check applies to the PARSED ``published_date`` only — a
  set-but-unparseable date counts as missing. The reference source reads
  ``published_date or published`` (validator.py:87), but its committed
  golden (quality_report.txt:64, the invalid-url record whose raw
  ``published`` is the non-empty string ``2025-13-99``) carries
  "Published date is missing or empty.", which only the parsed-date
  semantics produce — the parse-failure NaN is truthy, so the raw fallback
  never rescues a row in the reference pipeline either. Goldens are the
  spec (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..constants import MAX_CONTENT_LENGTH, MAX_TITLE_LENGTH, MIN_CONTENT_LENGTH
from ..operators.validate import Rule, failure_rule


def _safe(col: Column) -> Column:
    # _safe_str (validator.py:38-45): null -> "", else str(value).strip()
    return F.coalesce(F.trim(col), F.lit(""))


def article_rules(
    title: Column | None = None,
    content: Column | None = None,
    url: Column | None = None,
    published_date: Column | None = None,
) -> list[Rule]:
    title = _safe(title if title is not None else F.col("title"))
    content = _safe(content if content is not None else F.col("content"))
    url = _safe(url if url is not None else F.col("url"))
    pd_ = published_date if published_date is not None else F.col("published_date")

    rules: list[Rule] = []

    # --- Title (validator.py:56-60) ---
    t_missing = title == ""
    t_long = ~t_missing & (F.length(title) > MAX_TITLE_LENGTH)
    rules.append(failure_rule("missing_title", t_missing, "Title is missing or empty."))
    rules.append(
        failure_rule(
            "title_too_long",
            t_long,
            F.format_string(
                "Title is too long: %d characters (maximum %d).",
                F.length(title),
                F.lit(MAX_TITLE_LENGTH),
            ),
        )
    )

    # --- Content (validator.py:63-73) ---
    c_missing = content == ""
    c_short = ~c_missing & (F.length(content) < MIN_CONTENT_LENGTH)
    c_long = ~c_missing & ~c_short & (F.length(content) > MAX_CONTENT_LENGTH)
    rules.append(failure_rule("missing_content", c_missing, "Content is missing or empty."))
    rules.append(
        failure_rule(
            "short_content",
            c_short,
            F.format_string(
                "Content is too short: %d characters (minimum %d required).",
                F.length(content),
                F.lit(MIN_CONTENT_LENGTH),
            ),
        )
    )
    rules.append(
        failure_rule(
            "content_too_long",
            c_long,
            F.format_string(
                "Content is too long: %d characters (maximum %d).",
                F.length(content),
                F.lit(MAX_CONTENT_LENGTH),
            ),
        )
    )

    # --- URL (validator.py:76-84) ---
    u_missing = url == ""
    has_scheme = url.startswith("http://") | url.startswith("https://")
    u_scheme = ~u_missing & ~has_scheme
    u_format = ~u_missing & has_scheme & ~url.rlike("(?i)^https?://.+")
    url_echo = F.concat(
        F.substring(url, 1, 50),
        F.when(F.length(url) > 50, F.lit("...")).otherwise(F.lit("")),
    )
    rules.append(failure_rule("missing_url", u_missing, "URL is missing or empty."))
    rules.append(
        failure_rule(
            "invalid_url",
            u_scheme,
            F.concat(F.lit("URL must start with http:// or https:// (got: "), url_echo, F.lit(").")),
        )
    )
    rules.append(
        failure_rule(
            "invalid_url",
            u_format,
            F.lit("URL has invalid format after scheme (expected a host/path)."),
        )
    )

    # --- Published date (validator.py:87-89; golden semantics — see module
    # doc: parsed date only, unparseable counts as missing) ---
    pd_safe = _safe(pd_)
    p_missing = pd_safe == ""
    rules.append(failure_rule("missing_published", p_missing, "Published date is missing or empty."))

    return rules
