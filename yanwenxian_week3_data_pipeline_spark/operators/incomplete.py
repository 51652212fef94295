"""flt_drop_incomplete — drop rows where any required column is missing
(null, empty, or whitespace-only). Reference: drop_incomplete_records,
cleaner.py:85-103 (required list cleaner.py:93); intended null semantics per
SURVEY.md §1.4 (the pandas ``astype(str)`` null→"None" artifact is NOT
replicated).

Pure filter expression → Catalyst pushes it into the scan where possible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..functions.text import not_missing_expr

REQUIRED_ARTICLE_COLUMNS = ("title", "content", "url")


def drop_incomplete(df: DataFrame, required: tuple[str, ...] = REQUIRED_ARTICLE_COLUMNS) -> DataFrame:
    present = [c for c in required if c in df.columns]  # absent column ⇒ no-op, cleaner.py:96-97
    if not present:
        return df
    cond = reduce(lambda a, b: a & b, [not_missing_expr(F.col(c)) for c in present])
    return df.where(cond)
