"""Article record schema + conformance.

The reference infers schema from whatever JSON keys exist and guards column
access everywhere (cleaner.py:96-97,113-114,317). The rebuild inverts that:
one declared ``ARTICLE_SCHEMA`` and a ``conform`` step that adds any missing
column as a null literal and applies the ``published`` → ``published_date``
alias (cleaner.py:311-312), so every downstream operator can assume the full
schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

ARTICLE_COLUMNS = (
    "title",
    "content",
    "url",
    "published",
    "published_date",
    "category",
    "author",
    "source",
)

ARTICLE_SCHEMA = StructType(
    [StructField(c, StringType(), nullable=True) for c in ARTICLE_COLUMNS]
)

# Ingest-order id replacing the pandas row index (cleaner.py:361-363,
# validator.py:161). See sources/articles_json.py for how it is assigned.
RECORD_ID = "record_id"

TEXT_COLUMNS = ("title", "content", "author", "source", "url")  # cleaner.py:317


def conform(df: DataFrame) -> DataFrame:
    """Project ``df`` onto ARTICLE_SCHEMA (+ passthrough of RECORD_ID when
    present): add absent columns as nulls, stringify present ones, and apply
    the published→published_date alias."""
    cols = []
    present = set(df.columns)
    if RECORD_ID in present:
        cols.append(F.col(RECORD_ID))
    for c in ARTICLE_COLUMNS:
        if c == "published_date" and c not in present and "published" in present:
            cols.append(F.col("published").cast("string").alias(c))
        elif c in present:
            cols.append(F.col(c).cast("string").alias(c))
        else:
            cols.append(F.lit(None).cast("string").alias(c))
    return df.select(*cols)
