"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline ``Carmennnn123/YanWenxian_week3_data_pipeline``
(a single-node pandas article-cleaning ETL), re-expressed Spark-first and
extended with the relational + LLM-data-pipeline operator surface described
in SURVEY.md §2 / §7.

Layering:

- ``constants``   — frozen shared constants (entity table, whitespace class,
                    validation limits) used by BOTH the Spark expressions and
                    the DuckDB oracle-SQL generators, guaranteeing parity.
- ``functions/``  — scalar Column-expression builders (text, dates, hashing,
                    text statistics, vector math). JVM-side only; no UDF in
                    any hot path.
- ``operators/``  — row-set operators (drop-incomplete, dedup family,
                    validation, aggregates, similarity search, sessionize).
- ``sources/`` ``sinks/`` — IO.
- ``plans/``      — named query plans, each paired with its DuckDB oracle SQL.
- ``pipeline.py`` — the end-to-end article cleaning pipeline (reference
                    ``cleaner.py:284-393`` equivalent).
"""

__version__ = "0.1.0"
