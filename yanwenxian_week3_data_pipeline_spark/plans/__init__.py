"""Named query plans. Each ``QuerySpec`` pairs a DataFrame-API builder with
its DuckDB oracle SQL (None for genuinely non-SQL-expressible ops → the
driver records a rows-only check).

``all_queries()`` is the single registry consumed by __spark_entry__.py,
bench.py and the parity tests.

Output canonicalization
-----------------------
The correctness gate compares both engines through pandas: Spark via
``toPandas()`` and DuckDB via ``.df()``. Under that normalization a DECIMAL
column becomes ``float64`` on the DuckDB side but an object column of
``Decimal`` on the Spark side, so numerically identical results hash
differently (``Decimal('137431.00')`` vs ``137431.0``). Internal arithmetic
stays decimal (exact, deterministic under parallel reduction — double sums
are partial-order dependent), and ``canonical_projection`` casts only the
FINAL top-level decimal outputs to double. CAVEAT (found by the sf1
sweep): decimal→double is correctly rounded in Spark, but DuckDB converts
scaled-int→double then divides — two roundings, so equal decimals yield
bit-DIFFERENT doubles once the scaled integer exceeds 2^53. Any final
decimal whose scaled magnitude can cross 2^53 at plausible volumes must
go through ``dec_as_double`` / ``dec_as_double_sql`` (identical two-step
on both engines) instead of relying on the implicit cast.
Oracle SQL carries the dual fix: integer ``sum()`` in DuckDB is HUGEINT
(→float64 in pandas), so oracle sums over integers are wrapped in
``CAST(... AS BIGINT)`` at the final projection.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    doc: str = ""


def canonical_projection(df: DataFrame) -> DataFrame:
    """Cast top-level DECIMAL output columns to double (see module doc).
    No-op when the schema has no decimal columns."""
    if not any(isinstance(f.dataType, T.DecimalType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, T.DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def dec_as_double(col: F.Column, scale: int) -> F.Column:
    """Decimal→double that stays BIT-EQUAL across engines once the scaled
    integer exceeds 2^53. The sf1 sweep caught q1's sum_charge (DECIMAL
    38,6 ≈ 2.8e10 → scaled int 2.8e16 > 2^53) hash-mismatching: Spark's
    decimal→double cast is correctly rounded (single rounding), but
    DuckDB converts scaled-int→double THEN divides (two roundings, both
    in its in-engine CAST and in the pandas .df() path), which can land
    1 ulp away. Fix: make BOTH engines run the identical two-step —
    exact scaled integer as DECIMAL(38,0), one correctly-rounded cast to
    double, then an IEEE double division — via this helper and its
    ``dec_as_double_sql`` twin. Use for any final decimal whose scaled
    magnitude can cross 2^53 at plausible data sizes."""
    return (col * F.lit(10**scale)).cast("decimal(38,0)").cast("double") / F.lit(
        float(10**scale)
    )


def dec_as_double_sql(expr: str, scale: int) -> str:
    """DuckDB twin of ``dec_as_double`` — see its docstring."""
    return (
        f"CAST(CAST(({expr}) * {10 ** scale} AS DECIMAL(38,0)) AS DOUBLE)"
        f" / {float(10 ** scale)}"
    )


def _canonical_build(
    build: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    @functools.wraps(build)  # keep __module__/__doc__ for docs/QUERIES.md
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return canonical_projection(build(spark, sf_dir))

    return wrapped


def all_queries() -> dict[str, QuerySpec]:
    from . import (
        analytic_ext,
        curation_ext,
        graph_ext,
        lakehouse_ext,
        llm_ops,
        lm_ext,
        reference_surface,
        relational,
        tpch_depth,
        tpch_shapes,
    )

    specs: dict[str, QuerySpec] = {}
    for mod in (
        reference_surface,
        relational,
        tpch_shapes,
        tpch_depth,
        analytic_ext,
        llm_ops,
        curation_ext,
        lakehouse_ext,
        graph_ext,
        lm_ext,
    ):
        for spec in mod.QUERIES:
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name}")
            specs[spec.name] = replace(spec, build=_canonical_build(spec.build))
    return specs
