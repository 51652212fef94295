"""Vector math over ``array<float>`` embedding columns — pure Spark
higher-order functions (JVM-side), no UDFs.

Floating-point determinism contract (needed for DuckDB-oracle parity): every
element is cast float→double (exact) BEFORE multiplication, and sums are
LEFT-TO-RIGHT sequential folds in both engines (Spark ``aggregate`` /
DuckDB ``list_reduce``), so dot products and norms are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_expr(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    prods = f"list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    return f"list_reduce(list_prepend(0.0, {prods}), (acc, x) -> acc + x)"


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
