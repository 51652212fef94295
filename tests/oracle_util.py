"""Strict Spark-vs-DuckDB comparison mirroring the driver's correctness
check: row count, column-name set, and an order-insensitive value comparison
with columns sorted by name.

Stricter than the driver on purpose: exact value equality (after canonical
stringification) so that any float/decimal/timestamp divergence surfaces
here first.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v: Any) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # numeric-insensitive: registered queries canonicalize decimal
        # outputs to double (plans/__init__.py), so a DuckDB DECIMAL must
        # compare equal to the Spark double it converts to — the same
        # criterion the driver's pandas normalization applies
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(f"[{name}] value mismatch; first diffs (spark, duckdb): {diffs}")
