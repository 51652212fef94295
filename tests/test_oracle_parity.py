"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.oracle_util import compare, duckdb_conn
from yanwenxian_week3_data_pipeline_spark.plans import all_queries

SPECS = all_queries()
ORACLE_SPECS = sorted(name for name, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(name for name, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_dir)
    compare(df, con, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
