"""Spark-vs-DuckDB parity for every catalog query — the local version of
the driver's CORRECTNESS gate, run at sf0.01."""

from __future__ import annotations

import pytest

from flink_etl_spark.queries import CATALOG
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query

ORACLED = [(n, fn, sql) for n, (fn, sql) in CATALOG.items() if sql is not None]
ROWS_ONLY = [(n, fn) for n, (fn, sql) in CATALOG.items() if sql is None]


@pytest.mark.parametrize("name,fn,sql", ORACLED, ids=[n for n, _, _ in ORACLED])
def test_oracle_parity(spark, name, fn, sql):
    n = compare_query(spark, name, fn, sql, SF_ORACLE)
    assert n >= 0


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only(spark, name, fn):
    df = fn(spark, SF_ORACLE)
    assert df.count() >= 0
