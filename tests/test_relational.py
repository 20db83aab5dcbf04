"""Differential tests: every relational query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from rds_pgbadger_etl_spark.plans.relational import QUERIES
from tests.oracle import compare

ORACLE_CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_match(spark, sf_oracle, name, fn, sql):
    compare(fn(spark, sf_oracle), sql, sf_oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
