"""Differential tests: synthesized-log queries vs DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from rds_pgbadger_etl_spark.plans.log_oracle import QUERIES
from tests.oracle import compare

CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_log_oracle_match(spark, sf_oracle, name, fn, sql):
    compare(fn(spark, sf_oracle), sql, sf_oracle)
