"""Differential tests: behavioral-analytics queries vs DuckDB at sf0.01."""

from __future__ import annotations

import pytest

from rds_pgbadger_etl_spark.plans.behavior import QUERIES
from tests.oracle import compare

CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_behavior_oracle_match(spark, sf_oracle, name, fn, sql):
    compare(fn(spark, sf_oracle), sql, sf_oracle)


def test_rolling_active_never_below_daily(spark, sf_oracle):
    # the 7-day rolling distinct count must dominate the daily distinct
    # count for every day (a window superset can't have fewer users)
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.plans.behavior import rolling_active_users
    from rds_pgbadger_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_oracle, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("daily"))
    )
    joined = rolling_active_users(spark, sf_oracle).join(daily, "day").collect()
    assert joined
    assert all(r.active_7d >= r.daily for r in joined)
