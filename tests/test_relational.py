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


def test_sketch_profile_bounds_vs_exact(spark, sf_oracle):
    """q22's sketches must track the exact answers: HLL within its 2%
    design rsd (×3 safety) and quantile-sketch within the value spread."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.plans.relational import q22_sketch_profile
    from rds_pgbadger_etl_spark.sources.tables import load_table

    approx = {r.event_type: r for r in q22_sketch_profile(spark, sf_oracle).collect()}
    exact = {
        r.event_type: r
        for r in load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", 0.5).alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(3, 0.06 * e.users)
        assert a.p50_approx <= a.p95_approx <= a.p99_approx
        assert abs(a.p50_approx - e.p50) <= 0.05 * max(1.0, abs(e.p50))


def test_sketch_error_report_within_bounds(spark, sf_oracle):
    from rds_pgbadger_etl_spark.plans.relational import sketch_error_report

    rows = sketch_error_report(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        # HLL++ at rsd=0.02: allow 3 sigma; quantile sketch at 10k
        # accuracy is near-exact on this corpus
        assert r.distinct_rel_err <= 0.06, r
        assert r.p95_abs_err <= 0.05, r
        assert r.exact_users > 0
