"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are registered per module in ``rds_pgbadger_etl_spark.plans.*``
as ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]`` and merged
here. ``oracle_sql`` is None for non-SQL-expressible ops (driver then
records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from rds_pgbadger_etl_spark.plans import (
        behavior,
        catalog_oracle,
        curation,
        layout_oracle,
        llm_ops,
        log_oracle,
        relational,
        streaming_oracle,
    )

    merged: dict[str, tuple[Callable, str | None]] = {}
    for mod in (
        relational,
        log_oracle,
        llm_ops,
        curation,
        catalog_oracle,
        streaming_oracle,
        behavior,
        layout_oracle,
    ):
        for name, entry_pair in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name}")
            merged[name] = entry_pair
    return merged


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from rds_pgbadger_etl_spark.plans.relational import q01_pricing_summary

    return q01_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
