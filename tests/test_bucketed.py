"""Bucketed storage: joins and aggs on the bucket key run with no Exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.sources.bucketed import read_bucketed, write_bucketed
from rds_pgbadger_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_smoke, "lineitem")
    od = load_table(spark, sf_smoke, "orders")
    write_bucketed(
        li, "lineitem_b", bucket_cols=["l_orderkey"], num_buckets=4,
        path=str(root / "lineitem_b"),
    )
    write_bucketed(
        od, "orders_b", bucket_cols=["o_orderkey"], num_buckets=4,
        path=str(root / "orders_b"),
    )
    yield "lineitem_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, od_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_bucketed(spark, li_t)
        od = read_bucketed(spark, od_t)
        joined = li.join(od, li.l_orderkey == od.o_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        plan = _physical(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # Same row count as the path-read join (layout is transparent).
        expected = (
            load_table(spark, "/root/testdata/sf0.001", "lineitem").count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = (
        read_bucketed(spark, li_t)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _physical(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_exchange(spark, sf_smoke):
    """Control: the same join over plain path reads shuffles both sides."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_smoke, "lineitem")
        od = load_table(spark, sf_smoke, "orders")
        plan = _physical(li.join(od, li.l_orderkey == od.o_orderkey))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
