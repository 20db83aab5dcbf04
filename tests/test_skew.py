"""Salting utilities must be result-identical to their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.skew import (
    heavy_hitters,
    salted_count_distinct,
    salted_join,
)
from rds_pgbadger_etl_spark.sources.tables import load_table


def test_salted_count_distinct_exact(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    plain = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        r.event_type: r.n_distinct
        for r in salted_count_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    customer = load_table(spark, sf_oracle, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()
    )
    salted = (
        salted_join(orders, customer, ["o_custkey"], n_salt=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_heavy_hitters_finds_skewed_key(spark):
    rows = [(1, "hot")] * 900 + [(i, "cold") for i in range(1000, 1100)]
    df = spark.createDataFrame(rows, ["k", "tag"])
    hh = heavy_hitters(df, ["k"], threshold_ratio=0.5).collect()
    assert len(hh) == 1 and hh[0].k == 1 and hh[0].n_rows == 900
