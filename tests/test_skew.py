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


def test_salted_join_rejects_degenerate_salt(spark):
    """A join-key-derived salt is constant within the hot key — the
    exact case salting exists for — so it must raise, not silently no-op
    (VERDICT r4 item 7)."""
    import pytest

    left = spark.createDataFrame([(1, "a")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    with pytest.raises(ValueError, match="join key"):
        salted_join(left, right, ["k"], salt_by="k")
    with pytest.raises(ValueError, match="non-key"):
        salted_join(left.select("k"), right, ["k"])


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must fan out over n_salt distinct composite
    join keys (key, salt) — i.e. n_salt shuffle targets — and the join
    must still be exact."""
    n_salt = 8
    rows = [(1, f"v{i}") for i in range(1000)] + [(2, "only")]
    left = spark.createDataFrame(rows, ["k", "v"])
    right = spark.createDataFrame([(1, "hot-dim"), (2, "cold-dim")], ["k", "w"])

    salts = (
        left.filter(F.col("k") == 1)
        .select(F.pmod(F.hash("v"), F.lit(n_salt)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == n_salt, "hot key did not spread over all salt buckets"

    joined = salted_join(left, right, ["k"], n_salt=n_salt)
    got = sorted((r.k, r.v, r.w) for r in joined.collect())
    want = sorted([(1, f"v{i}", "hot-dim") for i in range(1000)] + [(2, "only", "cold-dim")])
    assert got == want


def test_aqe_skew_join_split_kicks_in(spark, sf_oracle):
    """q46's hot key must trip AQE's runtime skew-join split once
    broadcast is off and the skew thresholds are scaled to the test
    corpus: the executed final plan carries `skew=true` / a skewed
    AQEShuffleRead. At production thresholds the same plan shape handles
    a 256MB+ hot partition — this pins that the session config
    (adaptive + skewJoin enabled) actually engages."""
    from rds_pgbadger_etl_spark.plans.relational import q46_skew_join_demo

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8kb"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4kb")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        df = q46_skew_join_demo(spark, sf_oracle)
        rows = {r.c_mktsegment: r.n_events for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, f"AQE did not split the hot partition:\n{plan}"
    assert sum(rows.values()) == 10_000  # every event row joined exactly once
