"""Range-join operator: boundary, multi-bucket, left-join, degenerate cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators.rangejoin import range_join


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts(0)),   # == start: included
            (2, "u1", _ts(5)),   # inside
            (3, "u1", _ts(10)),  # == end: excluded (half-open)
            (4, "u2", _ts(5)),   # right key, other user's window
            (5, "u1", _ts(59)),  # far outside
        ],
        "point_id long, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("w1", "u1", _ts(0), _ts(10)),   # [00:00, 00:10)
            ("w2", "u2", _ts(4), _ts(6)),    # [00:04, 00:06)
            ("w3", "u1", _ts(20), _ts(20)),  # empty window
        ],
        "win_id string, user string, win_start timestamp, win_end timestamp",
    )
    return points, intervals


def test_half_open_boundaries_and_keys(spark):
    points, intervals = _frames(spark)
    out = range_join(
        points, intervals, by=["user"], point_ts="ts",
        start="win_start", end="win_end", bucket_width_s=120,
    )
    got = {(r.point_id, r.win_id) for r in out.collect()}
    assert got == {(1, "w1"), (2, "w1"), (4, "w2")}


def test_interval_spanning_many_buckets_matches_once(spark):
    # Tiny bucket width forces the window across many buckets; each
    # qualifying pair must still appear exactly once (no dedup pass).
    points, intervals = _frames(spark)
    out = range_join(
        points, intervals, by=["user"], point_ts="ts",
        start="win_start", end="win_end", bucket_width_s=7,
    )
    rows = [(r.point_id, r.win_id) for r in out.collect()]
    assert sorted(rows) == [(1, "w1"), (2, "w1"), (4, "w2")]


def test_left_join_keeps_unmatched_points(spark):
    points, intervals = _frames(spark)
    out = range_join(
        points, intervals, by=["user"], point_ts="ts",
        start="win_start", end="win_end", bucket_width_s=60, how="left",
    )
    got = {(r.point_id, r.win_id) for r in out.collect()}
    assert got == {
        (1, "w1"), (2, "w1"), (4, "w2"),
        (3, None), (5, None),
    }
    assert out.filter(F.col("win_id").isNull()).count() == 2


def test_oracle_parity_on_events(spark, sf_oracle):
    """The bucketized plan equals the naive inequality join on real data."""
    from rds_pgbadger_etl_spark.plans.relational import (
        _Q18_SQL,
        q18_range_join_error_window,
    )
    from tests.oracle import compare

    df = q18_range_join_error_window(spark, sf_oracle)
    compare(df, _Q18_SQL, sf_oracle)
