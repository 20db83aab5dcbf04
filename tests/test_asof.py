"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from rds_pgbadger_etl_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_basic_no_prior_tie_and_tiebreak(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T00:00:05")),  # between r10 and r20
            (2, "u", _ts("2024-01-01T00:00:00")),  # no prior -> nulls
            (3, "u", _ts("2024-01-01T00:00:10")),  # exact tie: inclusive
            (4, "v", _ts("2024-01-01T00:00:30")),  # other key
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts("2024-01-01T00:00:01"), "a"),
            (20, "u", _ts("2024-01-01T00:00:10"), "b"),
            (21, "u", _ts("2024-01-01T00:00:10"), "c"),  # same ts: max rid wins
            (30, "v", _ts("2024-01-01T00:00:29"), "d"),
        ],
        ["rid", "k", "ts", "payload"],
    )
    out = {
        r.id: (r.prev_rid, r.prev_payload)
        for r in asof_join(
            left, right, by=["k"], left_ts="ts", right_ts="ts",
            right_cols=["rid", "payload"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (10, "a")
    assert out[2] == (None, None)
    assert out[3] == (21, "c")  # inclusive at-or-before + deterministic tie
    assert out[4] == (30, "d")
    # left columns survive untouched
    assert set(out) == {1, 2, 3, 4}
