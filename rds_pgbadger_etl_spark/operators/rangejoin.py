"""Range (interval) join: points matched to time intervals, shuffle-safe.

The naive formulation ``points JOIN intervals ON key = key AND ts >= start
AND ts < end`` gives Catalyst only the equi-key to shuffle on; every
point/interval pair sharing a key is materialized before the range
predicate filters — quadratic in per-key cardinality, which at 100 TB
(hot users, hot pids) is the classic blow-up. This operator adds a
*bucketized* equi-join dimension: the time axis is cut into fixed-width
buckets, each interval is exploded onto the buckets it covers, each point
maps to exactly one bucket, and the join runs on ``(key, bucket)`` before
the exact range predicate. Per-pair cost becomes O(interval_len /
bucket_width) join rows instead of O(points_per_key x intervals_per_key).

This is the same strategy as Databricks' range-join bin optimization and
the interval-join in Flink; expressed here purely with DataFrame ops
(sequence + explode + equi-join) so Catalyst/AQE still handle skew and
partial aggregation downstream.

Correctness: a point lies in exactly one bucket, and an interval's
exploded bucket set contains that bucket iff the buckets overlap, so each
qualifying (point, interval) pair appears exactly once — no dedup pass.
Intervals are half-open ``[start, end)``: an event at exactly ``end``
belongs to the next window, and adjacent windows never double-count.

Capability parity: the reference's pgBadger reports correlate events in
time windows (e.g. queries around an error, lock waits during a
checkpoint — rds_pgbadger.py:51-63 delegated surface, SURVEY.md §2.2
P8/P10/P11); this operator is the native engine's primitive for those
"what happened near X" questions.

Choosing ``bucket_width_s``: near the median interval length. Too small
-> explode factor (rows per interval) grows; too large -> more false
pairs survive to the range filter. Both degrade gracefully; the bench
loop is the tuning feedback.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    by: Sequence[str],
    point_ts: str,
    start: str,
    end: str,
    bucket_width_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with the same ``by`` keys
    whose half-open window ``[start, end)`` contains ``point_ts``.

    ``points`` and ``intervals`` must not share non-key column names
    (select/alias before calling). Output = point columns + interval
    columns (minus the interval side's duplicate key columns).

    ``how``: ``inner`` (default) or ``left`` — ``left`` keeps unmatched
    points with null interval columns (two-pass: inner on buckets, then
    an anti-joined null-extended union; still no cartesian blow-up).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner|left)")
    width_us = int(bucket_width_s) * _US

    p_bucket = F.floor(F.unix_micros(F.col(point_ts)) / F.lit(width_us))
    pts = points.withColumn("_rj_bucket", p_bucket)

    s_us = F.unix_micros(F.col(start))
    e_us = F.unix_micros(F.col(end))
    # Half-open [start, end): last covered bucket is the one holding end-1us.
    # Guard degenerate end<=start intervals (empty window -> no buckets).
    first_b = F.floor(s_us / F.lit(width_us))
    last_b = F.floor((e_us - F.lit(1)) / F.lit(width_us))
    ivs = (
        intervals.filter(e_us > s_us)
        .withColumn("_rj_bucket", F.explode(F.sequence(first_b, last_b)))
    )

    keys = ["_rj_bucket", *by]
    cond = [pts[k] == ivs[k] for k in keys]
    cond.append(pts[point_ts] >= ivs[start])
    cond.append(pts[point_ts] < ivs[end])

    drop_cols: list[Column] = [ivs[k] for k in keys]
    matched = pts.join(ivs, cond, "inner").drop(*drop_cols).drop("_rj_bucket")
    if how == "inner":
        return matched

    iv_only_cols = [c for c in intervals.columns if c not in by]
    unmatched = (
        pts.join(ivs, cond, "left_anti")
        .drop("_rj_bucket")
        .select(
            "*",
            *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_only_cols],
        )
    )
    return matched.unionByName(unmatched)
