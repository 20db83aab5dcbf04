"""Data-layout queries: Z-order clustering correctness + the delivered
file-skipping audit.

A 100 TB events table is scanned through two filter axes at once (who +
when). Sorting by time makes time filters cheap and leaves user filters
reading every file; Z-ordering (sinks/layout.write_zorder — the trick
behind Delta/Iceberg OPTIMIZE ZORDER) interleaves the bits of both
columns so EVERY file is a small box in (user_id, ts) space and a scan
filtering on either column (or both) skips files by footer min/max
alone.

Two registered queries split the claim the way the recall audits do:

- ``zorder_range_query`` (full oracle) — a 2-D range aggregate read
  FROM the z-ordered rewrite, hash-checked against DuckDB over the raw
  table: the rewrite is results-preserving.
- ``zorder_layout_audit`` (rows-only) — per (layout, predicate) file
  counts a stats-pruning scan would read, computed from the actual
  parquet footers of the two staged layouts. Physical file-layout
  state, no SQL twin by design (same contract as ann_index_stats).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.sinks.layout import (
    parquet_file_ranges,
    write_clustered,
    write_zorder,
)
from rds_pgbadger_etl_spark.sources.tables import load_table

# Staged once per (process, sf_dir): the same events rows written two
# ways — z-ordered over (user_id, ts) and range-sorted by ts alone (the
# strongest single-column competitor).
_LAYOUT_DIRS: dict[str, tuple[str, str]] = {}
N_CLUSTER_FILES = 16

# The probe box: literal dates (the generator's 30-day window is fixed
# across scale factors) and a user band that is non-empty from sf0.001
# (user_ids 0..14) up.
U_LO, U_HI = 10, 99
T_LO, T_HI = "2024-01-10 00:00:00", "2024-01-15 00:00:00"


def _staged_layouts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    staged = _LAYOUT_DIRS.get(sf_dir)
    if staged is None:
        ev = load_table(spark, sf_dir, "events")
        base = tempfile.mkdtemp(prefix="events_layout_")
        zdir, tdir = f"{base}/zorder", f"{base}/ts_sorted"
        write_zorder(ev, ["user_id", "ts"], zdir, N_CLUSTER_FILES)
        write_clustered(ev, F.col("ts"), tdir, N_CLUSTER_FILES)
        staged = (zdir, tdir)
        _LAYOUT_DIRS[sf_dir] = staged
    return staged


def zorder_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D range aggregate over the Z-ORDERED rewrite of events — the
    oracle runs the identical query on the raw table, so a hash match
    proves the clustered rewrite preserved every row and value while
    the footers (audited below) became skippable."""
    zdir, _ = _staged_layouts(spark, sf_dir)
    ev = spark.read.parquet(zdir)
    return (
        ev.filter(
            F.col("user_id").between(U_LO, U_HI)
            & (F.col("ts") >= T_LO)
            & (F.col("ts") < T_HI)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_ZORDER_RANGE_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS sum_value
FROM events
WHERE user_id BETWEEN {U_LO} AND {U_HI}
  AND ts >= TIMESTAMP '{T_LO}' AND ts < TIMESTAMP '{T_HI}'
GROUP BY event_type
"""


def _overlaps(rng, lo, hi) -> bool:
    fmin, fmax = rng
    if fmin is None or fmax is None:
        return True  # no stats ⇒ a pruning scan must read the file
    return not (fmax < lo or fmin > hi)


def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Files a footer-pruning scan reads per (layout, predicate) — the
    delivered-skipping numbers. ``user_only`` is the predicate a time
    sort cannot skip for (every ts-sorted file spans the full user
    domain, so it reads all files; the z-ordered layout reads the files
    whose user box overlaps); ``box`` is the 2-D predicate both help
    with. Rows-only by design: physical footer state has no SQL twin."""
    import datetime as _dt

    zdir, tdir = _staged_layouts(spark, sf_dir)
    t_lo = _dt.datetime.fromisoformat(T_LO)
    t_hi = _dt.datetime.fromisoformat(T_HI)
    rows = []
    for layout, d in (("zorder", zdir), ("ts_sorted", tdir)):
        ranges = parquet_file_ranges(d, ["user_id", "ts"])
        # match the comparison tz to the FOOTER VALUES themselves
        # (zorder_range_query and its oracle interpret the T_LO/T_HI
        # literals in the session timezone, and stats may come back
        # aware or naive depending on the writer) — deriving tzinfo
        # from the stats keeps the audited box aligned with the
        # oracle-checked query in any session tz, and never compares
        # aware against naive
        stat_tz = next(
            (
                r["ts"][0].tzinfo
                for r in ranges
                if r["ts"][0] is not None
            ),
            None,
        )
        t_lo_c = t_lo.replace(tzinfo=stat_tz)
        t_hi_c = t_hi.replace(tzinfo=stat_tz)
        n_user = sum(
            1 for r in ranges if _overlaps(r["user_id"], U_LO, U_HI)
        )
        n_box = sum(
            1
            for r in ranges
            if _overlaps(r["user_id"], U_LO, U_HI)
            and _overlaps(r["ts"], t_lo_c, t_hi_c)
        )
        rows.append((layout, "user_only", len(ranges), n_user))
        rows.append((layout, "box", len(ranges), n_box))
    return spark.createDataFrame(
        rows, "layout string, predicate string, n_files long, files_read long"
    )


QUERIES = {
    "zorder_range_query": (zorder_range_query, _ZORDER_RANGE_SQL),
    "zorder_layout_audit": (zorder_layout_audit, None),
}
