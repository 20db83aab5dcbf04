"""Log-file catalog planning: the reference's O2–O8 dataflow, declaratively.

The reference eagerly plans over the RDS file listing
(rds_pgbadger.py:83-129): list files whose names contain the target dates
(O2, server-side contains-filter + MaxRecords), union day chunks with a
visited-set (O3) plus a midnight boundary-fill (O4), drop the
still-open reference hour (O5), sort by the timestamp parsed from the last
13 name chars (O6), keep the newest ``max_records`` (O7), and fan out one
task per file (O8).

Here the whole selection is ONE declarative plan over a file-catalog
DataFrame: deriving the hour window first makes the reference's day-chunk
union and boundary-fill edge case (rds_pgbadger.py:104-110) structurally
impossible, and Catalyst executes sort+limit as TakeOrderedAndProject
(top-K, no global sort). Fan-out (O8) is just Spark reading the selected
paths — one partition per file split.

File-name format: ``…postgresql.log.YYYY-MM-DD-HH`` (reference
rds_pgbadger.py:120; rds_download_log.py:58).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# trailing-13-char timestamp, e.g. 2019-04-01-10
NAME_TS_FORMAT = "yyyy-MM-dd-HH"
NAME_TS_RE = r"(\d{4}-\d{2}-\d{2}-\d{2})$"


def file_timestamp(col) -> F.Column:
    """Parse the trailing YYYY-MM-DD-HH of a log file name; null when the
    name does not end in a timestamp (quarantine, don't drop — O17)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract(c, NAME_TS_RE, 1)
    return F.try_to_timestamp(F.when(raw == "", None).otherwise(raw),
                              F.lit(NAME_TS_FORMAT))


def select_log_files(
    files: DataFrame,
    reference_dt: datetime,
    max_records: int | None = 5,
    name_col: str = "file_name",
) -> DataFrame:
    """Pick the newest ``max_records`` *closed*-hour files at or before
    the reference hour — the reference's entire planning pipeline
    (rds_pgbadger.py:83-129) as one Catalyst plan.

    Output: file_name, file_ts (desc order). The reference-hour file is
    excluded because it is still being written (O5 — the batch twin of a
    1-hour watermark). ``max_records=None`` means every closed hour —
    expressed by OMITTING the limit, never by a huge K: ``.limit(k)``
    compiles to TakeOrderedAndProject, which allocates a k-sized top-K
    buffer per partition.
    """
    ref_hour = reference_dt.replace(minute=0, second=0, microsecond=0)
    out = (
        files.withColumn("file_ts", file_timestamp(name_col))
        .filter(F.col("file_ts").isNotNull())
        .filter(F.col("file_ts") < F.lit(ref_hour))  # closed hours only
        .orderBy(F.col("file_ts").desc(), F.col(name_col).desc())
    )
    if max_records is not None:
        out = out.limit(max_records)
    return out.select(name_col, "file_ts")
