"""PostgreSQL stderr-log parsing: tokenize, reassemble, enrich.

Implements SURVEY.md §2.2 P1 (prefix tokenization), P2 (multi-line
statement reassembly — the one order-sensitive step in the engine) and
P3/P4 enrichment, natively in Spark. The line format is pinned by the
reference's pgBadger flags (rds_pgbadger.py:56-59):

    log_line_prefix = '%t:%r:%u@%d:[%p]:'
    ==> 2019-04-01 10:23:45 UTC:10.0.0.12(50314):app@proddb:[4242]:LOG:  ...

Continuation lines (the tail of a multi-line statement) carry no prefix;
they belong to the preceding prefixed line of the same file.

Scale design:
- line_no is derived per file by ordering on
  ``(_metadata.file_block_start, monotonically_increasing_id)``. The
  block start pins each file split's true byte offset, so line numbers
  are correct even when Spark's bin-packing assigns a later split of a
  1 GB log to an earlier partition index (split-to-partition order is an
  implementation detail, not a contract); within a split, rows scan in
  offset order so the monotonic id breaks ties correctly. A line that
  straddles a split boundary is read by the earlier split's reader
  (Hadoop line-reader semantics), so it carries the earlier block start.
  (The reference gets intra-file parallelism from pgbadger ``--jobs 8``,
  rds_pgbadger.py:54-55; Spark gets it from splits.)
- Reassembly shuffles once on ``source_file`` (hour-granular files →
  naturally bounded partitions); everything downstream is order-free.
- All parsing is regexp built-ins inside codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.normalize import (
    extract_duration_ms,
    extract_phase,
    extract_statement,
    normalize_query,
)

# %t:%r:%u@%d:[%p]:LEVEL: payload   (groups: ts, tz, host, port, user, db,
# pid, level, payload). %r may be empty or [local]; port optional.
PREFIX_RE = (
    r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})(?: ([A-Z]{2,5}))?"  # %t (+tz)
    r":([^:(]*)(?:\((\d+)\))?"  # %r host(port)
    r":([^@:]*)@([^:]*)"  # %u@%d
    r":\[(\d+)\]"  # [%p]
    r":([A-Z]+):\s?(.*)$"  # LEVEL: payload
)

LEVELS = [
    "LOG",
    "ERROR",
    "FATAL",
    "PANIC",
    "WARNING",
    "NOTICE",
    "INFO",
    "DEBUG",
    "STATEMENT",
    "DETAIL",
    "HINT",
    "CONTEXT",
]


def read_log_lines(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read raw log text as ``(source_file, line_no, value)``.

    The catalog-scan + pruning the reference does against the RDS API
    (rds_pgbadger.py:86-93) is Spark's file listing here: pass a file, a
    directory, a glob (``…/logs/*.log``), or an explicit list of selected
    paths (the O7 top-K output). A trailing glob is translated to
    ``pathGlobFilter`` (this Spark build rejects inline globs on the
    local filesystem).
    """
    import os

    reader = spark.read
    if isinstance(path, str):
        base = os.path.basename(path)
        if any(ch in base for ch in "*?["):
            reader = reader.option("pathGlobFilter", base)
            path = os.path.dirname(path)
    w = Window.partitionBy("source_file").orderBy("block_start", "mid")
    return (
        reader.text(path)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("_metadata.file_block_start").alias("block_start"),
            F.monotonically_increasing_id().alias("mid"),
            F.col("value"),
        )
        .withColumn("line_no", F.row_number().over(w))
        .drop("mid", "block_start")
    )


def _null_if_empty(c: Column) -> Column:
    return F.when(c == "", None).otherwise(c)


def tokenize(lines: DataFrame) -> DataFrame:
    """P1: split each line into prefix fields; non-matching lines keep
    nulls (continuation or malformed — resolved by :func:`reassemble`)."""
    v = F.col("value")
    ext = [F.regexp_extract(v, PREFIX_RE, i) for i in range(1, 10)]
    return lines.select(
        "source_file",
        "line_no",
        "value",
        F.to_timestamp(_null_if_empty(ext[0]), "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        _null_if_empty(ext[2]).alias("remote_host"),
        _null_if_empty(ext[3]).cast("int").alias("remote_port"),
        _null_if_empty(ext[4]).alias("log_user"),
        _null_if_empty(ext[5]).alias("database"),
        _null_if_empty(ext[6]).cast("int").alias("pid"),
        _null_if_empty(ext[7]).alias("level"),
        F.when(_null_if_empty(ext[7]).isNull(), None).otherwise(ext[8]).alias("payload"),
        (ext[0] != "").alias("is_header"),
    )


def reassemble(tokens: DataFrame) -> DataFrame:
    """P2: glue continuation lines onto their header line.

    PostgreSQL stderr format indents the continuation lines of a
    multi-line statement with whitespace; those join the preceding header
    event. Non-indented lines that match no prefix are malformed —
    consecutive runs are quarantined as one MALFORMED event each
    (SURVEY.md P1: route, don't drop).
    """
    w0 = Window.partitionBy("source_file").orderBy("line_no")
    w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    garbage = ~F.col("is_header") & ~F.col("value").rlike(r"^[\t ]")
    boundary = F.col("is_header") | (garbage & ~F.lag(garbage, 1, False).over(w0))
    numbered = tokens.withColumn("event_seq", F.sum(boundary.cast("int")).over(w))

    line_struct = F.struct(
        F.col("line_no"),
        F.when(F.col("is_header"), F.col("payload")).otherwise(F.col("value")).alias("txt"),
    )
    grouped = (
        numbered.groupBy("source_file", "event_seq")
        .agg(
            F.min_by("event_ts", "line_no").alias("event_ts"),
            F.min_by("remote_host", "line_no").alias("remote_host"),
            F.min_by("remote_port", "line_no").alias("remote_port"),
            F.min_by("log_user", "line_no").alias("log_user"),
            F.min_by("database", "line_no").alias("database"),
            F.min_by("pid", "line_no").alias("pid"),
            F.min_by("level", "line_no").alias("level"),
            F.min("line_no").alias("line_no"),
            F.count(F.lit(1)).alias("n_lines"),
            F.concat_ws(
                "\n",
                F.transform(F.array_sort(F.collect_list(line_struct)), lambda s: s.txt),
            ).alias("message"),
        )
        .withColumn("level", F.coalesce("level", F.lit("MALFORMED")))
    )
    return grouped


def enrich(events: DataFrame) -> DataFrame:
    """P3/P4: duration, statement text and its normalized form."""
    stmt = F.when(
        F.col("level") == "STATEMENT", F.col("message")
    ).otherwise(extract_statement("message"))
    return (
        events.withColumn("duration_ms", extract_duration_ms("message"))
        .withColumn("phase", extract_phase("message"))
        .withColumn("query", stmt)
        .withColumn(
            "normalized_query",
            F.when(F.col("query").isNotNull(), normalize_query("query")),
        )
    )


def parse_logs(spark: SparkSession, path: str) -> DataFrame:
    """Full P1→P2→P3/P4 pipeline: raw text path → parsed event table."""
    return enrich(reassemble(tokenize(read_log_lines(spark, path))))
