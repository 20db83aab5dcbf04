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


def _read_raw_lines(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Raw log text as ``(source_file, block_start, mid, value)`` —
    the pre-window form shared by :func:`read_log_lines` and the fused
    parse path."""
    import os

    reader = spark.read
    if isinstance(path, str):
        base = os.path.basename(path)
        if any(ch in base for ch in "*?["):
            reader = reader.option("pathGlobFilter", base)
            path = os.path.dirname(path)
    return reader.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("_metadata.file_block_start").alias("block_start"),
        F.monotonically_increasing_id().alias("mid"),
        F.col("value"),
    )


def read_log_lines(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read raw log text as ``(source_file, line_no, value)``.

    The catalog-scan + pruning the reference does against the RDS API
    (rds_pgbadger.py:86-93) is Spark's file listing here: pass a file, a
    directory, a glob (``…/logs/*.log``), or an explicit list of selected
    paths (the O7 top-K output). A trailing glob is translated to
    ``pathGlobFilter`` (this Spark build rejects inline globs on the
    local filesystem).
    """
    w = Window.partitionBy("source_file").orderBy("block_start", "mid")
    return (
        _read_raw_lines(spark, path)
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


# Delimiter for the single-pass group extraction in the fused path.
# Groups 1-8 of PREFIX_RE (timestamp, tz, host, port, user, db, pid,
# level) essentially cannot contain \x01; the one free-text group
# (payload, $9) is re-joined losslessly after the split, and any header
# that DOES contain \x01 falls back to per-group regexp_extract.
_DELIM = "\x01"
_REPL = _DELIM.join(f"${i}" for i in range(1, 10))


def _group(i: int) -> Column:
    """Prefix group ``i`` of the header line, from the materialized
    ``parts`` column when the single-pass split applies, else a
    per-group ``regexp_extract`` fallback ('' when not a header, the
    same as ``regexp_extract`` on a non-matching line)."""
    parts, hdr = F.col("parts"), F.col("hdr")
    if i < 9:
        fast = parts[i - 1]
    else:
        # payload tail: re-join so a payload containing \x01 round-trips
        fast = F.array_join(
            F.slice(parts, 9, F.greatest(F.size(parts) - 8, F.lit(1))), _DELIM
        )
    slow = F.when(F.col("is_hdr"), F.regexp_extract(hdr, PREFIX_RE, i)).otherwise(
        F.lit("")
    )
    return F.when(parts.isNotNull(), fast).otherwise(slow)


def _reassemble_fused(raw: DataFrame) -> DataFrame:
    """P1+P2 in one narrow pass — same result as
    ``reassemble(tokenize(read_log_lines(...)))`` (equivalence pinned by
    ``test_logparse.py::test_fused_parse_matches_staged``), restructured
    for scale:

    - line_no / boundary / event_seq are computed over the NARROW raw
      rows with both window passes sharing one sort on
      ``(source_file, block_start, mid)`` — the staged path re-sorts the
      9-column tokenized rows a second time.
    - The aggregate is a single ``collect_list(struct(line_no, value))``
      instead of seven ``min_by`` + ``collect_list`` buffers; first-line
      fields are taken from element 0 of the sorted array.
    - Prefix extraction runs once per EVENT on the header line (via
      :func:`_group` over a materialized single-pass split) instead of
      nine ``regexp_extract`` per LINE.

    Before/after numbers on the 3.28 GB / 24-hour-file rehearsal corpus
    are in BENCH_NOTES.md ("fused parse"); output is identical.
    """
    v = F.col("value")
    w0 = Window.partitionBy("source_file").orderBy("block_start", "mid")
    wrun = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    flagged = raw.withColumn("is_header", v.rlike(PREFIX_RE)).withColumn(
        "garbage", ~F.col("is_header") & ~v.rlike(r"^[\t ]")
    )
    numbered = (
        flagged.select(
            "source_file",
            "block_start",
            "mid",
            "value",
            F.row_number().over(w0).alias("line_no"),
            (
                F.col("is_header")
                | (F.col("garbage") & ~F.lag("garbage", 1, False).over(w0))
            ).alias("boundary"),
        )
        # same window spec as w0 -> reuses the sort, no second exchange
        .withColumn("event_seq", F.sum(F.col("boundary").cast("int")).over(wrun))
        .drop("block_start", "mid", "boundary")
    )

    grouped = numbered.groupBy("source_file", "event_seq").agg(
        F.array_sort(F.collect_list(F.struct("line_no", "value"))).alias("lines")
    )

    # The next two projections are kept as SEPARATE plan nodes on
    # purpose: `hdr` and `parts` are non-cheap expressions referenced
    # many times downstream, and Catalyst's CollapseProject leaves the
    # boundary in place exactly when a non-trivial alias is multiply
    # referenced — so the regex split runs ONCE per event. (Folding
    # everything into one projection re-evaluates the whole extraction
    # tree per output column: measured 9x slower.)
    first = F.col("lines")[0]
    hdr = F.col("hdr")
    with_hdr = grouped.select(
        "source_file",
        "event_seq",
        "lines",
        first["line_no"].alias("line_no"),
        first["value"].alias("hdr"),
    ).withColumn("is_hdr", hdr.rlike(PREFIX_RE))
    with_parts = with_hdr.withColumn(
        "parts",
        F.when(
            F.col("is_hdr") & ~hdr.contains(_DELIM),
            F.split(F.regexp_replace(hdr, PREFIX_RE, _REPL), _DELIM),
        ),
    )

    level = _null_if_empty(_group(8))
    payload = F.when(level.isNull(), None).otherwise(_group(9))
    head_txt = F.when(F.col("is_hdr"), payload).otherwise(hdr)
    tail = F.transform(
        F.slice(F.col("lines"), 2, F.greatest(F.size("lines") - 1, F.lit(0))),
        lambda s: s["value"],
    )
    return with_parts.select(
        "source_file",
        "event_seq",
        F.to_timestamp(_null_if_empty(_group(1)), "yyyy-MM-dd HH:mm:ss").alias(
            "event_ts"
        ),
        _null_if_empty(_group(3)).alias("remote_host"),
        _null_if_empty(_group(4)).cast("int").alias("remote_port"),
        _null_if_empty(_group(5)).alias("log_user"),
        _null_if_empty(_group(6)).alias("database"),
        _null_if_empty(_group(7)).cast("int").alias("pid"),
        F.coalesce(level, F.lit("MALFORMED")).alias("level"),
        "line_no",
        F.size("lines").cast("long").alias("n_lines"),
        F.concat_ws("\n", F.concat(F.array(head_txt), tail)).alias("message"),
    )


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
    """Full P1→P2→P3/P4 pipeline: raw text path → parsed event table.

    Uses the fused P1+P2 plan (:func:`_reassemble_fused`); the staged
    ``reassemble(tokenize(...))`` composition is kept as the readable
    reference implementation and equivalence oracle.
    """
    return enrich(_reassemble_fused(_read_raw_lines(spark, path)))
