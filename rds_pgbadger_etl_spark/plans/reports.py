"""pgBadger-style report sections over the parsed log-event table.

The reference's users get these tables inside the per-file HTML report
pgBadger produces (invocation rds_pgbadger.py:51-63); here each section is
a DataFrame query over the output of ``operators.logparse.parse_logs``
(SURVEY.md §2.2 P5–P11). Input columns: source_file, event_ts,
remote_host, remote_port, log_user, database, pid, level, message,
duration_ms, query, normalized_query, line_no, n_lines.

Scale notes: every section is one hash-aggregate (map-side partial agg)
plus at most a top-K (TakeOrderedAndProject) — no joins, no global sorts.
Percentiles use ``percentile_approx`` (t-digest-style sketch) because at
100 TB an exact percentile would shuffle the raw values; the relational
layer (plans/relational.py q09) carries the exact variant for oracle
verification of interpolation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ERROR_LEVELS = ["ERROR", "FATAL", "PANIC", "WARNING"]


def top_queries(events: DataFrame, n: int = 20, by: str = "total_ms") -> DataFrame:
    """P5: top-N normalized queries by total/mean/max duration and count."""
    agg = (
        events.filter(F.col("normalized_query").isNotNull())
        .groupBy("normalized_query")
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.sum("duration_ms").alias("total_ms"),
            F.avg("duration_ms").alias("avg_ms"),
            F.max("duration_ms").alias("max_ms"),
            F.min("duration_ms").alias("min_ms"),
            F.percentile_approx("duration_ms", 0.95).alias("p95_ms"),
        )
    )
    return agg.orderBy(F.col(by).desc(), "normalized_query").limit(n)


def time_histogram(events: DataFrame, bucket: str = "hour") -> DataFrame:
    """P6: per-bucket event counts, duration stats, error counts."""
    return (
        events.filter(F.col("event_ts").isNotNull())
        .groupBy(F.date_trunc(bucket, "event_ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("duration_ms").alias("n_queries"),
            F.sum("duration_ms").alias("total_ms"),
            F.avg("duration_ms").alias("avg_ms"),
            F.percentile_approx("duration_ms", [0.9, 0.95, 0.99]).alias("p90_95_99_ms"),
            F.sum(F.col("level").isin(ERROR_LEVELS).cast("int")).alias("n_errors"),
        )
    )


def error_report(events: DataFrame, n: int = 20) -> DataFrame:
    """P8: counts per severity + top normalized error messages."""
    norm_msg = F.trim(
        F.regexp_replace(F.regexp_replace("message", r"\d+", "?"), r"\s+", " ")
    )
    return (
        events.filter(F.col("level").isin(ERROR_LEVELS))
        .groupBy("level", norm_msg.alias("normalized_message"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "level", "normalized_message")
        .limit(n)
    )


def connection_breakdown(events: DataFrame) -> DataFrame:
    """P9: one GROUPING SETS pass for the per-user / per-db / per-host
    breakdowns pgBadger renders as separate tables."""
    return (
        events.cube("log_user", "database", "remote_host")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("pid").alias("n_backends"),
            F.sum("duration_ms").alias("total_ms"),
        )
    )


def session_stats(events: DataFrame) -> DataFrame:
    """P10: connect→disconnect pairing per pid.

    PostgreSQL logs `connection authorized`/`disconnection` lines; a
    session is the span between them for one backend pid.
    """
    is_conn = F.col("message").rlike("connection (received|authorized)")
    is_disc = F.col("message").rlike("disconnection")
    sess = (
        events.filter(is_conn | is_disc)
        .groupBy("source_file", "pid")
        .agg(
            F.min(F.when(is_conn, F.col("event_ts"))).alias("connect_ts"),
            F.max(F.when(is_disc, F.col("event_ts"))).alias("disconnect_ts"),
            F.min_by("log_user", "line_no").alias("log_user"),
            F.min_by("database", "line_no").alias("database"),
        )
        .withColumn(
            "session_secs",
            (
                F.unix_micros("disconnect_ts") - F.unix_micros("connect_ts")
            ).cast("double")
            / 1e6,
        )
    )
    return sess.groupBy("log_user", "database").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.avg("session_secs").alias("avg_session_secs"),
        F.max("session_secs").alias("max_session_secs"),
    )


def maintenance_report(events: DataFrame) -> DataFrame:
    """P11: temp files / locks / checkpoints / autovacuum classification."""
    kind = (
        F.when(F.col("message").rlike("temporary file"), "temp_file")
        .when(F.col("message").rlike("(acquired|waiting for) \\w*Lock"), "lock")
        .when(F.col("message").rlike("checkpoint (starting|complete)"), "checkpoint")
        .when(F.col("message").rlike("automatic (vacuum|analyze)"), "autovacuum")
    )
    temp_bytes = F.regexp_extract("message", r"temporary file.*size (\d+)", 1)
    return (
        events.withColumn("kind", kind)
        .filter(F.col("kind").isNotNull())
        .withColumn(
            "temp_bytes",
            F.when(temp_bytes == "", None).otherwise(temp_bytes.cast("bigint")),
        )
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("temp_bytes").alias("total_temp_bytes"),
        )
    )


def slowest_statements(events: DataFrame, n: int = 20) -> DataFrame:
    """P5 companion (pgBadger "slowest individual queries"): top-N raw
    statements with their context — individual examples, not normalized
    groups. TakeOrderedAndProject, never a global sort."""
    return (
        events.filter(
            F.col("query").isNotNull() & F.col("duration_ms").isNotNull()
        )
        .select(
            "event_ts", "log_user", "database", "duration_ms", "query"
        )
        .orderBy(F.col("duration_ms").desc(), "query")
        .limit(n)
    )


def table_workload(events: DataFrame, n: int = 50) -> DataFrame:
    """Per-table workload (hot-table view): relation extracted from each
    statement's FROM/JOIN target, one hash aggregate + top-N."""
    tbl = F.lower(
        F.regexp_extract("query", r"(?i)\bFROM\s+([A-Za-z_][A-Za-z0-9_]*)", 1)
    )
    return (
        events.withColumn("table_name", tbl)
        .filter(F.col("table_name") != "")
        .groupBy("table_name")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("duration_ms").alias("total_ms"),
            F.max("duration_ms").alias("max_ms"),
            F.countDistinct("log_user").alias("n_users"),
        )
        .orderBy(F.col("total_ms").desc(), "table_name")
        .limit(n)
    )


def phase_timing(events: DataFrame) -> DataFrame:
    """P3b: prepare/bind/execute protocol-phase timing split (pgBadger's
    prepared-queries panel). One 4-group hash aggregate."""
    return (
        events.filter(F.col("phase").isNotNull())
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("duration_ms").alias("total_ms"),
            F.avg("duration_ms").alias("mean_ms"),
        )
    )


def duration_ranges(events: DataFrame) -> DataFrame:
    """P7c: queries-by-duration-range histogram over the standard
    pgBadger buckets (functions/normalize.DURATION_BUCKETS)."""
    from rds_pgbadger_etl_spark.functions.normalize import duration_bucket

    d = F.col("duration_ms")
    return (
        events.filter(d.isNotNull())
        .groupBy(
            duration_bucket(d, 0).alias("bucket"),
            duration_bucket(d, 1).alias("duration_range"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("duration_ms").alias("total_ms"),
        )
        .orderBy("bucket")
    )


def error_templates(events: DataFrame, n: int = 20) -> DataFrame:
    """P8 companion: most frequent errors after literal templating
    (quoted identifiers and numbers collapse, so message variants count
    as one template)."""
    from rds_pgbadger_etl_spark.functions.normalize import error_template

    return (
        events.filter(F.col("level").isin(ERROR_LEVELS))
        .select(
            error_template(F.col("message")).alias("template"),
            F.col("level"),
        )
        .groupBy("level", "template")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy(F.col("n_errors").desc(), "template")
        .limit(n)
    )


REPORT_SECTIONS = {
    "top_queries": top_queries,
    "slowest_statements": slowest_statements,
    "time_histogram": time_histogram,
    "error_report": error_report,
    "connection_breakdown": connection_breakdown,
    "session_stats": session_stats,
    "maintenance_report": maintenance_report,
    "table_workload": table_workload,
    "phase_timing": phase_timing,
    "duration_ranges": duration_ranges,
    "error_templates": error_templates,
}


def full_report(events: DataFrame) -> dict[str, DataFrame]:
    """P12: all sections of the per-run report (one dict of DataFrames)."""
    return {name: fn(events) for name, fn in REPORT_SECTIONS.items()}
