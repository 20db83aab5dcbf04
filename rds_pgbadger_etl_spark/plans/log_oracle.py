"""Oracle-checkable log-analytics queries (SURVEY P1/P3/P4/P5/P6/P8).

The driver's DuckDB oracle can only see the ten registered tables — it
cannot read the golden log fixtures. So these queries *synthesize*
PostgreSQL stderr log lines deterministically FROM the ``events`` table
(same line format the reference pins via pgBadger's
``--prefix '%t:%r:%u@%d:[%p]:'``, rds_pgbadger.py:56-59), then run the
engine's real tokenizer/normalizer on them. The oracle performs the
identical synthesis + parse in DuckDB SQL (RE2 regexes — kept compatible
with Spark's Java regexes by construction), so the driver hash-checks the
actual parsing semantics end-to-end.

The multi-line reassembly step (P2) is order-sensitive and exercised by
golden fixtures in tests/test_logparse.py instead; lines here are
single-line events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.normalize import (
    DURATION_RE,
    extract_duration_ms,
    extract_statement,
    normalize_query,
    normalize_query_oracle_sql,
)
from rds_pgbadger_etl_spark.operators.logparse import PREFIX_RE, tokenize
from rds_pgbadger_etl_spark.sources.tables import load_table, rebalance

# ---------------------------------------------------------------------------
# Shared synthesis — keep the Spark and SQL versions textually parallel.


def _s(c: Column) -> Column:
    return c.cast("string")


def _synth_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regex parse downstream amplifies per-row cost; spread a single
    # small input split across the session's cores first.
    ev = rebalance(load_table(spark, sf_dir, "events"))
    level = (
        F.when(F.col("event_type") == "error", "ERROR")
        .when(F.col("event_type") == "signup", "WARNING")
        .otherwise("LOG")
    )
    stmt = F.concat(
        F.lit("SELECT * FROM t"),
        _s(F.col("event_id") % 20),
        F.lit(" WHERE user_id = "),
        _s(F.col("user_id")),
        F.lit(" AND city = 'C"),
        _s(F.col("event_id") % 7),
        F.lit("' AND id IN ("),
        _s(F.col("user_id")),
        F.lit(", "),
        _s(F.col("event_id")),
        F.lit(")"),
    )
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit(" UTC:10.0."),
        _s(F.col("user_id") % 250),
        F.lit(".1("),
        _s(F.lit(50000) + F.col("event_id") % 1000),
        F.lit("):u"),
        _s(F.col("user_id") % 10),
        F.lit("@db"),
        _s(F.col("user_id") % 5),
        F.lit(":["),
        _s(F.lit(1000) + F.col("user_id") % 100),
        F.lit("]:"),
        level,
        F.lit(":  duration: "),
        _s(F.abs(F.round(F.col("value") * 100)).cast("bigint")),
        F.lit(" ms  statement: "),
        stmt,
    )
    return ev.select(
        F.lit("synthetic.log").alias("source_file"),
        F.col("event_id").alias("line_no"),
        line.alias("value"),
    )


_SYNTH_SQL = """
  SELECT strftime(ts, '%Y-%m-%d %H:%M:%S')
         || ' UTC:10.0.' || cast(user_id % 250 AS varchar)
         || '.1(' || cast(50000 + event_id % 1000 AS varchar)
         || '):u' || cast(user_id % 10 AS varchar)
         || '@db' || cast(user_id % 5 AS varchar)
         || ':[' || cast(1000 + user_id % 100 AS varchar)
         || ']:'
         || (CASE WHEN event_type = 'error' THEN 'ERROR'
                  WHEN event_type = 'signup' THEN 'WARNING'
                  ELSE 'LOG' END)
         || ':  duration: '
         || cast(cast(abs(round(value * 100)) AS bigint) AS varchar)
         || ' ms  statement: '
         || 'SELECT * FROM t' || cast(event_id % 20 AS varchar)
         || ' WHERE user_id = ' || cast(user_id AS varchar)
         || ' AND city = ''C' || cast(event_id % 7 AS varchar)
         || ''' AND id IN (' || cast(user_id AS varchar)
         || ', ' || cast(event_id AS varchar) || ')' AS value
  FROM events
"""

_PARSE_SQL = f"""
  SELECT regexp_extract(value, '{PREFIX_RE}', 5) AS log_user,
         regexp_extract(value, '{PREFIX_RE}', 6) AS db,
         regexp_extract(value, '{PREFIX_RE}', 8) AS level,
         cast(regexp_extract(value, '{PREFIX_RE}', 7) AS int) AS pid,
         strptime(regexp_extract(value, '{PREFIX_RE}', 1),
                  '%Y-%m-%d %H:%M:%S') AS event_ts,
         regexp_extract(value, '{PREFIX_RE}', 9) AS payload,
         cast(regexp_extract(value, '{DURATION_RE}', 1) AS double) AS duration_ms
  FROM lines
"""


# ---------------------------------------------------------------------------
# P1/P3: field extraction + duration — per-user/db rollup.
def log_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = tokenize(_synth_lines(spark, sf_dir))
    return (
        parsed.withColumn("duration_ms", extract_duration_ms("payload"))
        .groupBy("log_user", F.col("database").alias("db"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("duration_ms").cast("bigint")).alias("total_ms"),
            F.countDistinct("pid").alias("n_pids"),
        )
    )


_LOG_PARSE_FIELDS_SQL = f"""
WITH lines AS ({_SYNTH_SQL}),
parsed AS ({_PARSE_SQL})
SELECT log_user, db,
       count(*) AS n_events,
       cast(sum(cast(duration_ms AS bigint)) AS bigint) AS total_ms,
       cast(count(DISTINCT pid) AS bigint) AS n_pids
FROM parsed GROUP BY log_user, db
"""


# P4/P5: normalize + top-N by calls (pgBadger "most frequent queries").
def log_top_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = tokenize(_synth_lines(spark, sf_dir))
    return (
        parsed.withColumn("nq", normalize_query(extract_statement("payload")))
        .groupBy(F.col("nq").alias("normalized_query"))
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.sum(extract_duration_ms("payload").cast("bigint")).alias("total_ms"),
        )
        .orderBy(F.col("calls").desc(), "normalized_query")
        .limit(10)
    )


_STMT_RE_SQL = r"(?s)(?:statement|execute [^:]*): (.*)"
_LOG_TOP_QUERIES_SQL = f"""
WITH lines AS ({_SYNTH_SQL}),
parsed AS ({_PARSE_SQL})
SELECT {normalize_query_oracle_sql(f"regexp_extract(payload, '{_STMT_RE_SQL}', 1)")}
         AS normalized_query,
       count(*) AS calls,
       cast(sum(cast(duration_ms AS bigint)) AS bigint) AS total_ms
FROM parsed
GROUP BY normalized_query
ORDER BY calls DESC, normalized_query LIMIT 10
"""


# P6: hourly histogram over the parsed timestamp.
def log_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = tokenize(_synth_lines(spark, sf_dir))
    return (
        parsed.filter(F.col("event_ts").isNotNull())
        .groupBy(F.date_trunc("hour", "event_ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(extract_duration_ms("payload").cast("bigint")).alias("total_ms"),
        )
    )


_LOG_TIME_HISTOGRAM_SQL = f"""
WITH lines AS ({_SYNTH_SQL}),
parsed AS ({_PARSE_SQL})
SELECT date_trunc('hour', event_ts) AS bucket,
       count(*) AS n_events,
       cast(sum(cast(duration_ms AS bigint)) AS bigint) AS total_ms
FROM parsed WHERE event_ts IS NOT NULL
GROUP BY date_trunc('hour', event_ts)
"""


# P8: severity breakdown (ERROR/WARNING filter → group → count).
def log_error_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = tokenize(_synth_lines(spark, sf_dir))
    return (
        parsed.filter(F.col("level").isin("ERROR", "FATAL", "PANIC", "WARNING"))
        .groupBy("level", "log_user")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_LOG_ERROR_CLASSES_SQL = f"""
WITH lines AS ({_SYNTH_SQL}),
parsed AS ({_PARSE_SQL})
SELECT level, log_user, count(*) AS n
FROM parsed WHERE level IN ('ERROR', 'FATAL', 'PANIC', 'WARNING')
GROUP BY level, log_user
"""


QUERIES = {
    "log_parse_fields": (log_parse_fields, _LOG_PARSE_FIELDS_SQL),
    "log_top_queries": (log_top_queries, _LOG_TOP_QUERIES_SQL),
    "log_time_histogram": (log_time_histogram, _LOG_TIME_HISTOGRAM_SQL),
    "log_error_classes": (log_error_classes, _LOG_ERROR_CLASSES_SQL),
}
