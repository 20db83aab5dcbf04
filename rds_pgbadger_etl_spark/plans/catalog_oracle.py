"""Oracle-checkable catalog-planning queries (SURVEY O2–O8, O17).

File names are synthesized from the hours present in ``events`` (one
catalog row per distinct hour, plus malformed names that must be
quarantined), then pushed through the engine's real selection pipeline
(sources/logcatalog.py). The DuckDB oracle performs the identical
synthesis + selection.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.scalar import extract_date_from_name
from rds_pgbadger_etl_spark.sources.logcatalog import select_log_files
from rds_pgbadger_etl_spark.sources.tables import load_table

_REFERENCE = datetime(2024, 1, 15, 12, 0, 0)
_MAX_RECORDS = 7


def _synth_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized file catalog, materialized once per process (two
    queries plan over it; a real deployment lists the object store once
    and plans every downstream step off that snapshot)."""
    from rds_pgbadger_etl_spark.plans._shared import shared_df

    def build() -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        named = ev.select(
            F.concat(
                F.lit("error/postgresql.log."),
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH"),
            ).alias("file_name")
        ).distinct()
        junk = spark.createDataFrame(
            [("error/postgresql.log.not-a-date",), ("random.txt",)],
            ["file_name"],
        )
        return named.union(junk)

    return shared_df(spark, "synth_catalog", sf_dir, build)


_SYNTH_CATALOG_SQL = """
  SELECT DISTINCT 'error/postgresql.log.' || strftime(date_trunc('hour', ts), '%Y-%m-%d-%H') AS file_name
  FROM events
  UNION ALL SELECT 'error/postgresql.log.not-a-date'
  UNION ALL SELECT 'random.txt'
"""


def catalog_select_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2–O7: newest-K closed-hour selection over the synthesized catalog."""
    return select_log_files(_synth_catalog(spark, sf_dir), _REFERENCE, _MAX_RECORDS)


_CATALOG_SELECT_SQL = f"""
WITH catalog AS ({_SYNTH_CATALOG_SQL}),
parsed AS (
  SELECT file_name,
         try_strptime(nullif(regexp_extract(file_name, '(\\d{{4}}-\\d{{2}}-\\d{{2}}-\\d{{2}})$', 1), ''),
                  '%Y-%m-%d-%H') AS file_ts
  FROM catalog
)
SELECT file_name, file_ts FROM parsed
WHERE file_ts IS NOT NULL AND file_ts < TIMESTAMP '{_REFERENCE:%Y-%m-%d %H:%M:%S}'
ORDER BY file_ts DESC, file_name DESC LIMIT {_MAX_RECORDS}
"""


def catalog_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17 + O18: per-date file counts with the 'unknown' fallback for
    undated names (reference utils.py:14-21 + the vestigial groupby)."""
    cat = _synth_catalog(spark, sf_dir)
    return (
        cat.withColumn("log_date", extract_date_from_name("file_name"))
        .groupBy("log_date")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )


_CATALOG_DATES_SQL = f"""
WITH catalog AS ({_SYNTH_CATALOG_SQL})
SELECT CASE WHEN regexp_extract(file_name, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) = ''
            THEN 'unknown'
            ELSE regexp_extract(file_name, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) END AS log_date,
       count(*) AS n_files
FROM catalog GROUP BY log_date
"""


# ---------------------------------------------------------------------------
# JSON-lines file source with corrupt-record quarantine (second source
# format next to parquet; same route-don't-drop contract as the log
# parser). The query round-trips events through a real on-disk JSONL
# directory: to_json → text sink → schema-pinned json source in
# PERMISSIVE mode with columnNameOfCorruptRecord, so a broken line
# surfaces as one quarantined row, never an aborted scan (at 100 TB a
# FAILFAST scan dies on the first bad line of a billion). A
# deterministic 1-in-41 corruption is injected before the write; the
# oracle reproduces the classification from the source table.


# Per-(process, sf, kind) staging dirs for the file-source round-trip
# queries — a PRIVATE mkdtemp per process (like the ANN/layout staging
# helpers) rather than a fixed world-guessable gettempdir() name: two
# concurrent runs at the same sf can't overwrite each other's files
# mid-read, and nothing attacker-pre-creatable is reused. Stable within
# the process so bench's repeated runs rewrite in place.
_INGEST_DIRS: dict[tuple[str, str], str] = {}


def _ingest_dir(kind: str, sf_dir: str) -> str:
    import os
    import tempfile

    key = (kind, sf_dir)
    d = _INGEST_DIRS.get(key)
    if d is None:
        sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        d = os.path.join(
            tempfile.mkdtemp(prefix=f"{kind}_{sf_tag}_"), "data"
        )
        _INGEST_DIRS[key] = d
    return d


def jsonl_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    doc = F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
    lines = ev.select(
        F.when(
            F.col("event_id") % 41 == 0, F.concat(F.lit("{broken "), doc)
        )
        .otherwise(doc)
        .alias("value")
    )
    out_dir = _ingest_dir("jsonl_src", sf_dir)
    lines.write.mode("overwrite").text(out_dir)
    parsed = (
        spark.read.schema(
            "event_id long, user_id long, event_type string, value double, "
            "_corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out_dir)
    )
    return parsed.groupBy(
        F.coalesce("event_type", F.lit("CORRUPT")).alias("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("bigint")), F.lit(0)
        ).alias("sum_cents"),
    )


_JSONL_INGEST_SQL = """
SELECT CASE WHEN event_id % 41 = 0 THEN 'CORRUPT' ELSE event_type END
         AS event_type,
       count(*) AS n_events,
       cast(count(DISTINCT CASE WHEN event_id % 41 <> 0 THEN user_id END)
            AS bigint) AS n_users,
       cast(coalesce(sum(CASE WHEN event_id % 41 <> 0
                              THEN cast(round(value * 100) AS bigint) END), 0)
            AS bigint) AS sum_cents
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ORC file source (third source format: parquet, JSONL, ORC). ORC is
# Spark-native (no extra package) and carries stripe-level min/max
# statistics + predicate pushdown like parquet, so the engine's
# layout/pruning story is format-portable. The query round-trips events
# through a real on-disk ORC table and aggregates off a FILTERED
# read-back (the filter rides to the ORC scan as a pushed predicate);
# the oracle reproduces the aggregate from the source table, so a hash
# match proves the ORC writer/reader round-trip is lossless — including
# microsecond timestamps, the type most formats mangle first.


def orc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out_dir = _ingest_dir("orc_src", sf_dir)
    ev.write.mode("overwrite").orc(out_dir)
    back = spark.read.orc(out_dir).filter(F.col("value") > 50.0)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
            "sum_cents"
        ),
    )


_ORC_INGEST_SQL = """
SELECT event_type,
       count(*) AS n_events,
       cast(count(DISTINCT user_id) AS bigint) AS n_users,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS sum_cents
FROM events
WHERE value > 50.0
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# CSV file source (fourth source format: parquet, JSONL, ORC, CSV).
# CSV is the interchange format real log pipelines actually receive;
# it has no embedded schema and its DEFAULT timestamp rendering drops
# sub-millisecond precision, so the round-trip pins the two things a
# CSV ingester must get right: an explicit read schema and an explicit
# microsecond timestampFormat on BOTH sides (the engine-wide
# TIMESTAMP_MICROS discipline carried to a text format). Filter and
# aggregate off the read-back; the oracle recomputes from the source
# table, so a hash match proves the text round-trip is lossless —
# including microseconds and the float value column (rounded to cents
# before summing, the same convention as the JSONL/ORC twins).

_CSV_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def csv_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out_dir = _ingest_dir("csv_src", sf_dir)
    (
        ev.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _CSV_TS_FMT)
        .csv(out_dir)
    )
    back = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        .option("header", "true")
        .option("timestampFormat", _CSV_TS_FMT)
        .csv(out_dir)
        .filter(F.col("value") > 50.0)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
            "sum_cents"
        ),
    )


_CSV_INGEST_SQL = """
SELECT event_type,
       count(*) AS n_events,
       cast(count(DISTINCT user_id) AS bigint) AS n_users,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS sum_cents
FROM events
WHERE value > 50.0
GROUP BY event_type
"""


QUERIES = {
    "catalog_select_files": (catalog_select_files, _CATALOG_SELECT_SQL),
    "catalog_dates": (catalog_dates, _CATALOG_DATES_SQL),
    "jsonl_ingest_stats": (jsonl_ingest_stats, _JSONL_INGEST_SQL),
    "orc_ingest_stats": (orc_ingest_stats, _ORC_INGEST_SQL),
    "csv_ingest_stats": (csv_ingest_stats, _CSV_INGEST_SQL),
}
