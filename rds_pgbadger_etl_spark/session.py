"""SparkSession factory.

One place to pin the engine-wide execution settings:

- UTC session timezone (the reference is all-UTC strings,
  rds_pgbadger.py:81,120 — see SURVEY.md §7 hard part 3).
- AQE on (adaptive shuffle-partition coalescing + skew-join handling)
  so plans re-shape at runtime when the 100 TB reality diverges from
  the static estimate.
- Arrow on for the few Pandas-UDF paths.
- Shuffle partitions sized to the local core count for tests; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rds-pgbadger-etl-spark",
    cpus: str | int | None = None,
    driver_memory: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``; memory to
    ``$SPARK_GRAFT_DRIVER_MEM`` or ``8g`` (local mode: driver == executor).
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*")
    # 16g: local mode is driver == all executors, and a full bench/test
    # session holds the persisted shared intermediates (parsed logs,
    # shingle profiles) plus streaming state for 70+ queries — an 8g
    # heap spends measurable time in GC by the back half of the run.
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (events.ts) is otherwise unreadable;
        # sources/tables.py converts the long ns value to TimestampType.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
