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

import math
import os

from pyspark.sql import SparkSession

# Input bytes (on-disk, compressed) per shuffle partition for the
# volume-tracking rule below. Text parquet decompresses ~4x, so 32 MB
# of input is ~128 MB of in-flight rows per task — the classic
# partition-sizing target. Measured basis: the 4x pipeline rehearsal
# (3.66 GB corpus) spilled 356 MB at the fixed local default of 32
# partitions (~73 MB/task on the verify join) and went to zero spill at
# 96; this rule gives it 115 (BENCH_NOTES "pipeline rehearsal").
SHUFFLE_INPUT_BYTES_PER_PARTITION = 32 * 1024 * 1024


def auto_shuffle_partitions(input_bytes: int, cores: int | None = None) -> int:
    """Shuffle-partition count tracking input volume — the same shape as
    ann_index.auto_n_centroids (one rule, no per-run knob): one
    partition per ~SHUFFLE_INPUT_BYTES_PER_PARTITION of input, floored
    at the core count so small inputs still use the whole machine. AQE
    coalesces downward at runtime when a stage's real shuffle is
    smaller, so the number is a spill ceiling, not a latency tax."""
    cores = cores or os.cpu_count() or 8
    return int(max(cores, math.ceil(input_bytes / SHUFFLE_INPUT_BYTES_PER_PARTITION)))


def path_bytes(spark: SparkSession, *paths: str) -> int:
    """Total on-disk bytes under ``paths`` via the Hadoop FileSystem API
    — works on any Spark-reachable FS (local, HDFS, S3A), so the sizing
    rule uses the same listing a cluster deployment would."""
    total = 0
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for p in paths:
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(conf)
        total += fs.getContentSummary(hpath).getLength()
    return total


def size_shuffle_partitions(
    spark: SparkSession, *paths: str, input_bytes: int | None = None
) -> int:
    """Apply :func:`auto_shuffle_partitions` to the live session from
    the actual input volume (``paths`` are listed via the Hadoop FS;
    pass ``input_bytes`` directly when already known).
    ``spark.sql.shuffle.partitions`` is a runtime SQL conf, so entry
    points call this AFTER discovering their inputs and every
    subsequent exchange in the session is sized to the data."""
    if input_bytes is None:
        input_bytes = path_bytes(spark, *paths)
    n = auto_shuffle_partitions(
        input_bytes, cores=spark.sparkContext.defaultParallelism
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    # AQE's coalescing works from POST-shuffle read bytes and assumes
    # stages are size-preserving — for a stage that EXPANDS after the
    # exchange (shingle explode, PQ long form) the default 64 MB
    # advisory merges the volume-sized partitions right back down and
    # the expanded working set spills (measured: the 8x pipeline
    # rehearsal's verify join read 767 MB coalesced to 34 tasks and
    # spilled 10.8 GB while spark.sql.shuffle.partitions was 235).
    # Align the advisory with the same byte rule, quartered: post-
    # shuffle data is typically compacted relative to scan-side input,
    # and a 4x expansion margin keeps exploding stages in memory while
    # AQE still coalesces genuinely tiny exchanges.
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        str(SHUFFLE_INPUT_BYTES_PER_PARTITION // 4),
    )
    return n


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
        # Spark still defaults timestamp OUTPUT to the deprecated INT96
        # physical type, which carries NO min/max statistics — every
        # time-filtered scan of engine-written parquet then reads every
        # row group. MICROS restores footer/row-group pruning (and is
        # what the testdata itself uses).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
