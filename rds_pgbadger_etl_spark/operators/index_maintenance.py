"""Shared maintenance surface for the persisted index artifacts.

Both on-disk artifacts — the ANN index (operators/ann_index.py) and the
dedup signature store (operators/dedup_index.py) — are sets of
partitioned parquet tables with the same operational lifecycle:
append-heavy writes land one file-set per partition per batch, deletes
are tombstones the readers anti-join, and a periodic compaction rewrites
each partition to one file-set, applies pending tombstones physically,
and clears them. This module is that lifecycle, written once:

- :func:`compact_index` — per-partition rewrite with the O13
  atomic-temp-path swap (readers see the old complete table until the
  rename, a crash mid-write leaves the live table untouched).
- :func:`index_stats` — rows/partition skew and files/partition, the
  numbers that say WHEN to compact.
- :func:`write_tombstones` / :func:`tombstones` / :func:`live` — the
  logical-delete side table and the reader filter.

Each artifact module passes its own ``tables`` mapping (table name →
partition column) and tombstone key column.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def data_files(path: str) -> list[str]:
    """Relative paths of the parquet data files under a table dir."""
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.relpath(os.path.join(root, f), path)
            for f in files
            if f.endswith(".parquet")
        )
    return out


def write_tombstones(
    spark: SparkSession, keys, index_dir: str, key_col: str
) -> None:
    """Append deleted keys to the ``tombstones/`` side table — logical
    delete: nothing in the partitioned tables is rewritten. A DataFrame
    writes distributed; a Python iterable becomes one driver-sized file."""
    if isinstance(keys, DataFrame):
        df = keys.select(F.col(key_col).cast("long"))
    else:
        df = spark.createDataFrame(
            [(int(v),) for v in keys], f"{key_col} long"
        ).coalesce(1)
    df.write.mode("append").parquet(f"{index_dir}/tombstones")


def tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The distinct tombstoned keys, or None when none exist. (Local-FS
    existence probe; an object-store deployment would swap in the
    Hadoop FileSystem API — same contract.)"""
    path = f"{index_dir}/tombstones"
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path).distinct()


def live(
    spark: SparkSession, index_dir: str, df: DataFrame, key_col: str
) -> DataFrame:
    """Filter a scan of an artifact table to non-deleted rows — broadcast
    anti-join against the (metadata-sized-between-compactions)
    tombstones; a no-op plan when no tombstones exist."""
    tomb = tombstones(spark, index_dir)
    if tomb is None:
        return df
    return df.join(F.broadcast(tomb), key_col, "left_anti")


def compact_index(
    spark: SparkSession,
    index_dir: str,
    tables: dict[str, str],
    compact_tables: tuple[str, ...] | None = None,
    tombstone_key: str | None = None,
) -> dict:
    """Rewrite each partitioned table so every partition holds one
    file-set again; apply pending tombstones physically during the
    rewrite, and clear them once every table has been rewritten
    (partial-table compactions keep them — the anti-join is idempotent).
    Returns per-table file counts before/after."""
    todo = compact_tables or tuple(tables)
    tomb = tombstones(spark, index_dir) if tombstone_key else None
    stats = {}
    for t in todo:
        pc = tables[t]
        src = f"{index_dir}/{t}"
        tmp = f"{index_dir}/_{t}.compacting"
        old = f"{index_dir}/_{t}.old"
        before = len(data_files(src))
        table_df = spark.read.parquet(src)
        if tomb is not None:
            table_df = table_df.join(
                F.broadcast(tomb), tombstone_key, "left_anti"
            )
        (
            table_df.repartition(F.col(pc))
            .write.mode("overwrite")
            .partitionBy(pc)
            .parquet(tmp)
        )
        shutil.rmtree(old, ignore_errors=True)
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
        stats[t] = {
            "files_before": before,
            "files_after": len(data_files(src)),
        }
    if tomb is not None and set(tables) <= set(todo):
        shutil.rmtree(f"{index_dir}/tombstones")
    return stats


def index_stats(
    spark: SparkSession, index_dir: str, tables: dict[str, str]
) -> DataFrame:
    """Layout audit: one row per table with rows/partition skew and
    files/partition — rising ``max_part_files`` says compact now;
    ``max_part_rows`` vs ``avg_part_rows`` grades partition balance.
    Rows-only by design: physical file layout has no SQL twin."""
    out = None
    for t, pc in tables.items():
        per_part = (
            spark.read.parquet(f"{index_dir}/{t}")
            .groupBy(F.col(pc).alias("part"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct(F.col("_metadata.file_path")).alias("files"),
            )
        )
        summary = per_part.agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("rows").alias("rows"),
            F.sum("files").cast("long").alias("files"),
            F.max("rows").alias("max_part_rows"),
            F.round(F.avg("rows"), 2).alias("avg_part_rows"),
            F.max("files").cast("long").alias("max_part_files"),
        ).select(F.lit(t).alias("table"), "*")
        out = summary if out is None else out.unionByName(summary)
    return out.orderBy("table")
