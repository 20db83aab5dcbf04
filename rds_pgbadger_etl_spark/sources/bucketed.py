"""Bucketed table storage: pre-shuffled layouts for co-located joins/aggs.

At 100 TB the dominant cost of the fact-fact joins (orders ⋈ lineitem on
the order key — SURVEY.md §7 phase 1) and of repeated aggregations on one
key is the shuffle. Spark's bucketing writes the table pre-partitioned by
``hash(bucket_cols) % num_buckets`` (and optionally sorted within each
bucket), recorded in the catalog; a join or groupBy on the bucket columns
between tables with compatible bucket counts then runs with NO Exchange —
the shuffle is paid once at write time and amortized over every
subsequent query. This is the Spark-native equivalent of the
"co-located/partitioned table" feature of warehouse engines.

Guidelines encoded here:
- bucket both sides of a recurring join by the join key with the SAME
  bucket count (or exact multiples, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` the join key too: the sort-merge join then skips its sort;
- size ``num_buckets`` so one bucket ≈ 100-200 MB at the target scale
  (buckets are the parallelism floor for downstream stages);
- bucket pruning applies equality filters on the bucket column to skip
  whole buckets at scan time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Bucketing metadata lives in the session catalog, so readers must use
    :func:`read_bucketed` / ``spark.table`` — a plain path read would see
    the files but not the layout. ``path`` makes it an external table.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketed output partitioning."""
    return spark.table(table)
