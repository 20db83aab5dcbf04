"""Data-layout maintenance for partitioned event tables: compaction and
sort-for-skipping.

Incremental runs (cli.run_incremental, streaming append sinks) leave
many small files per hour partition — the classic small-file problem: at
100 TB the listing pressure and per-file open cost dominate scans long
before CPU does. Compaction rewrites each partition to size-targeted
files; sorting rows by the filter column within each file makes parquet
row-group min/max stats selective, so point/range scans skip whole row
groups (single-column clustering — what log timelines need).

Safety: the rewrite materializes the compacted rows (localCheckpoint)
BEFORE overwriting, so the write never reads the files it is replacing.
That bounds this utility to compaction jobs that fit executor storage —
the right granularity anyway: at scale you compact a few partitions per
run (pass them as a filter), or use a transactional table format whose
commit protocol does the swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_file_stats(
    spark: SparkSession, table_dir: str, partition_cols: list[str]
) -> DataFrame:
    """Per-partition file count and byte totals from the `_metadata`
    column — the health check that decides when to compact."""
    return (
        spark.read.parquet(table_dir)
        .select(
            *partition_cols,
            F.col("_metadata.file_path").alias("_path"),
            F.col("_metadata.file_size").alias("_bytes"),
        )
        .dropDuplicates(["_path"])
        .groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("_bytes").alias("part_bytes"),
        )
    )


def compact_partitioned(
    spark: SparkSession,
    table_dir: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
    partition_filter: Column | None = None,
    cluster_cols: list[str] | None = None,
) -> str:
    """Rewrite partitions of a parquet table with size-targeted files
    and optional within-file ordering. Returns the mode that actually
    ran: ``"zorder"`` (clustered rewrite), ``"salted"`` (plain
    compaction — including the documented fallback when every
    ``cluster_cols`` domain is null, e.g. a non-numeric column cast to
    double), or ``"noop"`` (no partitions matched).

    File count per partition derives from that partition's actual bytes
    (a skewed hour gets more files, a quiet hour gets one); rows are
    salted into exactly that many buckets, so one shuffle + one dynamic
    partition overwrite rewrites everything. ``partition_filter`` limits
    the rewrite to chosen partitions (the scale path: compact recent
    hours per run, not the whole table).

    ``cluster_cols`` upgrades the rewrite to a MULTI-COLUMN Z-order
    clustering (the maintenance-path delivery of :func:`write_zorder`):
    per-run domain bounds feed :func:`zorder_key`, and instead of hash
    salting, rows range-partition on (partition values, z) — files
    within each partition become DISJOINT in z-space, so footer min/max
    pruning skips whole files for predicates on ANY participating
    column. The hourly cron compaction gets multi-dimension skipping
    with one flag, no standalone rewrite. ``sort_cols`` is superseded
    when clustering (the z-key IS the order).
    """
    df = spark.read.parquet(table_dir)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    sizes = (
        df.select(
            *partition_cols,
            F.col("_metadata.file_path").alias("_path"),
            F.col("_metadata.file_size").alias("_bytes"),
        )
        .dropDuplicates(["_path"])
        .groupBy(*partition_cols)
        .agg(F.sum("_bytes").alias("part_bytes"))
        .collect()
    )
    if not sizes:
        return "noop"
    n_map = [
        tuple(r[c] for c in partition_cols)
        + (int(max(1, -(-r.part_bytes // target_file_bytes))),)
        for r in sizes
    ]
    total_files = sum(r[-1] for r in n_map)
    if cluster_cols:
        # try_cast: a non-numeric column yields an all-null domain and
        # takes the documented salted fallback (ANSI cast would throw
        # mid-rewrite instead)
        dcols = {c: F.col(c).try_cast("double") for c in cluster_cols}
        bounds = df.select(
            *[
                f
                for c in cluster_cols
                for f in (
                    F.min(dcols[c]).alias(f"lo_{c}"),
                    F.max(dcols[c]).alias(f"hi_{c}"),
                )
            ]
        ).first()
        if not any(bounds[f"lo_{c}"] is None for c in cluster_cols):
            zkey = zorder_key(
                *[
                    scale_to_bits(
                        dcols[c], bounds[f"lo_{c}"], bounds[f"hi_{c}"]
                    )
                    for c in cluster_cols
                ]
            )
            # range partitioning on (partition values, z) makes each
            # partition's files disjoint z-ranges — file-level skipping,
            # not just row-group — while dirs stay contiguous per task.
            # A range task can straddle a partition-value boundary, so
            # the writer may emit up to one extra file per boundary
            # (<= total_files + n_partitions files overall) — the cost
            # of keeping the clustering one shuffle
            clustered = (
                df.withColumn("_z", zkey)
                .repartitionByRange(total_files, *partition_cols, "_z")
                .sortWithinPartitions(*partition_cols, "_z")
            )
            ready = clustered.drop("_z").localCheckpoint(eager=True)
            (
                ready.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_cols)
                .parquet(table_dir)
            )
            return "zorder"
        # all-null cluster domain: nothing to cluster, fall through to
        # the plain salted compaction (reported via the return value)
    map_df = F.broadcast(
        spark.createDataFrame(n_map, partition_cols + ["_n_files"])
    )
    salted = (
        df.join(map_df, partition_cols)
        .withColumn(
            "_file_idx",
            F.pmod(F.hash(F.monotonically_increasing_id()), F.col("_n_files")),
        )
        .repartition(total_files, *partition_cols, F.col("_file_idx"))
    )
    # keep each output partition-dir's rows contiguous within the task
    # (one open writer at a time), then the skip column
    order = list(partition_cols) + (sort_cols or [])
    salted = salted.sortWithinPartitions(*order)
    # detach from the source files before overwriting them
    ready = salted.drop("_n_files", "_file_idx").localCheckpoint(eager=True)
    (
        ready.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(table_dir)
    )
    return "salted"


# ---------------------------------------------------------------------------
# Multi-dimensional clustering (Z-order): single-column sorting makes
# row-group stats selective for ONE filter column; interleaving the bits
# of several columns yields an ordering where EVERY participating
# column's min/max range shrinks per row group, so scans filtering on
# any of them skip row groups. This is the layout trick behind
# Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain column so the
# existing compaction path can sort by it.

ZORDER_BITS = 16


def scale_to_bits(
    c: Column, lo: float, hi: float, bits: int = ZORDER_BITS
) -> Column:
    """Affine-scale a numeric column into [0, 2^bits) as a long (the
    domain bounds come from table stats — partition_file_stats grade
    metadata, or a prior aggregate)."""
    span = float(hi) - float(lo)
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(span or 1.0)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.least(
        (clamped * F.lit(float(1 << bits))).cast("long"),
        F.lit((1 << bits) - 1),
    )


def zorder_key(*cols: Column, bits: int = ZORDER_BITS) -> Column:
    """Bit-interleaved Z-value over pre-scaled [0, 2^bits) longs.

    Pure codegen expression (bits x n_cols shifts/ors — no UDF), so it
    rides inside the compaction shuffle for free: pass
    ``sort_cols=["_z"]`` after ``withColumn("_z", zorder_key(...))`` to
    :func:`compact_partitioned` and every participating column gets
    row-group skipping, not just the leading sort key."""
    key = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i).cast("long")
            )
    return key


# ---------------------------------------------------------------------------
# MERGE / upsert for partitioned parquet (CDC apply without a
# transactional table format): rewrite ONLY the partitions the update
# batch touches — current rows whose key is superseded are dropped
# (anti-join), update rows union in, and dynamic partition overwrite
# swaps just those partition directories. Untouched partitions are
# neither read fully nor rewritten (the semi join on partition values
# prunes the scan).


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """Upsert ``updates`` into the parquet table at ``table_dir``.

    Semantics: rows matching on ``key_cols`` are replaced, new keys
    append — MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, the
    changelog-apply step after :func:`~...plans.relational.q30_latest_by_key`
    compacts the changelog itself. The update batch must carry the
    partition columns; at scale batches touch few partitions, so the
    rewrite cost tracks the update's partition footprint, not table
    size. localCheckpoint detaches the rewrite from the files it
    replaces (same safety note as compact_partitioned).
    """
    current = spark.read.parquet(table_dir)
    touched = updates.select(*partition_cols).distinct()
    in_touched = current.join(F.broadcast(touched), partition_cols, "leftsemi")
    kept = in_touched.join(
        updates.select(*key_cols), key_cols, "left_anti"
    )
    merged = kept.unionByName(updates.select(*current.columns)).localCheckpoint(
        eager=True
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(table_dir)
    )


def write_clustered(df: DataFrame, key: Column, out_dir: str, n_files: int) -> None:
    """Range-partition rows into ``n_files`` by ``key`` and sort within
    each file — the generic clustered-write primitive. ``key`` is a raw
    column for single-dimension clustering (what ``compact_partitioned``'s
    sort_cols does inside hour partitions) or :func:`zorder_key` output
    for multi-dimension clustering. Range partitioning makes the FILES
    disjoint in key space (not just the row groups within a file), so
    footer-level min/max pruning skips whole files."""
    (
        df.withColumn("_ck", key)
        .repartitionByRange(n_files, "_ck")
        .sortWithinPartitions("_ck")
        .drop("_ck")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def write_zorder(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Z-order-clustered rewrite over ``cols``: one aggregate pass for
    the per-column domain bounds (numeric or timestamp — everything
    rides through a double cast, timestamps as epoch seconds), then the
    interleaved-bit key drives :func:`write_clustered`. After this,
    EVERY participating column's per-file min/max range is narrow, so a
    scan filtering on any subset of them skips files — the multi-
    dimension guarantee a single-column sort cannot give (its files
    span the full domain of every non-leading column)."""
    dcols = {c: F.col(c).cast("double") for c in cols}
    bounds = df.select(
        *[
            f
            for c in cols
            for f in (
                F.min(dcols[c]).alias(f"lo_{c}"),
                F.max(dcols[c]).alias(f"hi_{c}"),
            )
        ]
    ).first()
    if any(bounds[f"lo_{c}"] is None for c in cols):
        # empty input (or an all-null key column): there is nothing to
        # cluster — land the empty table rather than crashing on
        # float(None) in scale_to_bits
        df.write.mode("overwrite").parquet(out_dir)
        return
    key = zorder_key(
        *[
            scale_to_bits(
                dcols[c], bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits
            )
            for c in cols
        ],
        bits=bits,
    )
    write_clustered(df, key, out_dir, n_files)


def parquet_file_ranges(table_dir: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) footer statistics for ``cols`` — the numbers
    a stats-pruning scan consults before opening a file. One dict per
    data file: {col: (min, max)}. Local-FS footer reads (metadata-
    sized), the layout-audit twin of partition_file_stats."""
    import os

    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(table_dir):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fname)).metadata
            name_to_idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            ranges: dict = {}
            for c in cols:
                ci = name_to_idx[c]
                lo = hi = None
                for r in range(md.num_row_groups):
                    st = md.row_group(r).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo, hi = None, None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                ranges[c] = (lo, hi)
            out.append(ranges)
    return out
