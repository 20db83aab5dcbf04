"""Aggregate expression helpers.

``exact_sum``/``exact_avg`` make double aggregations *bit-deterministic*
across engines and across partitionings: the per-row double value is cast
to a fixed-scale decimal (deterministic rounding of one IEEE-754 value),
summed exactly in decimal (associative — no floating-point reordering
sensitivity under Spark's partial/map-side aggregation), and only the
final result is cast back to double. A plain ``sum(double)`` is
partition-order dependent, which at 100 TB means run-to-run drift; the
decimal path costs little and keeps both the driver's order-insensitive
value hash and re-runs stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits is enough for the price-like doubles in the corpus.
# 18 total digits keeps the per-value cast on the long-backed Decimal
# fast path (precision <= 18 avoids BigDecimal, ~20% cheaper); Spark
# widens the SUM accumulator to decimal(28,6) on its own, so sum
# headroom is ~1e22 — ample for 100 TB-scale totals.
_DECIMAL = "decimal(18,6)"

# One pinned materialization of segmented_cumsum's range-partitioned
# base per (app, input, keys): see the determinism note in the function.
# Bounded LRU (insertion-ordered dict): evicted entries are unpersisted,
# so distinct inputs cannot accrete MEMORY_AND_DISK persists for the
# life of the process.
_RANGED: dict = {}
_RANGED_MAX = 8


def clear_ranged_cache() -> None:
    """Unpersist and drop every pinned ranged materialization — call
    when a workload family that used :func:`segmented_cumsum` finishes
    (bench.py does, between families) or after the underlying source
    changed outside the file-list fingerprint's visibility."""
    while _RANGED:
        _, cached = _RANGED.popitem()
        try:
            cached.unpersist()
        except Exception:
            pass  # session already stopped: nothing to release


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic sum of a double column via exact decimal arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum divided by count (double div)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out


def oracle_exact_sum(expr: str) -> str:
    """DuckDB SQL twin of :func:`exact_sum` (same cast chain, same rounding)."""
    return f"cast(sum(cast(({expr}) as {_DECIMAL})) as double)"


def oracle_exact_avg(expr: str) -> str:
    """DuckDB SQL twin of :func:`exact_avg`."""
    return (
        f"cast(sum(cast(({expr}) as {_DECIMAL})) as double)"
        f" / cast(count({expr}) as double)"
    )


def segmented_cumsum(
    df,
    seg_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
):
    """Exact running sum of ``value_col`` within each segment
    (``seg_cols``) in ``order_cols`` order — WITHOUT a segment-sized
    window partition. A plain ``sum().over(partitionBy(seg).orderBy(...)
    .rowsBetween(unboundedPreceding, currentRow))`` puts a segment's
    entire stream in one sorted task; with a handful of segments (per
    source, per status) that is the cumsum flavor of the corpus-sized-
    window straggler at 100 TB.

    Distributed prefix-sum instead (the splitwise-parse offset
    technique, generalized):

    1. ``repartitionByRange(seg + order)`` — ranges are contiguous and
       partition ids ascend in key order (RangePartitioner contract),
       and correctness never depends on WHERE a boundary falls, only on
       the ordering, so sampling variance in the boundaries is harmless.
       ``order_cols`` must make the order total (unique tie-break) —
       same requirement the single-window formulation has for
       determinism.
    2. a partition-LOCAL cumsum per (segment, partition): bounded sorts,
       fully parallel;
    3. per-(segment, partition) partial sums → per-segment running
       offsets over the ~``segments x partitions`` partials (metadata-
       sized window) → broadcast back and add.

    Result is row-identical to the single-window plan (pinned by the
    token_budget_mix / pack_sequences / packing_efficiency oracles,
    whose SQL twins still use the plain window).

    Cost honesty: the single-window plan is SHUFFLE-COUNT optimal (one
    exchange) but straggler-bound; this plan pays a few extra exchanges
    of narrow rows (the range shuffle, the local window's (seg, _pid)
    clustering, the metadata-sized partials) to bound every sort and
    partition. Round-6 bench measured that at +0.14-0.28 s warm per
    registered consumer at sf0.1 (token_budget_mix 0.12->0.26,
    packing_efficiency 0.26->0.51, pack_sequences 0.19->0.47 vs the
    single-window r5 plans); the pinned `base` materialization below
    (added for determinism) claws most of that back on warm re-
    evaluations, since the range shuffle is paid once per process.
    """
    from pyspark.sql import Window

    keys = [*seg_cols, *order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Both consumers of `base` (the local cumsum and the per-(seg,_pid)
    # partials, joined back on _pid) must observe the SAME row-to-
    # partition assignment. RangePartitioner samples its boundaries, so
    # two independent evaluations of the subtree could place a boundary
    # row differently and misalign the broadcast offsets — Catalyst's
    # ReusedExchange usually dedupes the subtree, but that is an
    # optimization, not a contract. persist() pins one materialization
    # of the ranged layout (same process-lifetime staging pattern as
    # plans/_shared.shared_df; narrow rows, the same data a staging
    # table would hold at 100 TB). Keyed by the input's semantic hash so
    # bench/test loops re-invoking the same consumer reuse one cache
    # entry instead of accreting a new persist per call. semanticHash
    # alone hashes the PLAN, not the data — a parquet path receiving
    # appends keeps the same plan hash — so the key also fingerprints
    # the input file list: new or rewritten files (Spark part-file
    # names are unique per write) change the fingerprint and miss the
    # cache instead of silently returning stale rows. Bounded LRU;
    # evictions unpersist (see _RANGED_MAX / clear_ranged_cache).
    from pyspark.storagelevel import StorageLevel

    key = (
        df.sparkSession.sparkContext.applicationId,
        df.semanticHash(),
        tuple(sorted(df.inputFiles())),
        tuple(seg_cols),
        tuple(order_cols),
        value_col,
        n,
    )
    base = _RANGED.get(key)
    if base is None:
        while len(_RANGED) >= _RANGED_MAX:  # LRU eviction, oldest first
            _RANGED.pop(next(iter(_RANGED))).unpersist()
        base = (
            df.repartitionByRange(n, *[F.col(c) for c in keys])
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _RANGED[key] = base
    else:  # LRU touch: re-insert at the back
        _RANGED[key] = _RANGED.pop(key)
    local_w = (
        Window.partitionBy(*seg_cols, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partials = base.groupBy(*seg_cols, "_pid").agg(
        F.sum(value_col).alias("_psum")
    )
    off_w = (
        Window.partitionBy(*seg_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        *seg_cols,
        "_pid",
        F.coalesce(F.sum("_psum").over(off_w), F.lit(0)).alias("_off"),
    )
    return (
        base.withColumn("_local", F.sum(value_col).over(local_w))
        .join(F.broadcast(offsets), [*seg_cols, "_pid"])
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
