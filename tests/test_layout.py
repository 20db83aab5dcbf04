"""Compaction / layout-maintenance tests."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.sinks.layout import (
    compact_partitioned,
    partition_file_stats,
)
from rds_pgbadger_etl_spark.sources.tables import load_table


def _parquet_files(table_dir: str) -> list[str]:
    return [
        p
        for p in glob.glob(f"{table_dir}/**/*.parquet", recursive=True)
        if "_temporary" not in p
    ]


def _write_fragmented(spark, sf_dir, out: str, n_chunks: int = 8) -> int:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "log_date", F.to_date("ts")
    )
    for i in range(n_chunks):  # n_chunks small appends -> many tiny files
        (
            ev.filter(F.col("event_id") % n_chunks == i)
            .write.mode("append")
            .partitionBy("log_date")
            .parquet(out)
        )
    return ev.count()


def test_compact_reduces_files_and_preserves_rows(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "events_table")
    n_rows = _write_fragmented(spark, sf_smoke, out)
    before = len(_parquet_files(out))

    compact_partitioned(
        spark, out, ["log_date"], sort_cols=["ts"], target_file_bytes=1 << 30
    )
    after_files = _parquet_files(out)
    compacted = spark.read.parquet(out)

    n_parts = compacted.select("log_date").distinct().count()
    assert len(after_files) == n_parts < before
    assert compacted.count() == n_rows
    # within-file ordering: each file's rows are ts-sorted
    one = spark.read.parquet(after_files[0]).select("ts").collect()
    ts = [r.ts for r in one]
    assert ts == sorted(ts)


def test_partition_filter_limits_rewrite(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "events_partial")
    _write_fragmented(spark, sf_smoke, out, n_chunks=4)
    stats = {
        str(r.log_date): r.n_files
        for r in partition_file_stats(spark, out, ["log_date"]).collect()
    }
    target = sorted(stats)[0]
    compact_partitioned(
        spark,
        out,
        ["log_date"],
        target_file_bytes=1 << 30,
        partition_filter=F.col("log_date") == target,
    )
    after = {
        str(r.log_date): r.n_files
        for r in partition_file_stats(spark, out, ["log_date"]).collect()
    }
    assert after[target] == 1
    untouched = {d: n for d, n in stats.items() if d != target}
    assert {d: n for d, n in after.items() if d != target} == untouched


def test_zorder_clusters_both_dimensions(spark):
    from rds_pgbadger_etl_spark.sinks.layout import scale_to_bits, zorder_key
    from pyspark.sql import functions as F

    # 64x64 grid; sort by z-key, cut into 16 contiguous chunks: BOTH
    # x and y spans per chunk must shrink far below the domain (linear
    # sort shrinks only its leading column — the trailing one spans the
    # whole domain in every chunk)
    n = 64
    grid = spark.range(n * n).selectExpr(
        "id % 64 AS x", "id DIV 64 AS y"
    )
    keyed = grid.withColumn(
        "z",
        zorder_key(
            scale_to_bits(F.col("x"), 0, 63, 6),
            scale_to_bits(F.col("y"), 0, 63, 6),
            bits=6,
        ),
    )
    rows = keyed.orderBy("z").collect()
    chunk = len(rows) // 16
    spans_x, spans_y = [], []
    for i in range(16):
        part = rows[i * chunk : (i + 1) * chunk]
        spans_x.append(max(r.x for r in part) - min(r.x for r in part))
        spans_y.append(max(r.y for r in part) - min(r.y for r in part))
    # z-order: each 256-row chunk covers a ~16x16 tile, spans ~<=31;
    # a linear sort on x would leave every y span at 63
    assert max(spans_x) <= 32 and max(spans_y) <= 32
    # determinism: the key is a pure expression
    again = keyed.orderBy("z").collect()
    assert [r.z for r in again] == [r.z for r in rows]


def test_compact_with_cluster_cols_delivers_file_skipping(
    spark, sf_smoke, tmp_path
):
    """The maintenance-path Z-order: compact_partitioned(cluster_cols=
    [user_id, ts]) must leave each hour partition's files DISJOINT in
    z-space — a narrow user-band predicate skips most files by footer
    stats — while the plain ts-sorted compaction of the same table
    leaves every file spanning the full user domain (reads all). Row
    content is preserved bit for bit."""
    from rds_pgbadger_etl_spark.sinks.layout import parquet_file_ranges

    def rows_of(d):
        return sorted(map(str, spark.read.parquet(d).collect()))

    outs = {}
    for variant in ("zorder", "ts_sorted"):
        out = str(tmp_path / variant)
        _write_fragmented(spark, sf_smoke, out, n_chunks=4)
        outs[variant] = out
    want = rows_of(outs["zorder"])
    # small target bytes force several files per partition — the
    # regime where FILE-level (not just row-group) skipping shows
    assert (
        compact_partitioned(
            spark,
            outs["zorder"],
            ["log_date"],
            target_file_bytes=64 * 1024,
            cluster_cols=["user_id", "ts"],
        )
        == "zorder"
    )
    assert (
        compact_partitioned(
            spark,
            outs["ts_sorted"],
            ["log_date"],
            target_file_bytes=64 * 1024,
            sort_cols=["ts"],
        )
        == "salted"
    )
    # a cluster request whose domain is all-null (string column cast to
    # double) must REPORT the fallback, not silently claim clustering
    assert (
        compact_partitioned(
            spark,
            outs["ts_sorted"],
            ["log_date"],
            target_file_bytes=64 * 1024,
            cluster_cols=["event_type"],
        )
        == "salted"
    )
    assert (
        compact_partitioned(
            spark,
            outs["ts_sorted"],
            ["log_date"],
            partition_filter=F.col("log_date") == "1900-01-01",
            cluster_cols=["user_id"],
        )
        == "noop"
    )
    assert rows_of(outs["zorder"]) == want
    assert rows_of(outs["ts_sorted"]) == want

    users = spark.read.parquet(outs["zorder"]).agg(
        F.min("user_id"), F.max("user_id")
    ).first()
    u_lo = users[0]
    u_hi = u_lo + max(1, (users[1] - users[0]) // 10)  # ~10% band

    def files_read(d):
        ranges = parquet_file_ranges(d, ["user_id"])
        n = sum(
            1
            for r in ranges
            if r["user_id"][0] is None
            or not (r["user_id"][1] < u_lo or r["user_id"][0] > u_hi)
        )
        return n, len(ranges)

    z_read, z_total = files_read(outs["zorder"])
    t_read, t_total = files_read(outs["ts_sorted"])
    assert z_total > 4 and t_total > 4  # several files per partition
    assert t_read == t_total  # ts sort can't skip on user_id
    assert z_read < z_total  # z-order skips whole files

    # and the SECOND dimension still skips: a 2-D (user, ts) box reads
    # no more files than the user band alone, and strictly fewer than
    # the whole table — both participating columns' footer ranges are
    # narrow per file
    ts_bounds = spark.read.parquet(outs["zorder"]).agg(
        F.min("ts"), F.max("ts")
    ).first()
    box_ranges = parquet_file_ranges(outs["zorder"], ["user_id", "ts"])
    # footer ts stats may be tz-aware while collect() is naive — match
    # the comparison tz to the stats (same convention as the audit)
    stat_tz = next(
        (r["ts"][0].tzinfo for r in box_ranges if r["ts"][0] is not None),
        None,
    )
    t_span = ts_bounds[1] - ts_bounds[0]
    t_mid_lo = (ts_bounds[0] + t_span / 3).replace(tzinfo=stat_tz)
    t_mid_hi = (ts_bounds[0] + t_span / 2).replace(tzinfo=stat_tz)
    box_read = sum(
        1
        for r in box_ranges
        if (
            r["user_id"][0] is None
            or not (r["user_id"][1] < u_lo or r["user_id"][0] > u_hi)
        )
        and (
            r["ts"][0] is None
            or not (r["ts"][1] < t_mid_lo or r["ts"][0] > t_mid_hi)
        )
    )
    assert box_read <= z_read < z_total


def test_merge_upsert_replaces_and_inserts_only_touched_partitions(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.sinks.layout import merge_upsert

    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id long, part string, v double",
    )
    base.write.partitionBy("part").parquet(table)
    untouched_files = set(os.listdir(os.path.join(table, "part=c")))

    # update id=2 (partition a), insert id=5 (partition b); c untouched
    updates = spark.createDataFrame(
        [(2, "a", 99.0), (5, "b", 50.0)], "id long, part string, v double"
    )
    merge_upsert(spark, table, updates, ["id"], ["part"])

    got = {
        (r.id, r.part): r.v
        for r in spark.read.parquet(table).collect()
    }
    assert got == {
        (1, "a"): 10.0,
        (2, "a"): 99.0,  # replaced
        (3, "b"): 30.0,
        (5, "b"): 50.0,  # inserted
        (4, "c"): 40.0,  # untouched
    }
    # dynamic overwrite must not have rewritten partition c
    assert set(os.listdir(os.path.join(table, "part=c"))) == untouched_files

    # idempotence: re-applying the same batch is a no-op
    merge_upsert(spark, table, updates, ["id"], ["part"])
    again = {
        (r.id, r.part): r.v for r in spark.read.parquet(table).collect()
    }
    assert again == got


def test_zorder_rewrite_preserves_results_and_skips_files(spark, sf_smoke):
    """The staged z-ordered rewrite of events (plans/layout_oracle):
    (a) the registered 2-D range aggregate over it hash-matches the
    DuckDB oracle over the RAW table — the rewrite moved rows between
    files, never changed them; (b) the footer audit shows the z-ordered
    layout skips files for a user_id-only predicate while the ts-sorted
    layout must read every file (its files all span the full user
    domain) — the multi-dimension pruning claim, measured."""
    from rds_pgbadger_etl_spark.plans.layout_oracle import (
        _ZORDER_RANGE_SQL,
        zorder_layout_audit,
        zorder_range_query,
    )
    from tests.oracle import compare

    compare(zorder_range_query(spark, sf_smoke), _ZORDER_RANGE_SQL, sf_smoke)

    audit = {
        (r.layout, r.predicate): r
        for r in zorder_layout_audit(spark, sf_smoke).collect()
    }
    ts_user = audit[("ts_sorted", "user_only")]
    z_user = audit[("zorder", "user_only")]
    assert ts_user.files_read == ts_user.n_files  # time sort can't skip
    assert z_user.files_read < z_user.n_files
    assert z_user.files_read < ts_user.files_read
    # the 2-D box prunes at least as well as the single-axis predicate
    assert (
        audit[("zorder", "box")].files_read <= z_user.files_read
    )
