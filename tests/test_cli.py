"""End-to-end pipeline test: staged hour files → select → parse → sinks.

Covers the reference's whole MainTask flow (rds_pgbadger.py:83-129):
newest-K closed-hour selection (the open reference hour must be
skipped), per-file parsing, report sections, partitioned event sink,
and the single-HTML artifact.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from tests.test_logparse import FIXTURES

from rds_pgbadger_etl_spark.cli import _parse_reference, run_pipeline


def _stage(tmp_path, hours: list[str]) -> str:
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    src = os.path.join(FIXTURES, "basic.log")
    for h in hours:
        shutil.copy(src, log_dir / f"postgresql.log.{h}")
    (log_dir / "README.txt").write_text("not a log file name")
    return str(log_dir)


def test_run_pipeline_end_to_end(spark, tmp_path):
    log_dir = _stage(
        tmp_path,
        ["2024-01-15-09", "2024-01-15-10", "2024-01-15-11", "2024-01-15-12"],
    )
    out_dir = str(tmp_path / "out")
    html = str(tmp_path / "report.html")
    stats = run_pipeline(
        spark,
        log_dir,
        out_dir,
        reference_dt=datetime(2024, 1, 15, 12, 0),
        max_records=2,
        html_path=html,
    )
    # hour 12 is the open reference hour -> excluded; newest 2 = 11, 10
    assert stats["files"] == 2
    assert stats["events"] > 0

    events = spark.read.parquet(f"{out_dir}/events")
    # the write-side Observation counters must equal the stored truth
    # (they were accumulated on the write action itself, no extra scan)
    assert stats["events"] == events.count()
    assert stats["malformed"] == events.filter("level = 'MALFORMED'").count()
    assert stats["null_ts"] == events.filter("event_ts IS NULL").count()
    # partition values come back through read-side type inference (int here)
    hours = {str(r.log_hour) for r in events.select("log_hour").distinct().collect()}
    assert hours == {"10", "11"}

    top = spark.read.parquet(f"{out_dir}/report/top_queries")
    assert top.count() > 0
    with open(html) as f:
        body = f.read()
    assert "top_queries" in body and "<table" in body


def test_parse_reference_formats():
    assert _parse_reference("2024-01-15-12") == datetime(2024, 1, 15, 12, 0)
    assert _parse_reference("2024-01-15T01:02:03") == datetime(2024, 1, 15, 1, 2, 3)
    assert _parse_reference(None).year >= 2024


def test_run_incremental_manifest_semantics(spark, tmp_path):
    from rds_pgbadger_etl_spark.cli import run_incremental

    log_dir = _stage(tmp_path, ["2024-01-15-09", "2024-01-15-10"])
    out_dir = str(tmp_path / "out_inc")
    ref = datetime(2024, 1, 15, 10, 0)

    # run 1: hour 09 is closed, hour 10 is the open reference hour
    s1 = run_incremental(spark, log_dir, out_dir, ref)
    assert (s1["files"], s1["skipped"]) == (1, 0)
    assert s1["events"] > 0 and s1["malformed"] == 0
    # run 2: nothing new (no write happened -> no quality counters)
    s2 = run_incremental(spark, log_dir, out_dir, ref)
    assert s2 == {"files": 0, "skipped": 1}
    # hour 10 closes (reference advances): exactly it gets processed
    s3 = run_incremental(spark, log_dir, out_dir, datetime(2024, 1, 15, 11, 0))
    assert (s3["files"], s3["skipped"]) == (1, 1)

    events = spark.read.parquet(f"{out_dir}/events")
    hours = {str(r.log_hour) for r in events.select("log_hour").distinct().collect()}
    assert hours == {"9", "10"}

    # per-hour report artifacts (the reference's one-report-per-file
    # semantics): each processed hour got its own report partition
    for d, h in (("2024-01-15", 9), ("2024-01-15", 10)):
        top = spark.read.parquet(
            f"{out_dir}/report/log_date={d}/log_hour={h}/top_queries"
        )
        assert top.count() > 0


def test_cli_query_registry_access(capsys, spark):
    from rds_pgbadger_etl_spark import cli

    cli.main(["--list-queries"])
    names = capsys.readouterr().out.split()
    assert "q01_pricing_summary" in names and len(names) >= 100

    cli.main(
        [
            "--query", "q03_distinct",
            "--sf-dir", "/root/testdata/sf0.001",
            "--limit", "5", "--cpus", "8",
        ]
    )
    import json

    rows = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert 1 <= len(rows) <= 5
    assert set(rows[0]) == {"c_mktsegment", "c_nationkey"}


def test_cli_compact_cluster_verb(capsys, spark, tmp_path):
    """The maintenance verb end-to-end: `--compact DIR --cluster
    user_id,ts` on a fragmented events table reduces the file count,
    preserves every row, and prints the before/after summary — the
    cron job's Z-order delivery path."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark import cli
    from rds_pgbadger_etl_spark.sources.tables import load_table

    out = str(tmp_path / "events_table")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "log_date", F.to_date("ts")
    )
    for i in range(4):
        (
            ev.filter(F.col("event_id") % 4 == i)
            .write.mode("append")
            .partitionBy("log_date")
            .parquet(out)
        )
    want = sorted(map(str, spark.read.parquet(out).collect()))
    cli.main(
        [
            "--compact", out,
            "--compact-partition-cols", "log_date",
            "--cluster", "user_id,ts",
            "--cpus", "8",
        ]
    )
    msg = capsys.readouterr().out
    assert "z-ordered on user_id,ts" in msg
    # a cluster request that can't apply (string column: all-null
    # double domain) must WARN and report plain compaction, not claim
    # z-ordering it didn't do
    cli.main(
        [
            "--compact", out,
            "--compact-partition-cols", "log_date",
            "--cluster", "event_type",
            "--cpus", "8",
        ]
    )
    msg = capsys.readouterr().out
    assert "WARNING" in msg and "did not apply" in msg
    assert "z-ordered" not in msg
    assert sorted(map(str, spark.read.parquet(out).collect())) == want
    n_parts = spark.read.parquet(out).select("log_date").distinct().count()
    import glob

    files = [
        p
        for p in glob.glob(f"{out}/**/*.parquet", recursive=True)
        if "_temporary" not in p
    ]
    # size-targeted: ~one range per partition, plus at most one
    # boundary-straddling extra per partition (the documented cost of
    # the single-shuffle range clustering); 4x-fragmented input repaired
    assert n_parts <= len(files) <= 2 * n_parts


def test_env_strategy_validation(monkeypatch):
    """A typo'd SPARK_GRAFT_PARSE_STRATEGY must error, not silently fall
    back to the windowed plan (argparse never validates defaults)."""
    import pytest

    from rds_pgbadger_etl_spark import cli

    monkeypatch.setenv("SPARK_GRAFT_PARSE_STRATEGY", "splitwize")
    with pytest.raises(SystemExit):
        cli.build_parser()
    monkeypatch.setenv("SPARK_GRAFT_PARSE_STRATEGY", "splitwise")
    assert cli.build_parser().parse_args([]).strategy == "splitwise"
    monkeypatch.delenv("SPARK_GRAFT_PARSE_STRATEGY")
    assert cli.build_parser().parse_args([]).strategy == "auto"


def test_auto_strategy_selection(spark, tmp_path):
    """'auto' picks windowed for hour-files within a couple of scan
    splits and splitwise once any file exceeds 2x maxPartitionBytes
    (the 5 GB busy-hour straggler case)."""
    from rds_pgbadger_etl_spark.operators.logparse import (
        choose_parse_strategy,
    )

    small = tmp_path / "small.log"
    small.write_text("x" * 100)
    big = tmp_path / "big.log"
    big.write_text("x" * 5000)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        assert choose_parse_strategy(spark, [str(small)]) == "windowed"
        assert (
            choose_parse_strategy(spark, [str(small), str(big)])
            == "splitwise"
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    # default config (128m): real hour-fixtures stay windowed
    assert choose_parse_strategy(spark, [str(big)]) == "windowed"


def test_run_pipeline_report_scope(spark, tmp_path):
    """With dynamic partition overwrite, hours written by EARLIER runs
    into the same out_dir survive in events/ — but the report must cover
    only the files processed THIS run (the reference's per-run report
    semantics, rds_pgbadger.py:44-45)."""
    log_dir = _stage(tmp_path, ["2024-01-15-09", "2024-01-15-10"])
    out_dir = str(tmp_path / "out_scope")
    # run 1: both closed hours; run 2: only the newest (hour 10)
    run_pipeline(spark, log_dir, out_dir, datetime(2024, 1, 15, 12, 0),
                 max_records=5)
    stats2 = run_pipeline(spark, log_dir, out_dir,
                          datetime(2024, 1, 15, 12, 0), max_records=1)
    assert stats2["files"] == 1

    events = spark.read.parquet(f"{out_dir}/events")
    hours = {int(r.log_hour) for r in
             events.select("log_hour").distinct().collect()}
    assert hours == {9, 10}  # earlier run's partition survived ...
    hist = spark.read.parquet(f"{out_dir}/report/time_histogram")
    total = sum(r.n_events for r in hist.collect())
    one_hour = events.filter("log_hour = 10").filter(
        "event_ts IS NOT NULL").count()
    assert total == one_hour  # ... but the report covers run 2 only


def test_run_pipeline_splitwise_strategy(spark, tmp_path):
    """--strategy splitwise must produce the same event table as the
    default windowed plan through the full pipeline."""
    log_dir = _stage(tmp_path, ["2024-01-15-09", "2024-01-15-10"])
    out_w = str(tmp_path / "out_w")
    out_s = str(tmp_path / "out_s")
    ref = datetime(2024, 1, 15, 12, 0)
    run_pipeline(spark, log_dir, out_w, ref, max_records=2)
    run_pipeline(spark, log_dir, out_s, ref, max_records=2,
                 strategy="splitwise")
    w = spark.read.parquet(f"{out_w}/events")
    s = spark.read.parquet(f"{out_s}/events")
    cols = sorted(w.columns)
    w_rows = sorted(map(str, w.select(cols).collect()))
    s_rows = sorted(map(str, s.select(cols).collect()))
    assert w_rows == s_rows and len(w_rows) > 0


def test_parse_hour_anchored_and_loud():
    """_parse_hour reads the trailing YYYY-MM-DD-HH via an anchored
    regex and fails loudly on non-conforming names (a .gz suffix would
    otherwise silently build a wrong partition predicate and drop the
    hour from the run's report — ADVICE r6)."""
    import pytest

    from rds_pgbadger_etl_spark.cli import _parse_hour

    assert _parse_hour("postgresql.log.2024-01-02-07") == ("2024-01-02", 7)
    with pytest.raises(ValueError, match="YYYY-MM-DD-HH"):
        _parse_hour("postgresql.log.2024-01-02-07.gz")
    with pytest.raises(ValueError, match="YYYY-MM-DD-HH"):
        _parse_hour("README.txt")


def test_cli_maintain_index_verb(capsys, spark, tmp_path):
    """`--maintain-index DIR` end-to-end: one invocation compacts every
    artifact table, applies pending tombstones physically, and acts on
    the SQ8 drift audit — a deliberately drifted store auto-heals
    (grid retrained, prefix arm re-derived, counters reset) and the
    summary prints what happened. The mutable artifacts are now
    serviceable from the cron container without writing Python."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark import cli
    from rds_pgbadger_etl_spark.operators import ann_index as AI
    from rds_pgbadger_etl_spark.operators import index_maintenance as M
    from rds_pgbadger_etl_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    half = n // 2
    d = str(tmp_path / "ann_store")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_sq8_to_ann_index(spark, d)
    AI.add_sq8_prefix_to_ann_index(spark, d)
    drifted = emb.filter(F.col("vec_id") >= half).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x * F.lit(3.0)).cast("float")
        ).alias("embedding"),
    )
    AI.append_to_ann_index(spark, drifted, d)
    victims = [int(r.vec_id) for r in emb.limit(3).collect()]
    AI.delete_from_ann_index(spark, victims, d)
    assert AI._sq8_drift_numbers(spark, d)[0] > AI.SQ8_RETRAIN_OOB_FRAC

    cli.main(["--maintain-index", d, "--cpus", "8"])
    msg = capsys.readouterr().out
    assert "sq8 grid retrained" in msg
    assert "raw:" in msg and "files" in msg
    # healed: counters reset, tombstones applied physically
    frac, n_rows, past = AI._sq8_drift_numbers(spark, d)
    assert frac == 0.0 and n_rows == n - len(victims)
    assert M.tombstones(spark, d) is None
    # prefix arm re-derived against the retrained grid
    assert (
        spark.read.parquet(M.table_path(d, "sq8_prefix")).count()
        == n_rows
    )
    # a second invocation is a clean no-retrain pass
    cli.main(["--maintain-index", d, "--cpus", "8"])
    msg = capsys.readouterr().out
    assert "retrained" not in msg
    # the observability verb prints the audit as JSON lines, drift
    # included (healed store: frac 0), kind auto-detected
    import json

    cli.main(["--index-stats", d, "--cpus", "8"])
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    by_table = {r["table"]: r for r in rows}
    assert {"raw", "sq8", "sq8_prefix", "vectors"} <= set(by_table)
    assert by_table["sq8"]["sq8_oob_code_frac"] == 0.0


def test_cli_maintain_dedup_verb(capsys, spark, tmp_path):
    """`--maintain-dedup DIR`: the signature store's compaction +
    tombstone GC from the shell — lookups preserved, file counts
    repaired, pending tombstones cleared."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark import cli
    from rds_pgbadger_etl_spark.operators import dedup_index as DI
    from rds_pgbadger_etl_spark.operators import index_maintenance as M
    from rds_pgbadger_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    d = str(tmp_path / "dedup_store")
    DI.build_dedup_index(spark, docs.filter(F.col("doc_id") % 2 == 0), d)
    DI.append_to_dedup_index(spark, docs.filter(F.col("doc_id") % 2 == 1), d)
    victims = [int(r.doc_id) for r in docs.limit(2).collect()]
    DI.delete_from_dedup_index(spark, victims, d)

    probe = docs.limit(20)
    before = sorted(
        map(str, DI.dedup_index_lookup(spark, probe, d).collect())
    )
    cli.main(["--maintain-dedup", d, "--cpus", "8"])
    msg = capsys.readouterr().out
    assert "bands:" in msg and "profiles:" in msg
    assert M.tombstones(spark, d) is None
    after = sorted(
        map(str, DI.dedup_index_lookup(spark, probe, d).collect())
    )
    assert after == before
    # kind auto-detection serves the dedup layout audit too
    import json

    cli.main(["--index-stats", d, "--cpus", "8"])
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert {r["table"] for r in rows} == {"bands", "profiles"}
