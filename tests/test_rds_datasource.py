"""`rds_logs` Python Data Source: schema, pushdown, top-K, pagination."""

from __future__ import annotations

import pytest

from rds_pgbadger_etl_spark.sources.rds_datasource import (
    FixtureRdsClient,
    RdsLogDataSource,
    make_client,
)

LINES_A = [
    "2019-04-01 09:00:01 UTC:10.0.0.1(50000):app@proddb:[9001]:LOG:  connection received",
    "2019-04-01 09:00:02 UTC:10.0.0.1(50000):app@proddb:[9001]:LOG:  duration: 1.5 ms  statement: SELECT 1",
]
LINES_B = [
    "2019-04-01 10:00:01 UTC:10.0.0.2(50001):app@proddb:[9002]:ERROR:  relation \"x\" does not exist",
]
LINES_C = [
    "2019-04-02 00:00:01 UTC:10.0.0.3(50002):app@proddb:[9003]:LOG:  checkpoint starting: time",
    "2019-04-02 00:00:02 UTC:10.0.0.3(50002):app@proddb:[9003]:LOG:  checkpoint complete",
    "2019-04-02 00:00:03 UTC:10.0.0.3(50002):app@proddb:[9003]:LOG:  disconnection",
]


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rdslogs")
    for name, lines in [
        ("postgresql.log.2019-04-01-09", LINES_A),
        ("postgresql.log.2019-04-01-10", LINES_B),
        ("postgresql.log.2019-04-02-00", LINES_C),
    ]:
        (root / name).write_text("\n".join(lines) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(RdsLogDataSource)
    return spark


def _read(spark, log_dir, **opts):
    r = (
        spark.read.format("rds_logs")
        .option("instance", "testdb")
        .option("transport", f"fixture:{log_dir}")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_all_lines(registered, log_dir):
    df = _read(registered, log_dir)
    assert [f.name for f in df.schema.fields] == ["file_name", "line_no", "value"]
    rows = df.collect()
    assert len(rows) == len(LINES_A) + len(LINES_B) + len(LINES_C)
    got = {
        (r.file_name, r.line_no): r.value for r in rows
    }
    assert got[("postgresql.log.2019-04-01-09", 1)] == LINES_A[1]
    assert got[("postgresql.log.2019-04-02-00", 2)] == LINES_C[2]


def test_contains_pushdown(registered, log_dir):
    df = _read(registered, log_dir, contains="2019-04-01")
    files = {r.file_name for r in df.select("file_name").distinct().collect()}
    assert files == {
        "postgresql.log.2019-04-01-09",
        "postgresql.log.2019-04-01-10",
    }


def test_max_files_newest_k(registered, log_dir):
    df = _read(registered, log_dir, max_files=2)
    files = {r.file_name for r in df.select("file_name").distinct().collect()}
    assert files == {
        "postgresql.log.2019-04-02-00",
        "postgresql.log.2019-04-01-10",
    }


def test_one_partition_per_file(registered, log_dir):
    df = _read(registered, log_dir)
    assert df.rdd.getNumPartitions() == 3


def test_fixture_client_pagination(log_dir):
    client = make_client(f"fixture:{log_dir}")
    assert isinstance(client, FixtureRdsClient)
    # Listing pages are LIST_PAGE wide with a Marker chain.
    first = client.describe_db_log_files("testdb")
    assert len(first["DescribeDBLogFiles"]) == FixtureRdsClient.LIST_PAGE
    assert "Marker" in first
    rest = client.describe_db_log_files("testdb", Marker=first["Marker"])
    assert "Marker" not in rest
    # Portion downloads honor NumberOfLines + AdditionalDataPending.
    p = client.download_db_log_file_portion(
        "testdb", "postgresql.log.2019-04-02-00", Marker="0", NumberOfLines=2
    )
    assert p["AdditionalDataPending"] and p["LogFileData"].count("\n") == 2
    p2 = client.download_db_log_file_portion(
        "testdb", "postgresql.log.2019-04-02-00", Marker=p["Marker"], NumberOfLines=2
    )
    assert not p2["AdditionalDataPending"]


def test_feeds_log_parser(registered, log_dir):
    """Source output plugs into the P1 tokenizer unchanged."""
    from rds_pgbadger_etl_spark.operators.logparse import tokenize

    df = _read(registered, log_dir)
    parsed = tokenize(df.withColumnRenamed("file_name", "source_file"))
    errs = parsed.filter(parsed.level == "ERROR").collect()
    assert len(errs) == 1 and errs[0].pid == 9002


def test_stream_incremental_exactly_once(registered, log_dir, tmp_path):
    """availableNow streaming: first run drains the catalog; a restart
    from the same checkpoint after a new file appears processes ONLY the
    new file (O15's memoization as checkpointed offsets)."""
    import shutil

    src = tmp_path / "logs"
    shutil.copytree(log_dir, src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            registered.readStream.format("rds_logs")
            .option("instance", "testdb")
            .option("transport", f"fixture:{src}")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return registered.read.parquet(out)

    first = run_once()
    n_first = first.count()
    assert n_first == 6  # all lines of the three fixture files
    assert {r.file_name for r in first.select("file_name").distinct().collect()} == {
        "postgresql.log.2019-04-01-09",
        "postgresql.log.2019-04-01-10",
        "postgresql.log.2019-04-02-00",
    }

    (src / "postgresql.log.2019-04-02-01").write_text("new line 1\nnew line 2\n")
    second = run_once()
    assert second.count() == n_first + 2
    new_rows = second.filter("file_name = 'postgresql.log.2019-04-02-01'")
    assert new_rows.count() == 2


def test_stream_skip_newest_holds_back_open_hour(registered, log_dir):
    from rds_pgbadger_etl_spark.sources.rds_datasource import RdsLogStreamReader

    r = RdsLogStreamReader(
        {"instance": "testdb", "transport": f"fixture:{log_dir}", "skip_newest": "true"}
    )
    rows, end = r.read(r.initialOffset())
    files = {f for f, _, _ in rows}
    # 2019-04-02-00 is the newest hour stamp -> held back as "open".
    assert files == {"postgresql.log.2019-04-01-09", "postgresql.log.2019-04-01-10"}
    assert "2019-04-02-00" not in end["done"]
