"""Staging-utility tests with a fake RDS client (no network)."""

from __future__ import annotations

import os

import pytest

from rds_pgbadger_etl_spark.sources import rds_ingest as RI


class FakeClient:
    """Duck-typed RDS client: 2 pages of listings, 2-chunk downloads,
    one transient failure to exercise the retry path."""

    def __init__(self, fail_first: bool = False):
        self.fail_first = fail_first
        self.calls = 0

    def describe_db_log_files(self, **kwargs):
        assert kwargs["DBInstanceIdentifier"] == "db1"
        if kwargs.get("Marker") == "p2":
            return {
                "DescribeDBLogFiles": [
                    {"LogFileName": "error/postgresql.log.2019-04-01-11", "Size": 3}
                ]
            }
        files = [
            {"LogFileName": "error/postgresql.log.2019-04-01-10", "Size": 1},
            {"LogFileName": "error/postgresql.log.2019-04-01-09", "Size": 2},
        ]
        if kwargs.get("FilenameContains"):
            files = [
                f for f in files if kwargs["FilenameContains"] in f["LogFileName"]
            ]
            return {"DescribeDBLogFiles": files}
        return {"DescribeDBLogFiles": files, "Marker": "p2"}

    def download_db_log_file_portion(self, **kwargs):
        self.calls += 1
        if self.fail_first and self.calls == 1:
            raise ConnectionError("transient")
        if kwargs["Marker"] == "0":
            return {
                "LogFileData": "line1\n",
                "AdditionalDataPending": True,
                "Marker": "m1",
            }
        return {"LogFileData": "line2\n", "AdditionalDataPending": False}


def test_region_from_arn():
    assert RI.region_from_arn("arn:aws:rds:eu-west-1:123:db:mydb") == "eu-west-1"
    with pytest.raises(ValueError):
        RI.region_from_arn("garbage")


def test_list_paginates_and_pushes_down():
    c = FakeClient()
    names = [f["LogFileName"] for f in RI.list_log_files(c, "db1")]
    assert len(names) == 3  # both pages
    filtered = RI.list_log_files(c, "db1", filename_contains="2019-04-01-10")
    assert len(filtered) == 1


def test_download_joins_chunks_and_retries():
    c = FakeClient(fail_first=True)
    text = RI.download_log_file(c, "db1", "x", retries=2, backoff_s=0)
    assert text == "line1\nline2\n"


def test_staging_layout_and_idempotency(tmp_path):
    c = FakeClient()
    dest = str(tmp_path)
    names = ["error/postgresql.log.2019-04-01-10", "error/nodate.log"]
    written = RI.stage_logs(c, "db1", names, dest)
    assert len(written) == 2
    assert written[0].endswith(
        "log_date=2019-04-01/log_hour=10/postgresql.log.2019-04-01-10"
    )
    assert "log_date=unknown" in written[1]
    assert open(written[0]).read() == "line1\nline2\n"
    # second run: targets exist → nothing re-downloaded (O15)
    again = RI.stage_logs(c, "db1", names, dest)
    assert again == []
    assert not any(p.endswith(".inprogress") for p in os.listdir(dest))
