"""Schema-drift guard tests for events.ts (VERDICT r2 items 1-2).

The driver's testdata has shipped events.ts as BOTH parquet
TIMESTAMP(NANOS) (round 1) and TIMESTAMP(MICROS) (round 2); assuming one
unit compresses or stretches every timestamp 1000x. These tests pin the
footer-sniff branch in sources/tables.py for each variant and prove the
era guard turns a silent unit mix-up into a loud failure.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rds_pgbadger_etl_spark.sources import tables
from rds_pgbadger_etl_spark.sources.tables import (
    events_ts_is_native_timestamp,
    load_table,
)

_EPOCH = dt.datetime(2024, 1, 15, 12, 0, 0)
_NS = int(_EPOCH.timestamp()) * 1_000_000_000


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(ts_array)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, path)


def _sf_dir(tmp_path, ts_array) -> str:
    _write_events(str(tmp_path / "events.parquet"), ts_array)
    return str(tmp_path)


def test_native_us_timestamp_read_directly(spark, tmp_path):
    ts = pa.array([_EPOCH, _EPOCH + dt.timedelta(hours=1)], pa.timestamp("us"))
    sf = _sf_dir(tmp_path, ts)
    assert events_ts_is_native_timestamp(spark, f"{sf}/events.parquet")
    rows = load_table(spark, sf, "events").select("ts").orderBy("ts").collect()
    assert rows[0]["ts"] == _EPOCH
    assert rows[1]["ts"] == _EPOCH + dt.timedelta(hours=1)


def test_int64_nanos_converted(spark, tmp_path):
    ts = pa.array([_NS, _NS + 3_600_000_000_000], pa.timestamp("ns"))
    sf = _sf_dir(tmp_path, ts)
    assert not events_ts_is_native_timestamp(spark, f"{sf}/events.parquet")
    rows = load_table(spark, sf, "events").select("ts").orderBy("ts").collect()
    assert rows[0]["ts"] == _EPOCH
    assert rows[1]["ts"] == _EPOCH + dt.timedelta(hours=1)


def test_era_guard_catches_unit_flip(spark, tmp_path):
    # Microsecond-scale values typed as ns: a 1000x compression into 1970,
    # exactly the bug class that shipped in round 2. Must fail loudly.
    us_as_ns = pa.array([_NS // 1000, _NS // 1000 + 1], pa.timestamp("ns"))
    sf = _sf_dir(tmp_path, us_as_ns)
    with pytest.raises(ValueError, match="era guard"):
        load_table(spark, sf, "events")


def test_testdata_era_is_sane(spark, sf_oracle):
    # The real driver testdata must pass the guard and land in 2024-01.
    ev = load_table(spark, sf_oracle, "events")
    first = ev.selectExpr("min(ts) AS lo").first()["lo"]
    assert dt.datetime(2024, 1, 1) <= first < dt.datetime(2024, 2, 1)


def test_streaming_schema_matches_batch(spark, sf_oracle):
    from rds_pgbadger_etl_spark.streaming.ingest import read_event_stream

    stream = read_event_stream(spark, sf_oracle)
    batch = load_table(spark, sf_oracle, "events")
    assert stream.schema == batch.schema


def test_sniff_is_cached(spark, sf_oracle):
    path = f"{sf_oracle}/events.parquet"
    events_ts_is_native_timestamp(spark, path)
    assert path in tables._EVENTS_TS_NATIVE


def test_era_guard_warn_override(spark, tmp_path, monkeypatch):
    # A legitimately different corpus era can be read by downgrading the
    # guard to a loud warning (SPARK_GRAFT_ERA_GUARD=warn).
    import warnings

    from rds_pgbadger_etl_spark.sources import tables

    us_as_ns = pa.array([_NS // 1000, _NS // 1000 + 1], pa.timestamp("ns"))
    sf = _sf_dir(tmp_path, us_as_ns)
    monkeypatch.setenv("SPARK_GRAFT_ERA_GUARD", "warn")
    monkeypatch.setattr(tables, "_ERA_OK", set())
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = load_table(spark, sf, "events").count()
    assert rows == 2
    assert any("era guard" in str(w.message) for w in caught)
