"""Streaming-path scale rehearsal (VERDICT r5 item 5 — the streaming
twin of the parse/dedup rehearsals).

Replays the reference's cron reality against the catalog-tailing
`rds_logs` stream (sources/rds_datasource.py): the 24-hour multi-GB
parse-rehearsal corpus arrives ONE HOUR AT A TIME in a staging
directory; after each arrival an availableNow drain (same checkpoint
throughout, so stream offsets and state-store contents carry across
drains) runs the stateful pipeline

    rds_logs → light parse (ts, level) → 30 min watermark →
    1 h tumbling window × level counts → append parquet sink

and per-drain metrics come from the StreamingQueryProgress: micro-batch
trigger latency, input rows, state-store rows/memory, sink rows. The
question the rehearsal answers: does per-micro-batch cost stay FLAT as
processed history grows (it must — state is bounded by the watermark
horizon, offsets by catalog size), or does hour 24 pay for hours 1-23?

Usage:  python tools/stream_rehearsal.py [hours] [mb_per_hour]
(corpus reused from $REHEARSAL_DIR of tools/parse_rehearsal.py when
present). Prints one JSON line per hour plus a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parse_rehearsal import generate_hour, shift_hour  # noqa: E402

PARSE_BASE = os.environ.get("REHEARSAL_DIR", "/tmp/parse_rehearsal")
BASE = os.environ.get("STREAM_REHEARSAL_DIR", "/tmp/stream_rehearsal")


def ensure_corpus(hours: int, mb: int) -> str:
    logdir = f"{PARSE_BASE}/logs_{hours}x{mb}"
    if os.path.isdir(logdir) and len(os.listdir(logdir)) == hours:
        return logdir
    shutil.rmtree(logdir, ignore_errors=True)
    os.makedirs(logdir)
    first = f"{logdir}/postgresql.log.2019-04-01-00"
    generate_hour(first, mb * 1024 * 1024)
    for h in range(1, hours):
        name = f"postgresql.log.2019-04-{1 + h // 24:02d}-{h % 24:02d}"
        shift_hour(first, f"{logdir}/{name}", h)
    return logdir


def main() -> None:
    hours = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    corpus = ensure_corpus(hours, mb)
    names = sorted(os.listdir(corpus))

    staging = f"{BASE}/staging"
    ckpt = f"{BASE}/ckpt"
    out = f"{BASE}/out"
    for d in (staging, ckpt, out):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(staging)

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.session import get_spark
    from rds_pgbadger_etl_spark.sources.rds_datasource import RdsLogDataSource

    spark = get_spark(app_name="stream-rehearsal")
    spark.dataSource.register(RdsLogDataSource)
    # state volume here is tiny (open windows x levels); single-digit
    # state partitions avoid paying 32 store commits per micro-batch
    # (see streaming/ingest.py bench note)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def drain() -> list[dict]:
        stream = (
            spark.readStream.format("rds_logs")
            .option("instance", "rehearsal")
            .option("transport", f"fixture:{staging}")
            .load()
        )
        agg = (
            stream.select(
                F.try_to_timestamp(
                    F.substring("value", 1, 19),
                    F.lit("yyyy-MM-dd HH:mm:ss"),
                ).alias("ts"),
                F.regexp_extract("value", r":([A-Z]+): ", 1).alias("level"),
            )
            .filter(F.col("ts").isNotNull())
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"), "level")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("window.start").alias("bucket"), "level", "n_events"
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in q.recentProgress
        ]

    per_hour = []
    for idx, name in enumerate(names):
        os.symlink(f"{corpus}/{name}", f"{staging}/{name}")
        t0 = time.perf_counter()
        progress = drain()
        wall = time.perf_counter() - t0
        batches = [
            p for p in progress if p.get("numInputRows", 0) > 0
            or p.get("stateOperators")
        ]
        in_rows = sum(p.get("numInputRows", 0) for p in progress)
        trig_ms = sum(
            p.get("durationMs", {}).get("triggerExecution", 0)
            for p in progress
        )
        commit_ms = sum(
            so.get("commitTimeMs", 0)
            for p in progress
            for so in p.get("stateOperators", [])
        )
        state = [
            {
                "rows": so.get("numRowsTotal"),
                "mem_kb": round(so.get("memoryUsedBytes", 0) / 1024, 1),
            }
            for p in progress[-1:]
            for so in p.get("stateOperators", [])
        ]
        rec = {
            "hour": idx,
            "file": name[-13:],
            "wall_sec": round(wall, 1),
            "micro_batches": len(batches),
            "input_rows": in_rows,
            "trigger_ms": trig_ms,
            "state_commit_ms": commit_ms,
            "state": state,
        }
        per_hour.append(rec)
        print(json.dumps(rec), flush=True)

    sink = spark.read.parquet(out)
    n_sink = sink.count()
    n_buckets = sink.select("bucket").distinct().count()
    spark.stop()

    first3 = [r["wall_sec"] for r in per_hour[:3]]
    last3 = [r["wall_sec"] for r in per_hour[-3:]]
    print(
        json.dumps(
            {
                "hours": hours,
                "mb_per_hour": mb,
                "sink_rows": n_sink,
                "closed_buckets": n_buckets,
                "total_input_rows": sum(r["input_rows"] for r in per_hour),
                "wall_first3_sec": first3,
                "wall_last3_sec": last3,
                "max_state_rows": max(
                    (s["rows"] or 0)
                    for r in per_hour
                    for s in r["state"] or [{"rows": 0, "mem_kb": 0}]
                ),
                "max_state_mem_kb": max(
                    (s["mem_kb"] or 0)
                    for r in per_hour
                    for s in r["state"] or [{"rows": 0, "mem_kb": 0}]
                ),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
