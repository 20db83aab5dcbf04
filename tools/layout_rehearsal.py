"""Z-order layout scale rehearsal — does the clustered rewrite actually
cut scan cost at GB scale, not just in footer arithmetic?

Generates a deterministic synthetic events-like table (n rows of
(event_id, ts over 30 days, user_id over n/100 users, value, a ~200 B
payload pad so files have real weight)), writes it three ways with the
same file count — unsorted (ingestion order), range-sorted by ts (the
strongest single-column layout), z-ordered over (user_id, ts) — and
measures for each:

- files a footer-pruning scan must read for (a) a user-band predicate
  and (b) a 2-D user x time box (sinks/layout.parquet_file_ranges — the
  same audit the registered zorder_layout_audit query runs at sf0.1),
- the actual warm wall time of the filtered aggregate on each layout
  (parquet predicate pushdown on; Spark prunes row groups through the
  same min/max stats the audit counts).

Expect: ts-sorted reads every file for the user predicate (each file
spans the full user domain); z-order reads a fraction for BOTH
predicates and its scan time tracks the file counts.

Usage: python tools/layout_rehearsal.py [n_rows]   (default 20M)
Tables under $REHEARSAL_DIR (default /tmp/layout_rehearsal).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("REHEARSAL_DIR", "/tmp/layout_rehearsal")
N_FILES = 64


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_users = max(100, n_rows // 100)

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.session import get_spark
    from rds_pgbadger_etl_spark.sinks.layout import (
        parquet_file_ranges,
        write_clustered,
        write_zorder,
    )

    spark = get_spark(app_name="layout-rehearsal")

    src = f"{BASE}/events_{n_rows}"
    t_gen = 0.0
    if not os.path.isdir(src):
        t0 = time.perf_counter()
        (
            spark.range(n_rows)
            .select(
                F.col("id").alias("event_id"),
                # hash-scatter ts and user so ingestion order clusters
                # NEITHER column (the honest unsorted baseline)
                F.timestamp_seconds(
                    F.unix_timestamp(F.to_timestamp(F.lit("2024-01-01")))
                    + F.pmod(F.hash("id"), 30 * 86400)
                ).alias("ts"),
                F.pmod(F.hash("id", F.lit(7)), F.lit(n_users)).alias("user_id"),
                (F.pmod(F.hash("id", F.lit(11)), 100000) / 1000.0).alias("value"),
                F.repeat(F.md5(F.col("id").cast("string")), 6).alias("pad"),
            )
            .repartition(N_FILES)
            .write.mode("overwrite")
            .parquet(src)
        )
        t_gen = time.perf_counter() - t0

    ev = spark.read.parquet(src)
    layouts = {"unsorted": src}
    t_write = {}
    for name, writer in (
        ("ts_sorted", lambda d: write_clustered(ev, F.col("ts"), d, N_FILES)),
        ("zorder", lambda d: write_zorder(ev, ["user_id", "ts"], d, N_FILES)),
    ):
        d = f"{BASE}/{name}_{n_rows}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.perf_counter()
        writer(d)
        t_write[name] = round(time.perf_counter() - t0, 1)
        layouts[name] = d

    # predicates: a 2% user band; a 2% user band x 5/30-day window
    u_lo, u_hi = n_users // 10, n_users // 10 + max(1, n_users // 50)
    t_lo, t_hi = "2024-01-10 00:00:00", "2024-01-15 00:00:00"
    user_pred = F.col("user_id").between(u_lo, u_hi)
    box_pred = user_pred & (F.col("ts") >= t_lo) & (F.col("ts") < t_hi)

    import datetime as _dt

    tz = _dt.timezone.utc
    tlo = _dt.datetime.fromisoformat(t_lo).replace(tzinfo=tz)
    thi = _dt.datetime.fromisoformat(t_hi).replace(tzinfo=tz)

    def overlaps(rng, lo, hi):
        fmin, fmax = rng
        if fmin is None or fmax is None:
            return True
        return not (fmax < lo or fmin > hi)

    def best_of_3(df):
        # the aggregate reads the WIDE payload column (sum of lengths),
        # so scan cost tracks the bytes the layout lets Spark skip — a
        # count-only probe is projection-bound and shows nothing
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("pad")).alias("pad_bytes"),
            ).collect()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    report = {
        "n_rows": n_rows,
        "n_users": n_users,
        "n_files": N_FILES,
        "gen_sec": round(t_gen, 1),
        "rewrite_sec": t_write,
        "table_mb": {
            k: round(_dir_bytes(d) / 1e6, 1) for k, d in layouts.items()
        },
        "layouts": {},
    }
    for name, d in layouts.items():
        ranges = parquet_file_ranges(d, ["user_id", "ts"])
        files_user = sum(1 for r in ranges if overlaps(r["user_id"], u_lo, u_hi))
        files_box = sum(
            1
            for r in ranges
            if overlaps(r["user_id"], u_lo, u_hi)
            and overlaps(r["ts"], tlo, thi)
        )
        df = spark.read.parquet(d)
        report["layouts"][name] = {
            "files_user_pred": f"{files_user}/{len(ranges)}",
            "files_box_pred": f"{files_box}/{len(ranges)}",
            "scan_user_pred_sec": best_of_3(df.filter(user_pred)),
            "scan_box_pred_sec": best_of_3(df.filter(box_pred)),
        }
    # row-count parity: the rewrites moved rows, never changed them
    counts = {k: spark.read.parquet(d).count() for k, d in layouts.items()}
    report["rows_identical"] = len(set(counts.values())) == 1

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
