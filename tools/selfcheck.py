"""Driver-style correctness self-check: run every registered query at a
given scale factor and compare to its DuckDB oracle (row count + columns +
order-insensitive values), mirroring the driver's CORRECTNESS gate.

Usage: python tools/selfcheck.py [sf_dir] [name_filter ...]
Prints one line per query: PASS / FAIL <reason> / RowsOnly(n).
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import __spark_entry__ as entry
from tests.oracle import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from rds_pgbadger_etl_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], sf_dir)
                status = "PASS"
            else:
                status = f"RowsOnly({df.count()})"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL {type(exc).__name__}: {exc}"
            failed.append(name)
            traceback.print_exc(limit=3)
        print(f"{name:36s} {status}  [{time.time() - t0:.1f}s]", flush=True)
    print(f"\n{len(failed)} failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
