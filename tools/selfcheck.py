"""Driver-style correctness self-check: run every registered query at a
given scale factor and compare to its DuckDB oracle (row count + columns +
order-insensitive values), mirroring the driver's CORRECTNESS gate.

Usage: python tools/selfcheck.py [sf_dir] [name_filter ...]
       python tools/selfcheck.py --stateful-sf01
Prints one line per query: PASS / FAIL <reason> / RowsOnly(n).

``--stateful-sf01`` is the STANDING sf0.1 sweep of the stateful /
multi-pass families (streaming ingestion, persisted dedup/ANN store
lifecycles, curation funnel, two-level index, graph iteration): the
round-9 recacheByPath lineage bug was invisible at the sf0.01 gate and
surfaced only when these oracles ran at 10x the data — this mode pins
that check so the next state-dependent bug doesn't wait for someone to
remember. Run it at every round close (SELFCHECK_r{N}_sf01.txt).
Known exception: ``sketch_rollup_daily`` (HLL beyond coupon-exact
range at sf0.1, bounded by ``sketch_rollup_error``) is NOT in these
families and is excluded by construction.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import __spark_entry__ as entry
from tests.oracle import compare

# The stateful/multi-pass families: every query whose answer depends on
# mutated-store state, streaming batch order, or iterated plans.
STATEFUL_PREFIXES = (
    "stream_",
    "dedup_index",
    "ann_index",
    "ann_2level",
    "curation",
    "embedding_pagerank",
    "embedding_communities",
    "zorder",  # answers from a staged clustered REWRITE of the corpus
)


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--stateful-sf01":
        sf_dir = "/root/testdata/sf0.1"
        only = {
            n
            for n in entry.queries()
            if n.startswith(STATEFUL_PREFIXES)
        }
        print(f"stateful sweep: {len(only)} queries at {sf_dir}")
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(args[1:])
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
