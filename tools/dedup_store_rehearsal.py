"""Dedup signature-store scale rehearsal (VERDICT r7 item 4 — the ANN
rehearsal's lifecycle treatment for operators/dedup_index.py).

The store's operational claim is O(batch) lookup: an hourly batch of
new documents near-dup-checks against everything already ingested
without re-reading or re-shingling the corpus. The plan audit supports
it (pfx-pruned band probe, bucket-pruned verify, batch side broadcast);
this tool MEASURES it at a growing store — build at 1×, append to 2×
and 4×, and at each size look up the SAME fixed-size batch:

- O(batch) predicts ~FLAT lookup latency as the store quadruples (the
  only store-proportional term is the band-table scan the pruning
  bounds, plus candidate verification — and the probe batch is built so
  its match set lives entirely in the 1× portion, making the correct
  result invariant across store sizes: any drift in rows found would
  mean a correctness bug, not just a perf one);
- append is O(new): appending the second 1× chunk must cost the same
  as the third+fourth regardless of what is already stored;
- the maintenance leg: files/partition before/after compaction, and a
  post-compact lookup that must return the identical rows.

Corpus: the controlled-duplicate generator from dedup_rehearsal.py
(families of FAMILY consecutive ids; dup_pct% of each family near-dup
the family head). Probe batch: BATCH docs with ids >= 10M, of which
batch_dup_pct% are near-dups of family heads resident in the 1× chunk.

Usage: python tools/dedup_store_rehearsal.py [n_docs_1x] [batch]
Writes a JSON summary to stdout; store + corpus under $REHEARSAL_DIR
(default /tmp/dedup_store_rehearsal).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_rehearsal import FAMILY, N_WORDS  # noqa: E402
from tools.parse_rehearsal import stage_metrics  # noqa: E402

BASE = os.environ.get("REHEARSAL_DIR", "/tmp/dedup_store_rehearsal")
DUP_PCT = 10
BATCH_DUP_PCT = 10
THRESHOLD = 0.5
PROBE_BASE = 10_000_000


def _corpus_chunk(spark, lo: int, hi: int):
    """Docs with ids [lo, hi) from the controlled-duplicate generator:
    id % FAMILY < DUP_PCT ⇒ near-dup of its family head, else unique."""
    from pyspark.sql import functions as F

    base = (F.col("id") / FAMILY).cast("long") * FAMILY
    is_dup = (F.col("id") % FAMILY) < DUP_PCT
    seed = F.when(is_dup, base).otherwise(F.col("id")).cast("string")
    words = [
        F.md5(F.concat_ws(":", F.lit("w"), seed, F.lit(str(j))))
        for j in range(N_WORDS)
    ]
    mut = F.when(
        is_dup, F.concat(F.lit("mut"), F.col("id").cast("string"), F.lit(" "))
    ).otherwise(F.lit(""))
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(mut, F.concat_ws(" ", *words)).alias("text"),
    )


def _probe_batch(spark, batch: int, n_1x: int):
    """BATCH probe docs (ids >= 10M, disjoint from every store chunk):
    batch_dup_pct% near-dup a family head in the 1× chunk (seed =
    ((i*37) mod n_families_1x) * FAMILY — heads only, so the match set
    never changes as the store grows past 1×); the rest are unique."""
    from pyspark.sql import functions as F

    n_fam = n_1x // FAMILY
    i = F.col("id") - PROBE_BASE
    is_dup = (i % 100) < BATCH_DUP_PCT
    head = ((i * 37) % n_fam) * FAMILY
    seed = F.when(is_dup, head).otherwise(F.col("id")).cast("string")
    words = [
        F.md5(F.concat_ws(":", F.lit("w"), seed, F.lit(str(j))))
        for j in range(N_WORDS)
    ]
    mut = F.concat(F.lit("probe"), F.col("id").cast("string"), F.lit(" "))
    return spark.range(PROBE_BASE, PROBE_BASE + batch).select(
        F.col("id").alias("doc_id"),
        F.concat(mut, F.concat_ws(" ", *words)).alias("text"),
    )


def main() -> None:
    n_1x = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    store = f"{BASE}/store"
    evdir = f"{BASE}/eventlog"
    shutil.rmtree(store, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from rds_pgbadger_etl_spark.operators import dedup_index as DI
    from rds_pgbadger_etl_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-store-rehearsal",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    probe = _probe_batch(spark, batch, n_1x).persist()
    probe.count()

    def lookup():
        t0 = time.perf_counter()
        n = DI.dedup_index_lookup(
            spark, probe, store, threshold=THRESHOLD
        ).count()
        return round(time.perf_counter() - t0, 1), n

    points = []

    t0 = time.perf_counter()
    DI.build_dedup_index(spark, _corpus_chunk(spark, 0, n_1x), store)
    t_build = round(time.perf_counter() - t0, 1)
    lk, n_found_1x = lookup()
    points.append({"store_docs": n_1x, "grow_sec": t_build,
                   "grow_op": "build", "lookup_sec": lk, "rows": n_found_1x})

    for lo, hi in ((n_1x, 2 * n_1x), (2 * n_1x, 4 * n_1x)):
        t0 = time.perf_counter()
        DI.append_to_dedup_index(spark, _corpus_chunk(spark, lo, hi), store)
        t_app = round(time.perf_counter() - t0, 1)
        lk, n = lookup()
        points.append({"store_docs": hi, "grow_sec": t_app,
                       "grow_op": f"append_{hi - lo}", "lookup_sec": lk,
                       "rows": n})

    # maintenance leg at 4×: layout before/after compaction, identical
    # post-compact lookup
    stats_before = {
        r.table: r.asDict()
        for r in DI.dedup_index_stats(spark, store).collect()
    }
    t0 = time.perf_counter()
    fstats = DI.compact_dedup_index(spark, store)
    t_compact = round(time.perf_counter() - t0, 1)
    stats_after = {
        r.table: r.asDict()
        for r in DI.dedup_index_stats(spark, store).collect()
    }
    lk_post, n_post = lookup()

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(2)  # event log flush

    stages = stage_metrics(evdir)
    summary = {
        "app_id": app_id,
        "n_docs_1x": n_1x,
        "batch": batch,
        "points": points,
        "compact_sec": t_compact,
        "files": {
            t: {"before": fstats[t]["files_before"],
                "after": fstats[t]["files_after"]}
            for t in fstats
        },
        "max_part_files_before": {
            t: s["max_part_files"] for t, s in stats_before.items()
        },
        "max_part_files_after": {
            t: s["max_part_files"] for t, s in stats_after.items()
        },
        "post_compact_lookup_sec": lk_post,
        "post_compact_rows": n_post,
        "rows_invariant": len({p["rows"] for p in points} | {n_post}) == 1,
        "total_shuffle_write_mb": round(
            sum(s["shuffle_write_mb"] for s in stages), 1
        ),
        "total_spill_mb": round(sum(s["spill_mb"] for s in stages), 1),
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
