"""Per-query profiler for the optimization rounds (guide §1).

For each named query (or the top-N by the last bench_detail), runs the
bench methodology (3 evaluations, noop sink) in one session and records
per run: wall seconds and the number of Spark JOBS the evaluation
launched (via a job group + StatusTracker) — a query whose warm
evaluation launches 15 sequential jobs is paying local-mode stage
latency 15 times regardless of data volume, and the fix is fewer
actions, not faster tasks.

Usage:
  python tools/profile_query.py q01_pricing_summary ann_index_binary_topk
  python tools/profile_query.py --top 25          # top-N warm from bench_detail
  python tools/profile_query.py --explain NAME    # also dump explain("formatted")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    topn = 0
    explain = "--explain" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--top":
            topn = int(sys.argv[i + 1])
            args = []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    names = list(args)
    if topn:
        d = json.load(open(".benchmarks/bench_detail.json"))
        names = [
            k
            for k, _ in sorted(
                d["queries"].items(), key=lambda kv: -kv[1]["warm"]
            )[:topn]
        ]

    from rds_pgbadger_etl_spark.session import get_spark

    spark = get_spark(app_name="profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    qs = entry.queries()
    for name in names:
        fn = qs[name]
        per_run = []
        for r in range(3):
            gid = f"prof-{name}-{r}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = tracker.getJobIdsForGroup(gid)
            # stages across those jobs
            nstages = 0
            ntasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        nstages += 1
                        ntasks += si.numTasks
            per_run.append((t2 - t0, t1 - t0, len(jobs), nstages, ntasks))
            sc.setJobGroup("idle", "idle")
        w = min(p[0] for p in per_run[1:])
        wplan = min(p[1] for p in per_run[1:])
        print(
            f"{name:45s} cold={per_run[0][0]:7.3f}s warm={w:7.3f}s "
            f"plan={wplan:6.3f}s "
            f"jobs={[p[2] for p in per_run]} stages={[p[3] for p in per_run]} "
            f"tasks={[p[4] for p in per_run]}",
            flush=True,
        )
        if explain:
            from rds_pgbadger_etl_spark.streaming import incremental_ann

            def _fmt(df) -> str:
                return df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )

            # flag verbs eagerly localCheckpoint: their returned plan is
            # a stub, so capture the REAL plan via the pre-checkpoint
            # hook (written as the primary explain when it fires)
            captured = []
            incremental_ann.PRE_CHECKPOINT_PLAN_HOOK = (
                lambda df: captured.append(_fmt(df))
            )
            try:
                post = _fmt(qs[name](spark, sf_dir))
            finally:
                incremental_ann.PRE_CHECKPOINT_PLAN_HOOK = None
            with open(f"/tmp/explain_{name}.txt", "w") as fh:
                if captured:
                    fh.write(
                        "-- pre-checkpoint plan(s) (the returned plan is"
                        " a localCheckpoint stub; stub appended below)\n"
                    )
                    fh.write("\n".join(captured))
                    fh.write("\n-- post-checkpoint (returned) plan\n")
                fh.write(post)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
