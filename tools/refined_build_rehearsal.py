"""Focused A/B: refined 2-level build at 2M vectors — old join+window
assignment vs cogrouped kernel. Wall + spill from the event log."""
import glob, gzip, json, os, shutil, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from rds_pgbadger_etl_spark.session import get_spark, size_shuffle_partitions
from rds_pgbadger_etl_spark.operators import ann_index as AI

n = int(sys.argv[1]); label = sys.argv[2]
evdir = f"/tmp/evlog_refined_{label}"
shutil.rmtree(evdir, ignore_errors=True); os.makedirs(evdir)
spark = get_spark(app_name=f"refined-{label}", cpus="32",
                  extra_conf={"spark.eventLog.enabled": "true",
                              "spark.eventLog.dir": evdir,
                              "spark.eventLog.compress": "false"})
spark.sparkContext.setLogLevel("ERROR")
corpus = f"/tmp/ann_rehearsal/emb_{n}"
if not os.path.exists(corpus):
    cols = F.array(*[F.rand(seed=1000 + j).cast("float") for j in range(64)])
    (spark.range(n).select(F.col("id").alias("vec_id"), cols.alias("embedding"))
     .repartition(64).write.mode("overwrite").parquet(corpus))
emb = spark.read.parquet(corpus)
size_shuffle_partitions(spark, corpus)
d = f"/tmp/refined_idx_{label}"
shutil.rmtree(d, ignore_errors=True)
t0 = time.perf_counter()
AI.build_ann_index_2level(spark, emb, d, n_groups=None, refine_iters=1)
wall = time.perf_counter() - t0
print(f"WALL {label} {wall:.1f}s", flush=True)
spark.stop()
spill_d = spill_m = sw = 0
for path in glob.glob(f"{evdir}/**", recursive=True):
    if not os.path.isfile(path) or "appstatus" in os.path.basename(path):
        continue
    opener = gzip.open if path.endswith(".gz") else open
    try:
        fh = opener(path, "rt")
    except Exception:
        continue
    with fh as f:
        try:
            lines = f.readlines()
        except Exception:
            continue
        for line in lines:
            try: ev = json.loads(line)
            except Exception: continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                tm = ev.get("Task Metrics") or {}
                spill_d += tm.get("Disk Bytes Spilled", 0)
                spill_m += tm.get("Memory Bytes Spilled", 0)
                sw += (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
print(f"REFINED-BUILD {label} n={n} wall={wall:.1f}s "
      f"spill_disk={spill_d/1e9:.2f}GB spill_mem={spill_m/1e9:.2f}GB "
      f"shuffle_write={sw/1e9:.2f}GB", flush=True)
