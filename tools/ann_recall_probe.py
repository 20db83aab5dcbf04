"""Recall@10 of the IVF-Flat index reader vs brute-force truth for each
staged centroid config of the ANN rehearsal (and n_probe sensitivity at
the auto-rule pick). Companion to tools/ann_rehearsal.py — run that
first (with SPARK_GRAFT_ANN_CENTROIDS sweeps) so the staged corpus and
index directories below exist; results are recorded in BENCH_NOTES.md
("Recall leg: the sizing rule is also the recall optimum").

Usage: python tools/ann_recall_probe.py [staging_root] [n_vecs]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators import ann_index as AI
from rds_pgbadger_etl_spark.operators import similarity as S
from rds_pgbadger_etl_spark.session import get_spark

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_rehearsal"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
K = 10
N_QUERIES = 50  # enough for a stable estimate; truth is one brute pass


def main() -> None:
    spark = get_spark(app_name="ann-recall-probe")
    emb = spark.read.parquet(f"{ROOT}/emb_{N}")
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in q_rows]
    truth_df = S.brute_force_topk(emb, [q for q, _ in queries], K)
    truth: dict[int, set[int]] = {}
    for r in truth_df.collect():
        truth.setdefault(int(r.q_id), set()).add(int(r.vec_id))

    # (label, index dir, n_probe) — dirs staged by the rehearsal sweep;
    # absent configs are skipped so the probe runs on partial sweeps.
    legs = [
        ("c16_p2", f"{ROOT}/index_{N}", 2),
        ("c32_p2", f"{ROOT}/index_{N}_c32", 2),
        ("c64_p2", f"{ROOT}/index_{N}_c64", 2),
        ("c64_p4", f"{ROOT}/index_{N}_c64", 4),
        ("c64_p8", f"{ROOT}/index_{N}_c64", 8),
        ("c2048_p2", f"{ROOT}/index_{N}_c2048", 2),
        ("c2048_p64", f"{ROOT}/index_{N}_c2048", 64),
    ]
    out = {}
    for name, d, probes in legs:
        if not os.path.isdir(d):
            continue
        got: dict[int, set[int]] = {}
        res = AI.ann_index_ivf_topk(spark, d, queries, K, n_probe=probes)
        for r in res.collect():
            got.setdefault(int(r.q_id), set()).add(int(r.vec_id))
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        out[name] = round(hits / (K * len(truth)), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
