"""End-to-end curation-pipeline rehearsal at GB scale (round 8).

The per-query rehearsals (parse, dedup, ANN, dedup-store, stream) each
prove ONE family linear; this one composes the whole pretraining
pipeline the way a real run would and measures the composition:

    generate corpus → near-dup pair table (shingle → MinHash → LSH →
    verify) → contamination-id table (8-gram vs benchmark slice) →
    one-scan funnel flag table (plans/llm_ops.funnel_flag_table — the
    EXACT production function behind the curation_funnel query) →
    pack survivors into 1024-token bins (operators/curation.pack_bins)
    → write the kept corpus (broadcast anti-join of the removals, no
    corpus shuffle)

Controlled corpus (families of 100 consecutive train ids, on top of a
1%-of-corpus benchmark slice at ids < n/100), every marker class
orthogonal by position j = (id - B) % 100:

    j == 0        family head (canonical survivor)
    j in 1..9     near-dup of the head (one mutated leading token)
    j == 96       EXACT copy of the head (caught at stage 2)
    j == 97       10-word doc (quality 0.3 < 0.7 — fails stage 1)
    j == 98       lang 'xx' (fails stage 1)
    j == 99       contaminated: embeds the first-8-word gram of bench
                  doc (family % B) (dropped at stage 4)
    otherwise     globally unique filler

so the funnel has closed-form expectations: stage 1 drops 2 docs per
family, stage 2 drops the exact copy, stage 3 drops ~9 per family
(times measured LSH band recall, ~81% at 2 bands x 2 sigs), stage 4
drops the benchmark slice + ~1 contaminated doc per family.

Usage:  python tools/pipeline_rehearsal.py [n_docs]
Writes one JSON line to stdout; corpus parquet under $REHEARSAL_DIR
(default /tmp/pipeline_rehearsal), reused if present. Run at 200k/400k/
800k (≈1/2/4 GB) for the BENCH_NOTES linearity table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parse_rehearsal import stage_metrics  # noqa: E402

BASE = os.environ.get("REHEARSAL_DIR", "/tmp/pipeline_rehearsal")
FAMILY = 100
N_WORDS = 150  # 32-hex words per doc ≈ 5 KB of text
PACK_BUDGET = 1024


def generate_corpus(spark, path: str, n_docs: int) -> int:
    """Deterministic JVM-side corpus with the marker layout above.
    Returns the benchmark slice size B = n_docs // 100."""
    from pyspark.sql import functions as F

    bench_max = n_docs // 100
    tid = F.col("id") - bench_max  # train-relative id (< 0 ⇒ benchmark)
    j = tid % FAMILY
    fam = (tid / FAMILY).cast("long") * FAMILY + bench_max  # head id
    is_bench = F.col("id") < bench_max
    is_near = (j >= 1) & (j <= 9) & ~is_bench
    is_exact = (j == 96) & ~is_bench
    is_short = (j == 97) & ~is_bench
    is_xx = (j == 98) & ~is_bench
    is_cont = (j == 99) & ~is_bench

    # seed: bench docs seed on "b:<id>"; near/exact dups seed on the
    # family head; everything else on its own id
    seed = (
        F.when(is_bench, F.concat(F.lit("b:"), F.col("id").cast("string")))
        .when(is_near | is_exact, fam.cast("string"))
        .otherwise(F.col("id").cast("string"))
    )
    words = [
        F.md5(F.concat_ws(":", F.lit("w"), seed, F.lit(str(k))))
        for k in range(N_WORDS)
    ]
    full = F.concat_ws(" ", *words)
    short = F.concat_ws(" ", *words[:10])
    # contaminated docs embed bench doc (fam % B)'s first 8 words
    bseed = F.concat(F.lit("b:"), ((fam - bench_max) % bench_max + 0).cast("string"))
    bgram = F.concat_ws(
        " ",
        *[
            F.md5(F.concat_ws(":", F.lit("w"), bseed, F.lit(str(k))))
            for k in range(8)
        ],
    )
    mut = F.concat(F.lit("mut"), F.col("id").cast("string"), F.lit(" "))
    text = (
        F.when(is_short, short)
        .when(is_near, F.concat(mut, full))
        .when(is_cont, F.concat(bgram, F.lit(" "), full))
        .otherwise(full)
    )
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.when(is_xx, F.lit("xx")).otherwise(F.lit("en")).alias("lang"),
            F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias(
                "source"
            ),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )
    return bench_max


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    corpus = f"{BASE}/docs_{n_docs}"
    evdir = f"{BASE}/eventlog_{n_docs}"
    outdir = f"{BASE}/kept_parquet"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.operators.curation import pack_bins
    from rds_pgbadger_etl_spark.operators.dedup import near_dup_pairs
    from rds_pgbadger_etl_spark.plans.llm_ops import (
        contaminated_ids,
        funnel_flag_table,
        funnel_report,
    )
    from rds_pgbadger_etl_spark.session import get_spark

    spark = get_spark(
        app_name="pipeline-rehearsal",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    bench_max = n_docs // 100
    t_gen = 0.0
    if not os.path.isdir(corpus):
        t0 = time.perf_counter()
        generate_corpus(spark, corpus, n_docs)
        t_gen = time.perf_counter() - t0
    input_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    # shuffle partitions track input volume (session.py rule — the r8
    # residual caveat's hand-set REHEARSAL_SHUFFLE_PARTITIONS knob,
    # now the engine's own sizing pass)
    from rds_pgbadger_etl_spark.session import size_shuffle_partitions

    n_shuffle = size_shuffle_partitions(spark, input_bytes=input_bytes)
    docs = spark.read.parquet(corpus)

    # --- stage 1: near-dup pair table (the dedup-rehearsal path) ------
    t0 = time.perf_counter()
    pairs = near_dup_pairs(docs, threshold=0.5).persist()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    dup_ids = pairs.select(F.col("b").alias("doc_id"))

    # --- stage 2: contamination ids vs the benchmark slice ------------
    t0 = time.perf_counter()
    cont = contaminated_ids(docs, bench_max).persist()
    n_cont = cont.count()
    t_cont = time.perf_counter() - t0

    # --- stage 3: one-scan funnel (the production flag table) ---------
    t0 = time.perf_counter()
    flags = funnel_flag_table(docs, dup_ids, cont, bench_max).persist()
    funnel = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in funnel_report(flags).collect()
    }
    t_funnel = time.perf_counter() - t0

    # --- stage 4: pack survivors into training bins --------------------
    t0 = time.perf_counter()
    # survivor ids are ~ corpus-count longs (metadata-sized next to the
    # text): broadcast them — the un-hinted semi-join shuffle-joined the
    # full 3.7 GB of corpus text at the 4x scale (3.8 GB stage shuffle)
    survivors = docs.join(
        F.broadcast(flags.filter(F.col("pass4")).select("doc_id")),
        "doc_id",
        "leftsemi",
    )
    packed = pack_bins(survivors, budget=PACK_BUDGET)
    pack_stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("source", "bin").alias("bins"),
        F.sum("toks").alias("toks"),
    ).collect()[0]
    t_pack = time.perf_counter() - t0

    # --- stage 5: write the kept corpus (anti-join the removals) ------
    # Removals ∝ dropped volume; the text scan is filtered in place by a
    # broadcast anti-join — the dedup rehearsal measured the join-the-
    # keeps variant shuffling the full corpus text.
    shutil.rmtree(outdir, ignore_errors=True)
    t0 = time.perf_counter()
    removals = flags.filter(~F.col("pass4")).select("doc_id")
    kept = docs.join(F.broadcast(removals), "doc_id", "left_anti")
    kept.write.mode("overwrite").parquet(outdir)
    t_write = time.perf_counter() - t0

    stages = stage_metrics(evdir)
    spill = sum(s.get("spill_mb", 0) for s in stages)
    shuffle_mb = sum(s.get("shuffle_write_mb", 0) for s in stages)

    fam = (n_docs - bench_max) // FAMILY
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "input_gb": round(input_bytes / 2**30, 2),
                "shuffle_partitions": n_shuffle,
                "bench_max": bench_max,
                "n_families": fam,
                "gen_s": round(t_gen, 1),
                "near_pairs": n_pairs,
                "near_pairs_s": round(t_pairs, 1),
                "contaminated": n_cont,
                "contaminated_s": round(t_cont, 1),
                "funnel": {
                    k: list(v) for k, v in sorted(funnel.items())
                },
                "funnel_s": round(t_funnel, 1),
                "packed_docs": pack_stats.docs,
                "packed_bins": pack_stats.bins,
                "packed_tokens": pack_stats.toks,
                "pack_s": round(t_pack, 1),
                "write_s": round(t_write, 1),
                "end_to_end_s": round(
                    t_pairs + t_cont + t_funnel + t_pack + t_write, 1
                ),
                "shuffle_write_mb": round(shuffle_mb, 1),
                "spill_mb": round(spill, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
