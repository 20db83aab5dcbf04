"""Dedup-family scale rehearsal (VERDICT r5 item 2 — the parse
rehearsal's treatment for the MinHash-LSH pipeline).

Generates a multi-GB document corpus with a CONTROLLED duplicate rate —
documents come in families of ``FAMILY`` consecutive ids; the first
``dup_pct`` of each family are near-duplicates of the family head (same
seed text, one mutated token at the front so a handful of shingles
differ) — then runs the production dedup path end-to-end:

    char shingles → MinHash sigs → LSH bands → candidate pairs →
    exact-Jaccard verify → connected components → canonical selection

and records per-stage wall time, candidate/verified pair counts, and
shuffle bytes (Spark event log). Running it at 1x and 2x corpus proves
the scaling claim the fixture-scale tests can only assert structurally:
**candidate pairs grow with duplicate volume (families x pairs-per-
family, linear in corpus), never corpus²** — the expected pair count is
known in closed form: n_families x C(dups_per_family + 1, 2).

Usage:  python tools/dedup_rehearsal.py [n_docs] [dup_pct]
Writes a JSON summary to stdout; corpus parquet under $REHEARSAL_DIR
(default /tmp/dedup_rehearsal), reused if present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parse_rehearsal import stage_metrics  # noqa: E402

BASE = os.environ.get("REHEARSAL_DIR", "/tmp/dedup_rehearsal")
FAMILY = 100  # ids per family (1 head + dups + unique docs)
N_WORDS = 150  # 32-hex words per doc ≈ 5 KB of text
THRESHOLD = 0.5


def generate_corpus(spark, path: str, n_docs: int, dup_pct: int) -> None:
    """Deterministic corpus, generated JVM-side (one md5 expression per
    word): doc ids in [0, n_docs); id % FAMILY < dup_pct ⇒ the doc is a
    near-dup of its family head (seed = family base id) with one mutated
    leading token; all other docs are globally unique (seed = own id)."""
    from pyspark.sql import functions as F

    base = (F.col("id") / FAMILY).cast("long") * FAMILY
    is_dup = (F.col("id") % FAMILY) < dup_pct
    seed = F.when(is_dup, base).otherwise(F.col("id")).cast("string")
    words = [
        F.md5(F.concat_ws(":", F.lit("w"), seed, F.lit(str(j))))
        for j in range(N_WORDS)
    ]
    mut = F.when(
        is_dup, F.concat(F.lit("mut"), F.col("id").cast("string"), F.lit(" "))
    ).otherwise(F.lit(""))
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(mut, F.concat_ws(" ", *words)).alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dup_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    corpus = f"{BASE}/docs_{n_docs}_{dup_pct}"
    evdir = f"{BASE}/eventlog"
    outdir = f"{BASE}/canonical_parquet"
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.operators.dedup import (
        candidate_pairs,
        candidate_shingle_sets,
        char_shingles,
        dedup_cluster_assignments,
        lsh_bands,
        minhash_signatures,
        pair_jaccard,
    )
    from rds_pgbadger_etl_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-rehearsal",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    t_gen = 0.0
    if not os.path.isdir(corpus):
        t0 = time.perf_counter()
        generate_corpus(spark, corpus, n_docs, dup_pct)
        t_gen = time.perf_counter() - t0
    input_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    docs = spark.read.parquet(corpus)

    # --- stage 1: corpus-wide numeric MinHash signatures --------------
    t0 = time.perf_counter()
    sigs = minhash_signatures(char_shingles(docs), "doc_id").persist()
    n_sigs = sigs.count()
    t_sigs = time.perf_counter() - t0

    # --- stage 2: LSH banding + candidate pairs -----------------------
    t0 = time.perf_counter()
    cands = candidate_pairs(lsh_bands(sigs, "doc_id"), "doc_id").persist()
    n_cands = cands.count()
    t_cands = time.perf_counter() - t0

    # --- stage 3: exact-Jaccard verify on candidates only -------------
    verify_strategy = os.environ.get("DEDUP_VERIFY_STRATEGY", "shuffle")
    t0 = time.perf_counter()
    prof = candidate_shingle_sets(docs, cands, "doc_id", "text")
    pairs = pair_jaccard(
        cands, prof, "doc_id", strategy=verify_strategy
    ).filter(F.col("jaccard") >= THRESHOLD).persist()
    n_pairs = pairs.count()
    t_verify = time.perf_counter() - t0

    # --- stage 3b: containment verify over the same candidates --------
    # Round 7: containment_pairs shares _verify_join with pair_jaccard,
    # so the same strategy (shuffle past AUTO_VERIFY_PAIRS) must keep
    # this leg linear in candidate volume too — this is the measurement
    # the r6 verdict asked for.
    from rds_pgbadger_etl_spark.operators.dedup import (
        _containment_score,
        _verify_join,
    )

    t0 = time.perf_counter()
    cont = _containment_score(
        _verify_join(cands, prof, "doc_id", verify_strategy)
    ).filter(F.col("containment") >= 0.8)
    n_containment = cont.count()
    t_containment = time.perf_counter() - t0

    # --- stage 3c: duplicate-span REMOVAL over the whole corpus -------
    # Round 8: operators/dedup.span_removal (ExactSubstr semantics).
    # The controlled structure gives a closed form: every non-head dup
    # shares exactly the N_WORDS seed-word run with its family head
    # (first occurrence), so removed docs = families x (dup_pct - 1)
    # and each loses exactly N_WORDS tokens (its mut token survives).
    # Linearity in corpus size at fixed dup_pct is the claim under test.
    from rds_pgbadger_etl_spark.operators.dedup import span_removal

    t0 = time.perf_counter()
    sr = span_removal(docs).agg(
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_cut"),
        F.sum("n_removed").alias("tokens_removed"),
    ).collect()[0]
    t_span = time.perf_counter() - t0
    expected_span_docs = (n_docs // FAMILY) * max(dup_pct - 1, 0)

    # --- stage 4: connected components + canonical selection ----------
    t0 = time.perf_counter()
    assign = dedup_cluster_assignments(docs, pairs=pairs.select("a", "b"))
    stats = assign.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("component").alias("components"),
        F.sum("is_canonical").alias("canonical"),
    ).collect()[0]
    t_cluster = time.perf_counter() - t0

    # --- stage 5: write the kept corpus (canonical docs only) ---------
    # Subtract the REMOVALS (∝ duplicate volume) instead of joining the
    # keeps (∝ corpus): a broadcast anti-join filters the text scan in
    # place with no corpus shuffle — the first rehearsal cut measured
    # this join shuffling the full 2 GB of text (write stage 25.3 s at
    # 2x vs 2.2 s at 1x); with the anti-join the write is shuffle-free.
    shutil.rmtree(outdir, ignore_errors=True)
    t0 = time.perf_counter()
    removals = assign.filter(F.col("is_canonical") == 0).select("doc_id")
    (
        docs.join(F.broadcast(removals), "doc_id", "left_anti")
        .write.mode("overwrite")
        .parquet(outdir)
    )
    t_write = time.perf_counter() - t0

    # closed-form expectations for the controlled duplicate structure
    n_families = n_docs // FAMILY
    fam_members = dup_pct + 1  # head + its near-dups
    expected_pairs = n_families * (fam_members * (fam_members - 1) // 2)

    # --- stage 6 (round 11): the DEFAULT auto hot-band cap, no knob ---
    # Plant a 5000-doc boilerplate family next to a slice of the real
    # corpus: its two band values each carry 5000 docs. Uncapped, the
    # self-join produces C(5000,2) = 12.5M family candidates; with NO
    # knob the auto threshold (max(64, 8 x median)) excludes them while
    # every genuine planted family pair survives (recall 1.0 on the
    # slice) — the protection a user gets without knowing the knob.
    HOT_N = 5_000
    slice_docs = docs.filter(F.col("doc_id") < 20_000)
    hot = spark.range(HOT_N).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit("identical boilerplate template text " * 16).alias("text"),
    )
    adv = slice_docs.select("doc_id", "text").unionByName(hot)
    adv_bands = lsh_bands(
        minhash_signatures(char_shingles(adv), "doc_id"), "doc_id"
    ).persist()
    adv_bands.count()
    slice_pairs_plain = candidate_pairs(
        lsh_bands(
            minhash_signatures(char_shingles(slice_docs), "doc_id"),
            "doc_id",
        ),
        "doc_id",
    )
    n_slice_expected = slice_pairs_plain.filter(
        F.col("b") < 10_000_000
    ).count()
    t0 = time.perf_counter()
    auto_cands = candidate_pairs(adv_bands, "doc_id").persist()
    n_auto = auto_cands.count()
    n_auto_family = auto_cands.filter(F.col("a") >= 10_000_000).count()
    n_auto_slice = auto_cands.filter(F.col("b") < 10_000_000).count()
    t_auto = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_uncapped_adv = candidate_pairs(
        adv_bands, "doc_id", max_band_freq=None
    ).count()
    t_uncapped_adv = time.perf_counter() - t0
    auto_cands.unpersist()
    adv_bands.unpersist()

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(2)  # event log flush

    stages = stage_metrics(evdir)
    top = sorted(
        stages,
        key=lambda s: s["shuffle_write_mb"] + s["shuffle_read_mb"],
        reverse=True,
    )[:6]
    summary = {
        "app_id": app_id,
        "n_docs": n_docs,
        "dup_pct": dup_pct,
        "verify_strategy": verify_strategy,
        "corpus_parquet_gb": round(input_bytes / 1e9, 2),
        "gen_sec": round(t_gen, 1),
        "sigs_sec": round(t_sigs, 1),
        "cands_sec": round(t_cands, 1),
        "verify_sec": round(t_verify, 1),
        "containment_sec": round(t_containment, 1),
        "n_containment_pairs": n_containment,
        "span_removal_sec": round(t_span, 1),
        "span_docs_cut": int(sr.docs_cut),
        "span_tokens_removed": int(sr.tokens_removed),
        "expected_span_docs": expected_span_docs,
        "cluster_sec": round(t_cluster, 1),
        "write_sec": round(t_write, 1),
        "total_sec": round(t_sigs + t_cands + t_verify + t_cluster + t_write, 1),
        "n_docs_signed": n_sigs,
        "n_candidate_pairs": n_cands,
        "n_verified_pairs": n_pairs,
        "expected_dup_pairs": expected_pairs,
        "n_components": int(stats.components),
        "n_canonical": int(stats.canonical),
        "total_shuffle_write_mb": round(
            sum(s["shuffle_write_mb"] for s in stages), 1
        ),
        "total_spill_mb": round(sum(s["spill_mb"] for s in stages), 1),
        "auto_hot_band": {
            "hot_family": HOT_N,
            "uncapped_pairs": n_uncapped_adv,
            "uncapped_s": round(t_uncapped_adv, 1),
            "auto_pairs": n_auto,
            "auto_s": round(t_auto, 1),
            "auto_family_pairs": n_auto_family,  # expect 0
            "auto_slice_pairs": n_auto_slice,
            "slice_expected_pairs": n_slice_expected,  # recall 1.0 check
        },
        "top_shuffle_stages": top,
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
