"""Differential + behavioral tests for the curation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators import curation as C
from rds_pgbadger_etl_spark.plans.curation import QUERIES
from rds_pgbadger_etl_spark.sources.tables import load_table
from tests.oracle import compare

CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_curation_oracle_match(spark, sf_oracle, name, fn, sql):
    compare(fn(spark, sf_oracle), sql, sf_oracle)


def test_redact_pii_replaces_all_classes(spark):
    df = spark.createDataFrame(
        [("write to a.b+c@mail.example.org or 10.1.2.3 or 555-0199 now",)],
        ["text"],
    )
    out = df.select(C.redact_pii("text").alias("t")).first().t
    assert out == "write to <EMAIL> or <IP> or <PHONE> now"


def test_pii_count_does_not_double_count_email_as_ip(spark):
    df = spark.createDataFrame([("ping user@host.example.com",)], ["text"])
    row = df.select(
        C.pii_count("text", "email").alias("e"),
        C.pii_count("text", "ipv4").alias("i"),
        C.pii_count("text", "phone").alias("p"),
    ).first()
    assert (row.e, row.i, row.p) == (1, 0, 0)


def test_decontaminate_drops_benchmark_copies(spark):
    rows = [
        (0, "a b c d e f g h i j", "bench"),  # benchmark doc
        (100, "a b c d e f g h i j", "train"),  # verbatim copy → dropped
        (101, "z y x w v u t s r q", "train"),  # disjoint → kept
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept = C.decontaminate(docs, bench_max_id=50)
    assert [r.doc_id for r in kept.collect()] == [101]


def test_repetition_stats_flags_dominated_doc(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam ok"), (2, "a b c d e f g h i j")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in C.repetition_stats(docs).collect()}
    assert rows[1].flagged == 1 and rows[1].top_cnt == 4
    assert rows[2].flagged == 0 and rows[2].n_distinct == 10


def test_chunk_windows_partial_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 150))], ["doc_id", "text"]
    )
    chunks = C.chunk_windows(docs, chunk=64).orderBy("chunk_id").collect()
    assert [(c.chunk_id, c.chunk_tokens) for c in chunks] == [
        (0, 64), (1, 64), (2, 22),
    ]


def test_pack_bins_contiguous_offsets(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 1000), "s") for i in range(5)],
        ["doc_id", "text", "source"],
    )
    bins = {r.doc_id: r.bin for r in C.pack_bins(docs, budget=2048).collect()}
    # offsets 0,1000,2000,3000,4000 → bins 0,0,0,1,1
    assert bins == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_training_order_is_permutation_stable(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = docs.select("doc_id", C.training_order_key("doc_id").alias("k"))
    b = docs.repartition(13).select(
        "doc_id", C.training_order_key("doc_id").alias("k")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # keys are collision-free over the corpus
    assert a.select("k").distinct().count() == docs.count()


def test_train_val_test_split_stable_and_proportional(spark, sf_oracle):
    from rds_pgbadger_etl_spark.plans.curation import (
        _split_bucket,
        train_val_test_split,
    )
    from rds_pgbadger_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    agg = train_val_test_split(spark, sf_oracle).collect()
    n = {s: 0 for s in ("train", "val", "test")}
    for r in agg:
        n[r.split] += r.n_docs
    total = sum(n.values())
    assert 0.85 <= n["train"] / total <= 0.95
    assert n["val"] > 0 and n["test"] > 0

    # assignment is a pure function of doc_id: dropping half the corpus
    # must not move any surviving document between splits
    docs = load_table(spark, sf_oracle, "documents")
    bucket = _split_bucket("doc_id")
    split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    full = {r.doc_id: r.s for r in docs.select("doc_id", split.alias("s")).collect()}
    half = {
        r.doc_id: r.s
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert all(full[d] == s for d, s in half.items())


def test_segmented_cumsum_matches_single_window(spark):
    """The distributed prefix sum must be row-identical to the plain
    per-segment cumsum window, regardless of input partitioning — the
    single-window plan is the semantics, segmented_cumsum is the
    100 TB-safe execution (bounded local sorts + metadata-sized
    offsets, no segment-sized window partition)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.functions.agg import segmented_cumsum

    df = (
        spark.range(10_000)
        .select(
            (F.col("id") % 3).alias("seg"),
            F.col("id").alias("k"),
            (F.col("id") % 7 + 1).alias("v"),
        )
        .repartition(13)  # scrambled physical layout on purpose
    )
    got = segmented_cumsum(df, ["seg"], ["k"], "v", num_partitions=8)
    w = (
        Window.partitionBy("seg")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = df.withColumn("cum", F.sum("v").over(w))
    cols = ["seg", "k", "v", "cum"]
    assert sorted(map(str, got.select(cols).collect())) == sorted(
        map(str, exp.select(cols).collect())
    )
    # and the plan has no segment-sized window: the only windows run
    # over (seg, _pid) locals and the per-segment offset partials
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan


def test_segmented_cumsum_cache_sees_appended_data(spark, tmp_path):
    """Regression for the stale-cache bug: the pinned ranged base was
    keyed on semanticHash alone, which hashes the PLAN — a parquet path
    that receives an append keeps the same plan hash, so a second call
    silently returned the pre-append materialization. The key now
    fingerprints the input file list; the appended rows must show up."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.functions import agg as A

    p = str(tmp_path / "cumsum_src")
    spark.range(100).select(
        (F.col("id") % 2).alias("seg"), F.col("id").alias("k"),
        F.lit(1).alias("v"),
    ).write.parquet(p)

    def total():
        df = spark.read.parquet(p)  # identical plan both times
        out = A.segmented_cumsum(df, ["seg"], ["k"], "v", num_partitions=4)
        return out.agg(F.sum("cum").alias("s")).collect()[0]["s"]

    before = total()
    spark.range(100, 200).select(
        (F.col("id") % 2).alias("seg"), F.col("id").alias("k"),
        F.lit(1).alias("v"),
    ).write.mode("append").parquet(p)
    assert total() > before  # appended rows visible, not the stale cache
    # eviction bound holds and clear releases everything
    assert len(A._RANGED) <= A._RANGED_MAX
    A.clear_ranged_cache()
    assert A._RANGED == {}
