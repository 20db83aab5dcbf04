"""Incremental near-dup detection: flag each arriving micro-batch of
documents against everything ingested before it.

The batch near-dup path (operators/dedup.py) is corpus × corpus; a
production ingestion pipeline instead asks "is this NEW document a
near-dup of anything ALREADY ACCEPTED?" — batch × corpus, continuously.
This module is that shape as a Structured Streaming ``foreachBatch``:

- a persisted BAND STORE (parquet, appended per batch) holds one row per
  (band, doc_id) for every accepted document — the same LSH banding the
  batch path uses, so batch and incremental agree on what "near-dup"
  means;
- per micro-batch: shingle + MinHash the new docs only (the expensive
  part is proportional to the batch, never the corpus), join their bands
  against the store to get candidate pairs, verify exact Jaccard against
  the store's shingle profiles, and emit (doc_id, dup_of, jaccard);
- accepted docs' bands + profiles append to the store atomically-enough
  for exactly-once via the streaming checkpoint (re-run batches
  overwrite their own partition).

Scale: the store is partitioned by ``band % N_BUCKETS`` so the
batch-vs-store join prunes to colliding partitions; the profile rejoin
carries ids first. State grows with the accepted corpus (as it must —
dedup-against-history needs history), but per-batch work is
O(batch × collisions), never O(corpus²).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators.dedup import (
    char_shingles,
    lsh_bands,
    shingle_profile,
)

N_STORE_BUCKETS = 64


def _band_store_path(store_dir: str) -> str:
    return os.path.join(store_dir, "bands")


def _profile_store_path(store_dir: str) -> str:
    return os.path.join(store_dir, "profiles")


def _batch_profile(batch: DataFrame) -> DataFrame:
    """Shingle profile + bands for the incoming docs only."""
    return shingle_profile(char_shingles(batch, "doc_id", "text"), "doc_id")


def flag_against_store(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    threshold: float = 0.5,
    prof: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) for new docs near-duplicating any doc
    already in the store; empty on the first batch (empty store). The
    batch side is small by construction, so both joins broadcast it —
    the store is only ever scanned, never shuffled. Callers processing
    a batch end-to-end pass the (persisted) ``prof`` so flagging and
    acceptance share one profile computation."""
    if prof is None:
        prof = _batch_profile(batch)
    bands = lsh_bands(prof, "doc_id")
    try:
        store_bands = spark.read.parquet(_band_store_path(store_dir))
        store_profiles = spark.read.parquet(_profile_store_path(store_dir))
    except Exception:  # first batch: nothing accepted yet
        return spark.createDataFrame(
            [], "doc_id long, dup_of long, jaccard double"
        )
    cands = (
        store_bands.join(F.broadcast(bands.withColumnRenamed("doc_id", "new_id")), "band")
        .select(F.col("new_id"), F.col("doc_id").alias("dup_of"))
        .distinct()
    )
    new_sets = prof.select(
        F.col("doc_id").alias("new_id"), F.col("shingle_set").alias("sa")
    )
    with_new = new_sets.join(F.broadcast(cands), "new_id")
    inter = F.size(F.array_intersect("sa", "sb"))
    verified = (
        store_profiles.select(
            F.col("doc_id").alias("dup_of"), F.col("shingle_set").alias("sb")
        )
        .join(F.broadcast(with_new), "dup_of")
        .select(
            F.col("new_id").alias("doc_id"),
            "dup_of",
            (
                inter.cast("double")
                / (F.size("sa") + F.size("sb") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def accept_into_store(
    batch: DataFrame, store_dir: str, prof: DataFrame | None = None
) -> None:
    """Append the batch's bands + profiles to the store (bucketed by
    band hash so future joins prune partitions)."""
    if prof is None:
        prof = _batch_profile(batch)
    bands = lsh_bands(prof, "doc_id").withColumn(
        "bucket", F.pmod(F.hash("band"), F.lit(N_STORE_BUCKETS))
    )
    bands.write.mode("append").partitionBy("bucket").parquet(
        _band_store_path(store_dir)
    )
    prof.write.mode("append").parquet(_profile_store_path(store_dir))


def run_incremental_dedup(
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    flags_out_dir: str,
    threshold: float = 0.5,
) -> None:
    """The ingestion pipeline: per micro-batch, flag near-dups against
    history, write flags, then accept the batch into the store. Runs
    with availableNow (the cron-shaped drain used everywhere else);
    exactly-once per batch via the streaming checkpoint."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # one profile per batch, shared by flagging and acceptance
        prof = _batch_profile(batch).persist()
        try:
            flags = flag_against_store(
                spark, batch, store_dir, threshold, prof=prof
            )
            flags.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(flags_out_dir)
            accept_into_store(batch, store_dir, prof=prof)
        finally:
            prof.unpersist()

    q = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
