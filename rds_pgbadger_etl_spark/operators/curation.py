"""Data-curation operators for large-scale training pipelines: PII
redaction, benchmark decontamination, repetition filtering, sequence
chunking/packing, and deterministic training-order shuffling.

These extend the charter's LLM-pipeline surface (SURVEY.md §2.3) beyond
dedup/similarity/text-stats with the remaining steps a pretraining data
pipeline runs between "raw corpus" and "training batches". All column
logic is built-in expressions (whole-stage codegen, SURVEY.md §2.4
policy); every operator is integer-ranked / integer-aggregated so the
DuckDB oracle (plans/curation.py) matches bit-for-bit.

Scale notes (100 TB):
- PII redaction is a pure map — no shuffle, runs inside the scan stage.
- Decontamination shuffles only (doc_id, gram) pairs; the benchmark-side
  gram set is tiny by construction (a benchmark suite, not the corpus)
  and broadcast, so the corpus never reshuffles.
- Repetition stats shuffle (doc_id, word) — bounded by corpus token
  count; partial map-side aggregation collapses repeats before shuffle.
- Chunking is a per-row explode (no shuffle); packing is one window
  cumsum per source partition — the only order-sensitive step, keyed by
  (source, doc_id) exactly like the log parser's (file, line_no).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.scalar import hex_hash64

# ---------------------------------------------------------------------------
# PII redaction. Patterns use the common RE2/Java subset (no lookaround,
# no backreferences) so Spark (java.util.regex) and DuckDB (RE2) agree.

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, replacement tag); applied in this order
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Match count for one PII pattern (bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(c, F.lit(pattern)).cast("bigint")


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its ``<TAG>``; order matters (emails
    before IPs so a dotted domain is consumed as one email, not an IP)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, tag in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, tag)
    return c


# ---------------------------------------------------------------------------
# Benchmark decontamination: drop training docs sharing any word n-gram
# with a held-out benchmark set (the standard n-gram-overlap
# decontamination used for eval hygiene).

DECON_NGRAM_N = 8
DECON_WORD_CAP = 256


def word_ngram_grams(
    docs: DataFrame,
    n: int = DECON_NGRAM_N,
    cap: int = DECON_WORD_CAP,
) -> DataFrame:
    """Distinct (doc_id, gram): space-joined word n-grams over the first
    ``cap`` words (delegates to the dedup layer's tuned explode; docs
    shorter than ``n`` words yield their full text as one short gram —
    same clamping as the oracle's list slice)."""
    from rds_pgbadger_etl_spark.operators.dedup import word_ngrams

    return (
        word_ngrams(docs, n=n, cap=cap)
        .withColumnRenamed("shingle", "gram")
        .distinct()
    )


def decontaminate(
    docs: DataFrame, bench_max_id: int, n: int = DECON_NGRAM_N
) -> DataFrame:
    """Training docs (doc_id >= bench_max_id) minus any doc sharing an
    n-gram with the benchmark slice (doc_id < bench_max_id).

    The benchmark gram set is broadcast (a benchmark is small by
    definition); the corpus-side grams are filtered to training docs
    *before* the explode so the scan prunes the benchmark rows, and the
    train grams are NOT pre-deduplicated — the broadcast semi-join
    discards almost all of them, so the only shuffle is the tiny
    contaminated-id distinct. Returns the kept training docs."""
    from rds_pgbadger_etl_spark.operators.dedup import word_ngrams

    train = docs.filter(F.col("doc_id") >= bench_max_id)
    bench_grams = (
        word_ngram_grams(docs.filter(F.col("doc_id") < bench_max_id), n)
        .select("gram")
        .distinct()
    )
    train_grams = word_ngrams(train, n=n, cap=DECON_WORD_CAP).withColumnRenamed(
        "shingle", "gram"
    )
    contaminated = (
        train_grams.join(F.broadcast(bench_grams), "gram", "leftsemi")
        .select("doc_id")
        .distinct()
    )
    return train.join(contaminated, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# Repetition / boilerplate detection (Gopher-style quality gate): a doc
# whose single most frequent word dominates is boilerplate or spam.

REPETITION_PCT = 12  # flag when top word > 12% of tokens (integer ratio)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc word statistics: token count, distinct words, top-word
    count, and the boilerplate flag ``top_cnt * 100 > n_words * PCT``
    (integer comparison — no float threshold drift vs the oracle)."""
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).alias("w"),
    )
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        (
            (F.max("cnt") * 100 > F.sum("cnt") * REPETITION_PCT).cast("int")
        ).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Sequence chunking + contiguous packing: split docs into fixed
# token-count windows, then assign docs to training bins by cumulative
# token offset — the deterministic, SQL-expressible core of sequence
# packing (a greedy best-fit packer would be order-dependent and
# non-reproducible under re-partitioning).

CHUNK_TOKENS = 64
PACK_BUDGET = 2048


def chunk_windows(docs: DataFrame, chunk: int = CHUNK_TOKENS) -> DataFrame:
    """One row per fixed-size token window: (doc_id, chunk_id,
    chunk_tokens); the last window carries the remainder. Token count is
    the whitespace count + 1 (operators/text.n_tokens)."""
    from rds_pgbadger_etl_spark.operators.text import n_tokens

    toks = n_tokens("text")
    n_chunks = F.floor((toks + (chunk - 1)) / chunk).cast("bigint")
    return (
        docs.select("doc_id", toks.alias("toks"), n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(
                F.lit(chunk), F.col("toks") - F.col("chunk_id") * chunk
            )
            .cast("bigint")
            .alias("chunk_tokens"),
        )
    )


def pack_bins(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Assign each doc to a training bin by the cumulative token offset
    of the docs before it (per source, doc_id order): ``bin =
    start_offset // budget``. The running offset is the distributed
    prefix sum (functions/agg.segmented_cumsum) — bounded
    partition-local cumsums + per-source offsets, never one sorted task
    per source; no global sort, no driver loop."""
    from rds_pgbadger_etl_spark.functions.agg import segmented_cumsum
    from rds_pgbadger_etl_spark.operators.text import n_tokens

    toks = n_tokens("text")
    return (
        segmented_cumsum(
            docs.select("doc_id", "source", toks.alias("toks")),
            ["source"],
            ["doc_id"],
            "toks",
            out_col="cum",
        )
        .select(
            "doc_id",
            "source",
            "toks",
            F.floor((F.col("cum") - F.col("toks")) / budget)
            .cast("bigint")
            .alias("bin"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic training-order shuffle: a seeded hash rank gives a
# reproducible global permutation that is stable under re-partitioning
# and resumable mid-epoch — unlike orderBy(rand()).

SHUFFLE_SEED = "ord:"


def training_order_key(col: Column | str, seed: str = SHUFFLE_SEED) -> Column:
    """60-bit shuffle key; distinct ids ⇒ collision-free in practice."""
    c = F.col(col) if isinstance(col, str) else col
    return hex_hash64(c.cast("string"), seed=seed)
