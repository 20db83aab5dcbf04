"""Data-curation queries (PII redaction, decontamination, repetition
filtering, chunking/packing, training-order shuffle) with DuckDB oracles.

Wraps ``operators/curation.py`` over the ``documents`` table. The corpus
is synthetic letter-only word soup, so the PII query *injects*
deterministic PII (derived from doc_id, identically in both engines)
before redacting — the oracle then verifies real match/replace work, not
a trivially-zero count. All aggregates and ranks are integer-valued so
the driver's value hash is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators import curation as C
from rds_pgbadger_etl_spark.sources.tables import load_table, rebalance

# ---------------------------------------------------------------------------
# PII redaction.

_EMAIL_RE = C.PII_PATTERNS["email"][0]
_IPV4_RE = C.PII_PATTERNS["ipv4"][0]
_PHONE_RE = C.PII_PATTERNS["phone"][0]


def _inject_pii(docs: DataFrame) -> DataFrame:
    """Deterministically append synthetic PII to a subset of docs."""
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" from 10.0.0."), (did % 250 + 1).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.withColumn("text", injected)


_INJECT_SQL = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || cast(doc_id AS varchar) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.0.' || cast(doc_id % 250 + 1 AS varchar)
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-' || lpad(cast(doc_id % 10000 AS varchar), 4, '0')
                 ELSE '' END
           AS text
  FROM documents
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII audit: docs containing PII, match counts per
    class, and the net length delta from redaction. The redaction itself
    is a pure map (no shuffle) — only the audit aggregate shuffles."""
    docs = _inject_pii(rebalance(load_table(spark, sf_dir, "documents")))
    n_email = C.pii_count("text", "email")
    n_ip = C.pii_count("text", "ipv4")
    n_phone = C.pii_count("text", "phone")
    return (
        docs.select(
            "source",
            n_email.alias("n_email"),
            n_ip.alias("n_ip"),
            n_phone.alias("n_phone"),
            (F.length(C.redact_pii("text")) - F.length("text"))
            .cast("bigint")
            .alias("delta"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                ((F.col("n_email") + F.col("n_ip") + F.col("n_phone")) > 0)
                .cast("bigint")
            ).alias("n_pii_docs"),
            F.sum("n_email").alias("sum_emails"),
            F.sum("n_ip").alias("sum_ips"),
            F.sum("n_phone").alias("sum_phones"),
            F.sum("delta").alias("sum_delta"),
        )
    )


_PII_SQL = f"""
WITH injected AS ({_INJECT_SQL}),
counted AS (
  SELECT source,
         length(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
         length(regexp_extract_all(text, '{_IPV4_RE}')) AS n_ip,
         length(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phone,
         length(regexp_replace(regexp_replace(regexp_replace(text,
                  '{_EMAIL_RE}', '<EMAIL>', 'g'),
                  '{_IPV4_RE}', '<IP>', 'g'),
                  '{_PHONE_RE}', '<PHONE>', 'g')) - length(text) AS delta
  FROM injected
)
SELECT source, count(*) AS n_docs,
       cast(sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END)
            AS bigint) AS n_pii_docs,
       cast(sum(n_email) AS bigint) AS sum_emails,
       cast(sum(n_ip) AS bigint) AS sum_ips,
       cast(sum(n_phone) AS bigint) AS sum_phones,
       cast(sum(delta) AS bigint) AS sum_delta
FROM counted GROUP BY source
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (8-gram overlap vs the doc_id<25 slice).

_BENCH_MAX_ID = 25


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-set sizes before/after n-gram
    decontamination against the benchmark slice."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") >= _BENCH_MAX_ID)
    kept = C.decontaminate(docs, _BENCH_MAX_ID)
    n_train = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_train"))
    n_kept = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return n_train.join(n_kept, "source", "left").select(
        "source", "n_train", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
    )


# The gram/bench/cont chain is shared with llm_ops.curation_funnel's
# oracle, which stacks the same contamination flag onto its stage-4 gate.
_DECON_CTES = f"""ws AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), w -> w <> '')[1:{C.DECON_WORD_CAP}]
           AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i + {C.DECON_NGRAM_N - 1}], ' ')
           AS gram
  FROM ws,
       unnest(generate_series(
         1, greatest(len(ws) - {C.DECON_NGRAM_N - 1}, 1)
       )) AS t(i)
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < {_BENCH_MAX_ID}),
cont AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram)
  WHERE g.doc_id >= {_BENCH_MAX_ID}
)"""

_DECON_SQL = f"""
WITH {_DECON_CTES}
SELECT d.source, count(*) AS n_train,
       cast(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_kept
FROM documents d LEFT JOIN cont c ON c.doc_id = d.doc_id
WHERE d.doc_id >= {_BENCH_MAX_ID}
GROUP BY d.source
"""


# ---------------------------------------------------------------------------
# Repetition / boilerplate gate.


def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repetition audit: flagged-doc counts and word-stat
    sums from the Gopher-style top-word-dominance gate."""
    docs = load_table(spark, sf_dir, "documents")
    stats = C.repetition_stats(rebalance(docs))
    return (
        stats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("flagged").cast("bigint").alias("n_flagged"),
            F.sum("n_words").alias("sum_words"),
            F.sum("n_distinct").alias("sum_distinct"),
            F.sum("top_cnt").alias("sum_top"),
        )
    )


_REPETITION_SQL = f"""
WITH words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
),
wc AS (SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY doc_id, w),
stats AS (
  SELECT doc_id, cast(sum(cnt) AS bigint) AS n_words,
         count(*) AS n_distinct, max(cnt) AS top_cnt
  FROM wc GROUP BY doc_id
)
SELECT d.source, count(*) AS n_docs,
       cast(sum(CASE WHEN s.top_cnt * 100 > s.n_words * {C.REPETITION_PCT}
                     THEN 1 ELSE 0 END) AS bigint) AS n_flagged,
       cast(sum(s.n_words) AS bigint) AS sum_words,
       cast(sum(s.n_distinct) AS bigint) AS sum_distinct,
       cast(sum(s.top_cnt) AS bigint) AS sum_top
FROM stats s JOIN documents d USING (doc_id)
GROUP BY d.source
"""


# ---------------------------------------------------------------------------
# Sequence chunking + contiguous packing.


def chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 64-token windows per doc (one row per chunk)."""
    docs = rebalance(load_table(spark, sf_dir, "documents"))
    return C.chunk_windows(docs)


_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         (length(text) - length(replace(text, ' ', '')) + 1) AS toks
  FROM documents
)
SELECT doc_id, cast(i AS int) AS chunk_id,
       cast(least({C.CHUNK_TOKENS}, toks - i * {C.CHUNK_TOKENS}) AS bigint)
         AS chunk_tokens
FROM t,
     unnest(generate_series(
       0, (toks + {C.CHUNK_TOKENS - 1}) // {C.CHUNK_TOKENS} - 1
     )) AS u(i)
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, bin) packing summary from the contiguous
    cumulative-offset packer."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        C.pack_bins(docs)
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("sum_tokens"),
        )
    )


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         (length(text) - length(replace(text, ' ', '')) + 1) AS toks
  FROM documents
),
c AS (
  SELECT doc_id, source, toks,
         sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source, cast((cum - toks) // {C.PACK_BUDGET} AS bigint) AS bin,
       count(*) AS n_docs, cast(sum(toks) AS bigint) AS sum_tokens
FROM c GROUP BY source, bin
"""


# ---------------------------------------------------------------------------
# Deterministic training-order shuffle.

_SHUFFLE_TOPN = 100


def training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N docs of the seeded-hash global permutation. The sort is
    a top-K (TakeOrderedAndProject — no full global sort); the position
    window runs on the N collected survivors only."""
    docs = load_table(spark, sf_dir, "documents")
    top = (
        docs.select(
            "doc_id", C.training_order_key("doc_id").alias("shuffle_key")
        )
        .orderBy("shuffle_key")
        .limit(_SHUFFLE_TOPN)
    )
    # Partition the N-row window by a column-derived constant (pmod ≡ 0,
    # non-foldable) so it is a partitioned window over the limit's single
    # output partition — same result as the global window, without the
    # "moving all data to a single partition" WindowExec warning.
    w = Window.partitionBy(F.pmod("shuffle_key", F.lit(1))).orderBy("shuffle_key")
    return top.withColumn("pos", F.row_number().over(w).cast("int"))


_TRAINING_ORDER_SQL = f"""
SELECT doc_id, shuffle_key,
       cast(row_number() OVER (ORDER BY shuffle_key) AS int) AS pos
FROM (
  SELECT doc_id,
         cast('0x' || substr(md5('{C.SHUFFLE_SEED}' || cast(doc_id AS varchar)),
                             1, 15) AS bigint) AS shuffle_key
  FROM documents
)
ORDER BY shuffle_key LIMIT {_SHUFFLE_TOPN}
"""


# ---------------------------------------------------------------------------
# Stratified exact-k sampling: exactly k docs per (lang, source) stratum,
# chosen uniformly-at-random but deterministically (seeded-hash order) —
# the eval-holdout / per-stratum mixing primitive. Same one-shuffle rank
# shape as top-k-per-group; the hash order makes it a sample, not a top.

_STRATUM_K = 2


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-phase per-stratum pick (few strata — see similarity.topk_per_key)
    from rds_pgbadger_etl_spark.operators.similarity import topk_per_key

    docs = load_table(spark, sf_dir, "documents")
    return (
        topk_per_key(
            docs.select(
                "lang", "source", "doc_id",
                C.training_order_key("doc_id", seed="strat:").alias("skey"),
            ),
            ["lang", "source"],
            [F.col("skey").asc(), F.col("doc_id").asc()],
            _STRATUM_K,
        )
        .withColumn("rk", F.col("rank").cast("int"))
        .drop("skey", "rank")
    )


_STRATIFIED_SQL = f"""
SELECT lang, source, doc_id, rk FROM (
  SELECT lang, source, doc_id,
         cast(row_number() OVER (
           PARTITION BY lang, source
           ORDER BY cast('0x' || substr(md5('strat:' || cast(doc_id AS varchar)),
                                        1, 15) AS bigint)
         ) AS int) AS rk
  FROM documents
) WHERE rk <= {_STRATUM_K}
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: assignment is a pure function of
# doc_id (seeded md5 bucket in [0,100): <90 train, <95 val, else test),
# so re-running on grown or re-partitioned data never moves an existing
# document between splits — the property that keeps eval sets
# uncontaminated across pipeline re-runs. Map-side expression + one
# hash-agg; no shuffle beyond the small rollup.

_SPLIT_SEED = "split:"


def _split_bucket(col) -> "F.Column":
    return C.training_order_key(col, seed=_SPLIT_SEED) % 100


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = _split_bucket("doc_id")
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("first_doc"),
    )


_SPLIT_BUCKET_SQL = (
    f"cast('0x' || substr(md5('{_SPLIT_SEED}' || cast(doc_id AS varchar)),"
    f" 1, 15) AS bigint) % 100"
)
_TRAIN_VAL_TEST_SQL = f"""
SELECT CASE WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       cast(sum(n_chars) AS bigint) AS sum_chars,
       cast(min(doc_id) AS bigint) AS first_doc
FROM documents
GROUP BY split, lang
"""


# ---------------------------------------------------------------------------
# Packing-efficiency report: how well the contiguous cumulative-offset
# packer fills its token budget per source — bins used, tokens packed,
# capacity, and the waste the trainer would pad over. Pure derivation
# from pack_bins (one extra hash aggregate); fill_pct kept integer
# (basis points) for bit-stable hashing.


def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_bin = (
        C.pack_bins(docs)
        .groupBy("source", "bin")
        .agg(F.sum("toks").alias("bin_tokens"))
    )
    return (
        per_bin.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("bin_tokens").alias("sum_tokens"),
        )
        .select(
            "source",
            "n_bins",
            "sum_tokens",
            (F.col("n_bins") * C.PACK_BUDGET).alias("capacity"),
            F.floor(
                (F.col("sum_tokens") * 10000)
                / (F.col("n_bins") * C.PACK_BUDGET)
            ).cast("bigint").alias("fill_bp"),
        )
    )


_PACK_EFF_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         (length(text) - length(replace(text, ' ', '')) + 1) AS toks
  FROM documents
),
c AS (
  SELECT doc_id, source, toks,
         sum(toks) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
per_bin AS (
  SELECT source, cast((cum - toks) // {C.PACK_BUDGET} AS bigint) AS bin,
         sum(toks) AS bin_tokens
  FROM c GROUP BY source, bin
)
SELECT source,
       count(*) AS n_bins,
       cast(sum(bin_tokens) AS bigint) AS sum_tokens,
       cast(count(*) * {C.PACK_BUDGET} AS bigint) AS capacity,
       cast((sum(bin_tokens) * 10000) // (count(*) * {C.PACK_BUDGET}) AS bigint)
         AS fill_bp
FROM per_bin
GROUP BY source
"""


QUERIES = {
    "pii_redaction": (pii_redaction, _PII_SQL),
    "stratified_sample": (stratified_sample, _STRATIFIED_SQL),
    "decontaminate": (decontaminate, _DECON_SQL),
    "repetition_filter": (repetition_filter, _REPETITION_SQL),
    "chunk_windows": (chunk_windows, _CHUNK_SQL),
    "pack_sequences": (pack_sequences, _PACK_SQL),
    "training_order": (training_order, _TRAINING_ORDER_SQL),
    "train_val_test_split": (train_val_test_split, _TRAIN_VAL_TEST_SQL),
    "packing_efficiency": (packing_efficiency, _PACK_EFF_SQL),
}
