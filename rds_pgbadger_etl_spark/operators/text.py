"""Text-analysis operators (SURVEY X4): stats, language ID, token
counting, fingerprinting.

Everything is arithmetic over built-in string functions chosen to be
reproducible in the DuckDB oracle (plans/llm_ops.py):
- token counts via space-counting (length minus length-with-spaces-
  removed) instead of split(), whose empty-string edge semantics differ
  between engines;
- the language-ID heuristic is a deterministic stopword-occurrence
  argmax — the oracle replicates the heuristic, not ground truth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# occurrences of these (per language) vote for the language
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " das "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def occurrences(col: Column | str, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal substring."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def n_tokens(col: Column | str) -> Column:
    """Whitespace token count of a single-spaced text (spaces + 1)."""
    c = F.col(col) if isinstance(col, str) else col
    return (occurrences(c, " ") + 1).cast("bigint")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_RE)).cast("bigint")


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] doc-quality score: length band + stopword presence
    + low punctuation density (the usual pretraining-filter features)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = n_tokens(c).cast("double")
    len_ok = F.when((toks >= 20) & (toks <= 1000), 0.4).otherwise(0.0)
    stop_ratio = (
        occurrences(c, " the ") + occurrences(c, " a ") + occurrences(c, " of ")
    ).cast("double") / toks
    stop_ok = F.when(stop_ratio > 0.01, 0.3).otherwise(0.0)
    punct_ratio = punct_count(c).cast("double") / F.length(c).cast("double")
    punct_ok = F.when(punct_ratio < 0.1, 0.3).otherwise(0.0)
    return (len_ok + stop_ok + punct_ok).alias("quality")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-occurrence scores (padded text)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    return {
        lang: sum(occurrences(padded, m) for m in markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str) -> Column:
    """Deterministic argmax over language marker scores; ties break by
    language-code order; all-zero scores → 'und' (undetermined)."""
    scores = lang_scores(col)
    langs = sorted(LANG_MARKERS)
    best = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            cand = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            best = F.when(cand.score > best.score, cand).otherwise(best)
    return F.when(best.score > 0, best.lang).otherwise(F.lit("und"))


def rolling_fingerprint(col: Column | str, k: int = 16) -> Column:
    """Document fingerprint: min k-char-shingle hash (60-bit md5 prefix)
    over the first 512 chars (one-column winnowing; equal fingerprints ⇒
    likely overlap). Scalar variant of the shingle pipeline in
    operators/dedup.py — prefer the explode + groupBy form there for bulk
    fingerprinting: higher-order lambdas are interpreted, not codegen'd
    (measured ~20× slower at sf0.1)."""
    from rds_pgbadger_etl_spark.functions.scalar import hex_hash64

    c = F.col(col) if isinstance(col, str) else col
    capped = F.substring(c, 1, 512)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(capped) - (k - 1), F.lit(1))),
        lambda i: hex_hash64(capped.substr(i, F.lit(k))),
    )
    return F.array_min(shingles)


def heavy_hitter_words(words, threshold_div: int = 500):
    """EXACT heavy hitters (words with global freq * T > N) without a
    full-vocabulary shuffle: a per-partition frequency-threshold sketch
    prunes to candidates first, then only candidates are counted
    exactly.

    The pigeonhole guarantee makes the prune lossless: if an item's
    global frequency exceeds N/T, some partition must hold it with
    local frequency above n_p/T (otherwise the per-partition sums could
    not reach N/T), so the candidate union is a superset of every true
    heavy hitter. At 100 TB the difference is shuffling ≤ T items per
    partition versus the entire Zipf-tail vocabulary; per-partition
    counting is one vectorized ``value_counts`` per Arrow batch run —
    the justified mapInPandas shape (sequential-per-partition summary),
    not a per-row UDF.

    ``words``: a DataFrame with a single string column ``w``.
    Returns (w, freq, n_total) for items with freq * T > N, exactly.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    T = threshold_div

    def partition_candidates(batches):
        counts = None
        for pdf in batches:
            c = pdf["w"].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is None:
            return
        n_p = int(counts.sum())
        cand = counts[counts * T > n_p]
        yield pd.DataFrame({"w": cand.index.astype(str)})

    cands = words.mapInPandas(partition_candidates, "w string").distinct()
    total = words.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        words.join(F.broadcast(cands), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * T > F.col("n_total"))
    )
