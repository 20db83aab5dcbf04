"""Deduplication operators (SURVEY X1/X2): exact, MinHash-LSH, SimHash,
n-gram Jaccard.

All hashing goes through md5-based integer/string hashes
(functions/scalar.hex_hash64) rather than Spark's xxhash64 so the DuckDB
oracle can reproduce every stage bit-for-bit (plans/llm_ops.py).

Scale design (100 TB):
- Exact dedup is a hash-aggregate on the dedup key — one shuffle,
  map-side combine. For multi-TB corpora dedup on ``md5(text)`` (16
  bytes) rather than the full text to keep shuffle rows narrow.
- MinHash: shingling explodes each doc into ~len(text) rows, but the
  explode is map-side only — the single shuffle is the per-doc min
  aggregation (codegen HashAggregate: the mins are over hex→bigint
  hashes, never strings), whose output is 4 bigints + the distinct
  shingle set per doc. Band buckets then join doc↔doc only within equal
  bands (the LSH trick: candidate pairs ∝ true near-dups, not n²).
- SimHash: one explode + one aggregate; 16 bit-sums per doc.
- Pairwise Jaccard runs ONLY on LSH candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MINHASH = 4  # signatures per doc, from disjoint 8-hex chunks of one md5
SHINGLE_K = 16
TEXT_CAP = 512  # shingle at most this many chars per doc (cost bound)
SIMHASH_BITS = 16


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """X1: keep one row per distinct key (all columns when cols is None)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def char_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    cap: int = TEXT_CAP,
) -> DataFrame:
    """Explode each doc into its k-char shingles: (id, shingle).

    The explode amplifies ~cap× — rebalance first so a single small
    input split cannot serialize the downstream hash aggregate.
    """
    from rds_pgbadger_etl_spark.sources.tables import rebalance

    df = rebalance(df)
    capped = F.substring(F.col(text_col), 1, cap)
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(capped) - (k - 1), F.lit(1)))
    ).alias("pos")
    return df.select(F.col(id_col), capped.alias("_t"), pos).select(
        id_col, F.col("_t").substr(F.col("pos"), F.lit(k)).alias("shingle")
    )


def _sig_cols(n: int = N_MINHASH) -> list[Column]:
    """n MinHash aggregates from ONE md5 per shingle.

    The digest's disjoint 8-hex chunks are independent uniform 32-bit
    hashes, so min of chunk i across shingles gives n MinHash estimators
    for the price of one md5 per shingle (codegen CSEs the digest).
    Each chunk is converted hex→bigint BEFORE the min: min over a
    *numeric* runs in codegen HashAggregate, whereas min over a string
    forces a SortAggregate that sorts the whole exploded shingle stream
    (measured ~10× slower at sf0.1).
    """
    digest = F.md5(F.col("shingle"))
    return [
        F.min(
            F.conv(F.substring(digest, 1 + 8 * i, 8), 16, 10).cast("bigint")
        ).alias(f"sig{i + 1}")
        for i in range(n)
    ]


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", n: int = N_MINHASH
) -> DataFrame:
    """Per-doc MinHash signature: (id, sig1..sign) — one row per doc."""
    return shingles.groupBy(id_col).agg(*_sig_cols(n))


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Two bands of two signatures each → (id, band) rows. Docs agreeing
    on ANY band become candidate pairs."""
    b1 = F.md5(F.concat_ws(":", "sig1", "sig2"))
    b2 = F.md5(F.concat_ws(":", "sig3", "sig4"))
    return signatures.select(
        id_col, F.explode(F.array(b1, b2)).alias("band")
    ).distinct()


# Auto hot-band cap: a corpus user should not have to KNOW the
# quadratic-boilerplate failure mode to be protected from it, so the
# banded pair generators default to an auto threshold computed from the
# band-frequency table itself: cap = max(FLOOR, FACTOR x MEDIAN band
# frequency). The median — not the mean — because the hot keys being
# guarded against are exactly the outliers that would drag a mean up
# (one band carried by half the corpus doubles the mean but leaves the
# median at 1, so the guard still fires). On healthy corpora (bands
# near-unique, median 1) the cap sits at the FLOOR, far above any
# legitimate near-dup family at fixture scale — the registered oracles
# are unchanged — while a degenerate key (boilerplate template, black
# frame, silence) carried by a corpus-scale fraction blows past it and
# is excluded before the self-join. FLOOR=64 bounds any surviving
# band's contribution to <= 64^2/2 candidate rows; FACTOR=8 keeps the
# cap proportional on corpora whose bands are legitimately denser.
AUTO_BAND_FREQ_FLOOR = 64
AUTO_BAND_FREQ_FACTOR = 8


def resolve_band_freq_cap(band_counts: DataFrame, max_band_freq) -> int | None:
    """``"auto"`` → max(FLOOR, FACTOR × median band frequency), one
    aggregate over ``band_counts`` (one row per band value with its
    frequency as ``_n`` — the same table the hot-set filter consumes);
    an int passes through; None disables the cap."""
    if max_band_freq is None or isinstance(max_band_freq, int):
        return max_band_freq
    med = band_counts.agg(
        F.percentile_approx("_n", 0.5).alias("m")
    ).first().m
    if med is None:
        return AUTO_BAND_FREQ_FLOOR
    return max(AUTO_BAND_FREQ_FLOOR, AUTO_BAND_FREQ_FACTOR * int(med))


def candidate_pairs(
    bands: DataFrame,
    id_col: str = "doc_id",
    max_band_freq: int | str | None = "auto",
) -> DataFrame:
    """Self-join on band → unordered candidate pairs (a < b).

    ``max_band_freq`` is the hot-key guard for corpora with huge
    near-identical boilerplate families: a band value carried by f docs
    contributes f^2/2 candidate rows, so one template repeated across a
    large corpus fraction turns the equi-join quadratic. Buckets past
    the cap are excluded via a broadcast anti-join (the hot set is a
    handful of values by construction). Recall cost: a true pair is
    lost only when EVERY band it shares is hot — i.e. pairs that are
    themselves members of the giant template family, which exact dedup
    upstream (or one canonical representative per hot bucket) should
    own. Default ``"auto"`` (see resolve_band_freq_cap): on healthy
    corpora the threshold sits far above real families and the output
    is identical to the uncapped join the fixture-scale oracle twins
    model; pass an int to pin it or None to disable. Same knob and
    rationale as multimodal.hamming_band_pairs. When a cap is active
    ``bands`` is persisted first — the cap aggregate, the hot-set
    groupBy, and both sides of the self-join re-read it, and without
    materialization each consumer would re-derive the upstream band
    shuffle."""
    if max_band_freq is not None:
        bands = bands.persist()
        counts = bands.groupBy("band").agg(F.count(F.lit(1)).alias("_n"))
        cap = resolve_band_freq_cap(counts, max_band_freq)
        hot = counts.filter(F.col("_n") > cap).select("band")
        bands = bands.join(F.broadcast(hot), "band", "left_anti")
    left = bands.select(F.col(id_col).alias("a"), "band")
    right = bands.select(F.col(id_col).alias("b"), "band")
    return (
        left.join(right, "band")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def shingle_profile(
    shingles: DataFrame, id_col: str = "doc_id", n: int = N_MINHASH
) -> DataFrame:
    """ONE shuffle producing everything LSH dedup needs per doc: the
    distinct shingle set (for exact Jaccard verify) and the MinHash sigs.

    The explode + hash-aggregate stays inside whole-stage codegen, which
    on this workload is ~20× faster than the equivalent per-row
    higher-order ``transform``/``array_min`` pipeline (lambda bodies are
    interpreted, not codegen'd). Map-side partial aggregation keeps the
    shuffle narrow; output is one row per doc.
    """
    return shingles.groupBy(id_col).agg(
        F.collect_set("shingle").alias("shingle_set"), *_sig_cols(n)
    )


# Auto verify-strategy cutover: the dedup rehearsal (BENCH_NOTES.md)
# measured the broadcast verify going 3.0× superlinear at ~1.8·10⁵
# candidate pairs (pair rows carrying shingle sets materialize on the
# driver); below ~10⁵ the broadcast plan wins by skipping the pair-side
# shuffles entirely.
AUTO_VERIFY_PAIRS = 100_000


def resolve_verify_strategy(strategy: str, cands: DataFrame) -> str:
    """``"auto"`` → ``"broadcast"`` or ``"shuffle"`` by candidate count.

    The count is cheap where it matters: every pipeline here persists
    ``cands`` before verification (the band self-join feeds multiple
    consumers), so counting materializes work that the verify join needs
    anyway. Explicit strategies pass through untouched.
    """
    if strategy != "auto":
        return strategy
    return "shuffle" if cands.count() > AUTO_VERIFY_PAIRS else "broadcast"


def _verify_join(
    pairs: DataFrame,
    profile: DataFrame,
    id_col: str,
    strategy: str,
) -> DataFrame:
    """(a, b, sa, sb) rows — each candidate pair joined to both sides'
    shingle sets — via one of two join shapes shared by the whole dedup
    family (Jaccard AND containment verify score over the same rows):

    ``"broadcast"`` (right when the candidate side is small, the common
    high-precision-LSH case): both joins broadcast and the set
    intersection runs per-pair on two in-memory arrays — no exploded
    shingle join, no pair-level shuffle. The broadcasts are forced, not
    left to AQE: the first broadcasts the bare (a, b) id pairs against
    the partitioned profile; the second broadcasts that result (|pairs|
    rows, each shingle_set capped at TEXT_CAP entries).

    ``"shuffle"`` — for candidate volumes past what a driver should
    collect (the second broadcast materializes |pairs| shingle sets
    driver-side; the dedup rehearsal measured it going superlinear past
    ~10⁵ pairs, BENCH_NOTES.md): two hash-partitioned joins keyed on
    the pair ids; the profile shuffles once per side, nothing lands on
    the driver, and pair volume is bounded by the cluster.

    ``"auto"`` — :func:`resolve_verify_strategy` picks by |pairs|.
    """
    strategy = resolve_verify_strategy(strategy, pairs)
    prof_a = profile.select(F.col(id_col).alias("a"), F.col("shingle_set").alias("sa"))
    prof_b = profile.select(F.col(id_col).alias("b"), F.col("shingle_set").alias("sb"))
    if strategy == "shuffle":
        return pairs.select("a", "b").join(prof_a, "a").join(prof_b, "b")
    with_a = prof_a.join(F.broadcast(pairs.select("a", "b")), "a")
    return prof_b.join(F.broadcast(with_a), "b")


def pair_jaccard(
    pairs: DataFrame,
    profile: DataFrame,
    id_col: str = "doc_id",
    strategy: str = "broadcast",
) -> DataFrame:
    """Exact Jaccard over per-doc distinct shingle sets for given pairs.

    Join shape (broadcast vs shuffle vs auto) is :func:`_verify_join`'s
    — shared with the containment score so every verifier in the family
    gets the same scale escape hatch.
    """
    inter = F.size(F.array_intersect("sa", "sb"))
    jaccard = (
        inter.cast("double")
        / (F.size("sa") + F.size("sb") - inter).cast("double")
    ).alias("jaccard")
    return _verify_join(pairs, profile, id_col, strategy).select(
        "a", "b", jaccard
    )


def candidate_shingle_sets(
    df: DataFrame,
    cands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingler=None,
) -> DataFrame:
    """Distinct shingle sets for ONLY the docs appearing in candidate
    pairs: (id, shingle_set). Verification needs full sets, but only for
    LSH survivors (∝ true near-dups, a sliver of the corpus) — building
    sets for every doc via collect_set materializes ~all corpus text in
    aggregation buffers, which is the part of the old single-pass profile
    that could not survive 100 TB. Re-shingling the survivors is a
    broadcast-semi-join-pruned second pass over a tiny subset instead.
    Measured at sf0.1: full-corpus profile 7.4 s vs 3.8 s sigs-only +
    2.2 s candidate sets (598 of 5000 docs).

    ``shingler`` picks the tokenization (default :func:`char_shingles`;
    pass a :func:`word_ngrams` closure for token-level dedup) — the
    candidate-pruned second pass is identical either way.
    """
    if shingler is None:
        shingler = char_shingles
    ids = (
        cands.select(F.col("a").alias(id_col))
        .union(cands.select(F.col("b").alias(id_col)))
        .distinct()
    )
    sub = shingler(df.join(F.broadcast(ids), id_col), id_col, text_col)
    return sub.groupBy(id_col).agg(F.collect_set("shingle").alias("shingle_set"))


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    verify_strategy: str = "auto",
    max_band_freq: int | str | None = "auto",
) -> DataFrame:
    """X2 end-to-end: shingle → MinHash → LSH bands → candidates →
    Jaccard verify → pairs above threshold. ``verify_strategy="auto"``
    counts the (persisted) candidates and picks broadcast below
    ``AUTO_VERIFY_PAIRS``, shuffle above — the rehearsal-measured
    cutover, applied without the caller having to know it exists.

    Two passes by design: pass 1 aggregates numeric MinHash sigs only
    (narrow shuffle, no arrays); pass 2 re-shingles just the candidate
    docs for exact-set verification (:func:`candidate_shingle_sets`).
    The sigs are persisted — the band self-join references them twice,
    and without materialization Catalyst re-derives the whole
    explode+aggregate per reference. At 100 TB sigs are the ~1%-of-corpus
    compressed representation you'd write to a table; in-session
    MEMORY_AND_DISK persistence is the local equivalent.
    """
    sigs = minhash_signatures(char_shingles(df, id_col, text_col), id_col).persist()
    # cands feeds both the ids derivation and the final pair join —
    # persist so the band self-join over sigs runs once, not per consumer.
    cands = candidate_pairs(
        lsh_bands(sigs, id_col), id_col, max_band_freq
    ).persist()
    prof = candidate_shingle_sets(df, cands, id_col, text_col)
    return pair_jaccard(cands, prof, id_col, strategy=verify_strategy).filter(
        F.col("jaccard") >= threshold
    )


def _containment_score(verified: DataFrame) -> DataFrame:
    """|A∩B| / min(|A|,|B|) over (a, b, sa, sb) verify rows."""
    inter = F.size(F.array_intersect("sa", "sb"))
    return verified.select(
        "a",
        "b",
        (
            inter.cast("double")
            / F.least(F.size("sa"), F.size("sb")).cast("double")
        ).alias("containment"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    verify_strategy: str = "auto",
) -> DataFrame:
    """Containment scoring over LSH candidate pairs: |A∩B| / min(|A|,|B|)
    — catches subset duplication (one doc quoting/excerpting another)
    that symmetric Jaccard under-scores when sizes differ. Same plan
    shape as :func:`near_dup_pairs` (profile → bands → candidates →
    verify), and the verify join is the SAME two-path
    :func:`_verify_join` — the broadcast shape the rehearsal measured
    going 3.0× superlinear past ~10⁵ candidates is no longer hard-coded
    here; ``"auto"`` picks shuffle past ``AUTO_VERIFY_PAIRS``.

    Recall caveat, documented on purpose: MinHash bands collide by
    RESEMBLANCE, so a tiny doc fully contained in a huge one may never
    become a candidate here; :func:`containment_prefix_pairs` is the
    dedicated pipeline that recovers exactly that recall (prefix-filter
    candidates on the smaller side's rarest shingles) — the verify math
    is shared.
    """
    sigs = minhash_signatures(char_shingles(df, id_col, text_col), id_col).persist()
    cands = candidate_pairs(lsh_bands(sigs, id_col), id_col).persist()
    prof = candidate_shingle_sets(df, cands, id_col, text_col)
    return _containment_score(
        _verify_join(cands, prof, id_col, verify_strategy)
    ).filter(F.col("containment") >= threshold)


def containment_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    verify_strategy: str = "auto",
) -> DataFrame:
    """Containment with GUARANTEED recall via prefix filtering (the
    AllPairs/PPJoin candidate scheme, adapted to the min-side
    containment denominator) — the recovery pipeline for the recall gap
    :func:`containment_pairs` documents: resemblance bands need the
    pair to LOOK alike overall, so a 1-shingle excerpt inside a
    1000-shingle host never collides; prefix filtering only needs ONE
    shared rare shingle.

    Exactness argument (pigeonhole): take each doc's distinct shingles
    in a global canonical order and call the first
    ``floor((1-t)·|S|) + 1`` its *prefix*. For a pair (A, B) with
    containment ≥ t, the smaller side A misses at most ``(1-t)·|A|``
    of its shingles from B — fewer than its prefix length — so at
    least one prefix shingle of A appears in B. Joining every doc's
    prefix against every doc's full shingle postings therefore
    generates a SUPERSET of all qualifying pairs; the exact verify then
    makes the output precisely "all pairs with containment ≥ t"
    (candidate-order-independent, hence SQL-oracle-checkable by the
    same formula).

    The canonical order is ascending *document frequency* (ties by
    shingle) — the PPJoin ordering: prefixes hold each doc's RAREST
    shingles, so the postings actually probed are the short tails of
    the df distribution, which simultaneously shrinks the candidate
    join and removes the hot-key skew a hash order would hit on common
    shingles. All orderings are correct; frequency order is the one
    that scales.

    Plan: one exploded-shingle aggregation for (doc, shingle) distinct
    rows, one tiny df-count aggregate, a rank window partitioned BY DOC
    (bounded at TEXT_CAP rows per partition — no corpus-sized window),
    the prefix⋈postings equi-join on shingle, then the shared
    :func:`_verify_join` + :func:`_containment_score`.
    """
    from pyspark.sql import Window

    sh = char_shingles(df, id_col, text_col).distinct().persist()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    w = Window.partitionBy(id_col).orderBy("_df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_sz", F.count("*").over(Window.partitionBy(id_col)))
    )
    # Exact-integer guard: when (1-t)·|S| is mathematically an integer
    # (t=0.8, |S|=5 → 1.0) the FP product can land one ulp BELOW it
    # (0.2·5 = 0.9999999999999998) and floor() would shorten the prefix
    # by one — dropping pairs whose containment sits exactly at the
    # threshold and voiding the pigeonhole guarantee. |S| ≤ TEXT_CAP=512
    # bounds the FP error at ~1e-13, so +1e-9 corrects every
    # exactly-integer case without ever crossing a genuinely
    # non-integer value; over-length prefixes only ADD candidates
    # (still a superset — the verify stays exact).
    prefix_len = F.floor(F.lit(1.0 - threshold) * F.col("_sz") + F.lit(1e-9)) + 1
    prefix = ranked.filter(F.col("_rk") <= prefix_len).select(
        F.col(id_col).alias("_pa"), "shingle"
    )
    postings = sh.select(F.col(id_col).alias("_pb"), "shingle")
    cands = (
        prefix.join(postings, "shingle")
        .filter(F.col("_pa") != F.col("_pb"))
        .select(
            F.least("_pa", "_pb").alias("a"),
            F.greatest("_pa", "_pb").alias("b"),
        )
        .distinct()
        .persist()
    )
    prof = candidate_shingle_sets(df, cands, id_col, text_col)
    return _containment_score(
        _verify_join(cands, prof, id_col, verify_strategy)
    ).filter(F.col("containment") >= threshold)


WORD_NGRAM_N = 3
WORD_CAP = 256  # n-gram at most this many words per doc (cost bound)


def word_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = WORD_NGRAM_N,
    cap: int = WORD_CAP,
) -> DataFrame:
    """Explode each doc into space-joined word n-grams: (id, shingle).

    Same output shape as :func:`char_shingles`, so the whole MinHash →
    LSH → Jaccard machinery applies unchanged to token-level dedup.
    """
    from rds_pgbadger_etl_spark.sources.tables import rebalance

    df = rebalance(df)
    words = F.slice(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != ""), 1, cap
    )
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    ).alias("pos")
    return df.select(F.col(id_col), words.alias("_w"), pos).select(
        id_col,
        F.concat_ws(" ", F.slice("_w", F.col("pos"), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = WORD_NGRAM_N,
    threshold: float = 0.4,
) -> DataFrame:
    """X2 token-level near-dup: word n-grams → MinHash → LSH bands →
    exact n-gram Jaccard on candidates → pairs above threshold.
    Same two-pass shape as :func:`near_dup_pairs`: numeric sigs for the
    whole corpus, n-gram sets only for LSH survivors."""
    sigs = minhash_signatures(word_ngrams(df, id_col, text_col, n), id_col).persist()
    cands = candidate_pairs(lsh_bands(sigs, id_col), id_col).persist()
    prof = candidate_shingle_sets(
        df,
        cands,
        id_col,
        text_col,
        shingler=lambda d, i, t: word_ngrams(d, i, t, n),
    )
    return pair_jaccard(cands, prof, id_col).filter(F.col("jaccard") >= threshold)


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash over whitespace tokens: per bit, majority vote of token
    hashes; near-dups share (or almost share) the fingerprint."""
    from rds_pgbadger_etl_spark.functions.scalar import hex_hash64
    from rds_pgbadger_etl_spark.sources.tables import rebalance

    df = rebalance(df)
    words = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    h = hex_hash64(F.col("w"), seed="simhash:")
    per_bit = [
        F.sum(
            (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = words.groupBy(id_col).agg(*per_bit)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select(id_col, fp.cast("bigint").alias("simhash"))


def connected_components(
    edges: DataFrame,
    src_col: str = "a",
    dst_col: str = "b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components by min-label propagation: each vertex's label
    converges to the smallest vertex id in its component.

    Iterative DataFrame algorithm (the one genuinely iterative operator in
    the engine): per round, every vertex takes (1) the min of its own
    label and its neighbors' labels, then (2) a pointer-jump — its
    label's own label (``component ← label(component)``, valid because a
    label is always a vertex id in the same component). Step 1 alone
    needs diameter rounds; the jump doubles the resolved pointer distance
    per round, so long chains (the LSH-adversarial case: near-dup pairs
    forming a path, not a clique) converge in O(log n) rounds — same
    bound as the large-star/small-star alternation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") with simpler per-
    round plans: one groupBy + two joins, each shuffling (vertex, label)
    pairs only. ``localCheckpoint`` truncates the lineage so round N's
    plan doesn't replay rounds 1..N-1.

    Returns (vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id of the component. Convergence is detected
    by the (monotonically decreasing) sum of labels going stable: both
    steps only ever lower a label, so a stable sum is a fixed point —
    labels constant across every edge, i.e. per-component minima.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for rnd in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.src == labels.vertex)
            .select(F.col("dst").alias("vertex"), "component")
            .groupBy("vertex")
            .agg(F.min("component").alias("nbr_min"))
        )
        # checkpointed: referenced twice by the jump self-join below —
        # without materialization Catalyst would re-run the propagate
        # join+aggregate once per reference
        propagated = (
            labels.join(nbr_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        cur_sum = propagated.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            # propagate fixed point: labels constant across every edge,
            # so the jump is provably a no-op — skip it and stop. The
            # common LSH-clique case exits here after ~2 rounds having
            # paid for zero jump joins beyond the converged rounds.
            labels = propagated
            break
        if rnd < 2:
            # LSH near-dup components are overwhelmingly pairs/cliques
            # (diameter <= 2) that converge within two propagate rounds;
            # don't pay the jump's extra self-join until propagation has
            # demonstrably not finished the graph off.
            labels = propagated
            prev_sum = cur_sum
            continue
        # pointer jump: component <- label(component). Left join: a
        # label is itself a vertex, so the lookup hits unless already
        # the component min (then coalesce keeps it). Only runs while
        # still converging — this is what turns diameter rounds into
        # O(log n) on chain-shaped components.
        lookup = propagated.select(
            F.col("vertex").alias("l_vertex"),
            F.col("component").alias("l_component"),
        )
        labels = (
            propagated.join(
                lookup, propagated.component == lookup.l_vertex, "left"
            )
            .select(
                "vertex",
                F.coalesce("l_component", "component").alias("component"),
            )
            .localCheckpoint()
        )
        prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    return labels


def dedup_cluster_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Full near-dup clustering: pairs (X2) → connected components →
    (id, component, is_canonical) for EVERY document; singletons are
    their own component. ``is_canonical`` (int 0/1) marks the one doc
    per component a pretraining pipeline keeps (min id — deterministic).

    ``pairs`` lets callers reuse an already-materialized near-dup pair
    table (the pair stream is the expensive intermediate — compute it
    once per corpus, feed every consumer)."""
    if pairs is None:
        pairs = near_dup_pairs(df, id_col, text_col, threshold)
    comp = connected_components(pairs, "a", "b")
    out = (
        df.select(id_col)
        .join(comp, F.col(id_col) == F.col("vertex"), "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )
    return out.withColumn(
        "is_canonical", (F.col("component") == F.col(id_col)).cast("int")
    )


SPAN_GRAM_N = 8       # tokens per positional gram
SPAN_MIN_RUN = 20     # remove runs of at least this many shared tokens
SPAN_TOKEN_CAP = 512  # max tokens considered per doc (cost bound)


def span_removal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = SPAN_GRAM_N,
    min_run: int = SPAN_MIN_RUN,
    token_cap: int = SPAN_TOKEN_CAP,
) -> DataFrame:
    """Duplicate-span REMOVAL (ExactSubstr dedup, Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" §4.1 —
    the removal complement to the pair DETECTORS above): delete from
    every document each run of >= ``min_run`` consecutive tokens whose
    content also appears in an EARLIER document (first occurrence wins;
    canonical order = ``id_col``), returning
    ``(id, n_tokens, n_removed, clean_text)`` — fully-duplicated docs
    stay present with ``clean_text = ''``.

    Scale design (100 TB): duplicated-ness of a position needs only
    gram-hash grain — an occurrence is duplicated iff min(id) over its
    hash is an earlier doc — so the plan is explode →
    groupBy(h).min(id) → 1:1 equi-join back → per-doc gaps-and-islands
    → bounded interval explode → reassemble. There is NO doc×doc join
    anywhere (join output = |gram occurrences|), so boilerplate cannot
    go quadratic and no doc-frequency cap is needed; skew on
    mega-frequent hashes is absorbed by the map-side partial min and a
    1:1 probe. The paper's suffix array is a single-node batch
    structure; this expresses the same semantics as three shuffles on
    narrow keys. Linearity is measured at 1x/2x/4x GB corpora by
    tools/dedup_rehearsal.py (span-removal leg, BENCH_NOTES).

    Within-doc repeats (first occurrence in the SAME doc) are kept: the
    op removes cross-document duplication only, which keeps "first
    occurrence survives" well-defined."""
    from pyspark.sql import Window

    tk = F.slice(F.split(F.col(text_col), " "), 1, token_cap)
    t = docs.select(id_col, tk.alias("tk"))
    grams_arr = F.when(
        F.size("tk") >= gram_n,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - (gram_n - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, gram_n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select(id_col, F.posexplode(grams_arr).alias("p0", "gram")).select(
        id_col, (F.col("p0") + 1).alias("pos"), F.md5("gram").alias("h")
    )
    firsts = g.groupBy("h").agg(F.min(id_col).alias("fdoc"))
    dup = (
        g.join(firsts, "h")
        .filter(F.col(id_col) > F.col("fdoc"))
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "grp")
        .agg(F.min("pos").alias("p_lo"), F.count(F.lit(1)).alias("m"))
        .withColumn("run_tokens", F.col("m") + F.lit(gram_n - 1))
        .filter(F.col("run_tokens") >= min_run)
        .select(
            id_col,
            "p_lo",
            (F.col("p_lo") + F.col("run_tokens") - 1).alias("p_hi"),
        )
    )
    # Reassembly runs on the doc's token ARRAY, not an exploded token
    # stream: runs collapse to a per-doc ranges array (a handful of
    # (p_lo, p_hi) structs — bounded by token_cap/min_run per doc), one
    # 1:1 equi-join attaches them to the doc row, and a position-aware
    # higher-order filter drops covered tokens entirely inside codegen.
    # The pre-r14 shape re-exploded every doc to per-token rows, joined
    # them against an exploded+distinct'd covered-position table on
    # (id, pos), and rebuilt the text with collect_list + array_sort —
    # two extra corpus-volume shuffles (the (id, pos) join and the
    # reassembly aggregate) plus a sort per doc, all to compute what a
    # filter over the already-in-hand array expresses directly.
    # Overlapping runs (maximal in GRAM positions; their +n-1-token
    # tails overlap) need no dedup here: `exists` over the ranges array
    # is naturally idempotent where the old covered-position explode
    # needed a distinct.
    ranges = runs.groupBy(id_col).agg(
        F.collect_list(F.struct("p_lo", "p_hi")).alias("_rs")
    )
    with_ranges = t.join(ranges, id_col, "left")
    pos_covered = lambda i: F.exists(  # noqa: E731 — 1-based token pos
        "_rs",
        lambda r: ((i + 1) >= r["p_lo"]) & ((i + 1) <= r["p_hi"]),
    )
    kept = F.when(F.col("_rs").isNull(), F.col("tk")).otherwise(
        F.filter("tk", lambda x, i: ~pos_covered(i))
    )
    return with_ranges.select(
        F.col(id_col),
        F.size("tk").cast("long").alias("n_tokens"),
        (F.size("tk") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
