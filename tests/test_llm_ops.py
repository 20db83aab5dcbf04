"""Differential + behavioral tests for the LLM-pipeline operators (X1–X5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators import dedup as D
from rds_pgbadger_etl_spark.operators import multimodal as M
from rds_pgbadger_etl_spark.operators import similarity as S
from rds_pgbadger_etl_spark.plans.llm_ops import QUERIES
from rds_pgbadger_etl_spark.sources.tables import load_table
from tests.oracle import compare

CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_llm_oracle_match(spark, sf_oracle, name, fn, sql):
    compare(fn(spark, sf_oracle), sql, sf_oracle)


def test_exact_dedup_collapses(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    doubled = docs.union(docs)
    assert D.exact_dedup(doubled).count() == docs.count()
    assert D.exact_dedup(doubled, ["doc_id"]).count() == docs.count()


def test_minhash_identical_texts_collide(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    pairs = D.near_dup_pairs(docs.union(clones), threshold=0.99).collect()
    # every doc must pair with its exact clone at jaccard 1.0
    clone_pairs = {(r.a, r.b) for r in pairs if r.b == r.a + 1_000_000}
    assert len(clone_pairs) == 20
    assert all(r.jaccard == 1.0 for r in pairs if r.b == r.a + 1_000_000)


def test_ivf_cells_assignment_is_map_only(spark, sf_smoke):
    """The IVF build pass must be MAP-ONLY (scan -> vectorized argmax
    against the closed-over quantizer): no window, no aggregate, no hash
    exchange. The previous window formulation shuffled corpus x
    n_centroids scored rows — 16x the corpus — on the expensive pass of
    an index build at 100 TB."""
    emb = load_table(spark, sf_smoke, "embeddings")
    plan = (
        S.ivf_cells(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Aggregate" not in plan
    assert "hashpartitioning" not in plan
    assert "Join" not in plan


def test_topk_rankers_have_no_corpus_sized_window_partition(spark, sf_smoke):
    """Query-side top-k must not sort one query's whole scored stream in
    ONE task. Since round 14 the guard is the engine's own rank-limit
    pushdown (SPARK-37099): the ``rank <= k`` filter over the q_id window
    must plan as ``WindowGroupLimit`` with a map-side ``Partial`` cut
    BELOW the exchange — each scan task forwards at most k rows per key,
    which is exactly the bounded local prune the old hand-rolled
    two-phase ranker provided, minus its extra full-volume Exchange +
    Window (see similarity.topk_per_key)."""
    from rds_pgbadger_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    for df in (
        S.brute_force_topk(emb, [0, 1], 5),
        S.ivf_topk(emb, [0, 1], 5),
        S.pq_adc_topk(emb, [0, 1], 5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition(q_id" in plan
        # the map-side cut: a Partial WindowGroupLimit must exist (the
        # Final one above the exchange is always planned with it)
        wgl = [
            ln for ln in plan.splitlines() if "WindowGroupLimit" in ln
        ]
        assert any("Partial" in ln for ln in wgl), plan[:800]


def test_embed_documents_plumbing(spark, sf_smoke):
    """The batch-inference operator's Spark contract: map-only plan
    (no shuffle — the stage scales with input splits), stable schema,
    dim-length float vectors, partitioning-invariant output, and the
    vectors feed the ANN machinery unchanged."""
    from rds_pgbadger_etl_spark.operators.inference import (
        EMBED_DIM,
        embed_documents,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    emb = embed_documents(docs)
    plan = emb._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "Join" not in plan

    rows = {r.doc_id: r.embedding for r in emb.collect()}
    assert len(rows) == 40
    assert all(len(v) == EMBED_DIM for v in rows.values())
    # deterministic under a different physical partitioning
    rows2 = {
        r.doc_id: r.embedding
        for r in embed_documents(docs.repartition(7)).collect()
    }
    assert rows == rows2

    # output plugs into the similarity operators unchanged
    vecs = emb.withColumnRenamed("doc_id", "vec_id")
    ids = sorted(rows)[:2]
    top = S.brute_force_topk(vecs, ids, 3).collect()
    assert {r.q_id for r in top} == set(ids)


def test_pq_codes_fast_matches_reference(spark, sf_oracle):
    """The vectorized encode kernel must produce BIT-IDENTICAL codes to
    the long-form reference path on the full oracle corpus: exact
    integer distance domain, HALF_UP quantization (Spark round()
    semantics, not np.round's half-to-even), first-minimum tie-break."""
    emb = load_table(spark, sf_oracle, "embeddings")
    ref = {
        (r.vec_id, r.subspace): r.code
        for r in S.pq_codes(emb).select("vec_id", "subspace", "code").collect()
    }
    fast = {
        (r.vec_id, r.subspace): r.code for r in S.pq_codes_fast(emb).collect()
    }
    assert fast == ref and len(ref) > 0
    # and the kernel plan is map-only: no join, no aggregate, no shuffle
    plan = (
        S.pq_codes_fast(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Aggregate" not in plan
    assert "hashpartitioning" not in plan


def test_pair_jaccard_strategies_agree(spark, sf_smoke):
    """The shuffle verify path (for candidate volumes past what the
    driver should collect — see BENCH_NOTES.md round 6) must return the
    exact rows of the broadcast default, and its plan must contain no
    broadcast of the pair stream."""
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = docs.union(clones)
    b = D.near_dup_pairs(corpus, threshold=0.5)
    s = D.near_dup_pairs(corpus, threshold=0.5, verify_strategy="shuffle")
    rows_b = sorted(map(str, b.select("a", "b", "jaccard").collect()))
    rows_s = sorted(map(str, s.select("a", "b", "jaccard").collect()))
    assert rows_b == rows_s and len(rows_b) >= 40


def test_simhash_close_for_similar_docs(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(5)
    tweaked = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" extra"))
    )
    fp = {r.doc_id: r.simhash for r in D.simhash(docs.union(tweaked)).collect()}
    for base_id in [k for k in fp if k < 1_000_000]:
        xor = fp[base_id] ^ fp[base_id + 1_000_000]
        assert bin(xor).count("1") <= 4  # one appended token barely moves bits


def test_lsh_recall_vs_brute_force(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    brute = S.brute_force_topk(emb, qids, 5).collect()
    approx = S.lsh_topk(emb, qids, 5).collect()
    brute_top1 = {r.q_id: r.vec_id for r in brute if r.rank == 1}
    approx_hits = {(r.q_id, r.vec_id) for r in approx}
    # the nearest neighbor shares the bucket for most queries (recall@top1)
    hits = sum(1 for q, v in brute_top1.items() if (q, v) in approx_hits)
    assert hits >= 3


def test_truncated_topk_full_width_is_exact(spark, sf_oracle):
    """Truncating to the FULL dimension must reproduce brute force
    bit-for-bit — the slice is the only thing the truncated plan adds,
    so at dims=DIM the two pipelines are the same computation."""
    emb = load_table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    brute = {tuple(r) for r in S.brute_force_topk(emb, qids, 5).collect()}
    trunc = {
        tuple(r)
        for r in S.truncated_topk(emb, qids, 5, dims=S.DIM).collect()
    }
    assert trunc == brute


def test_truncated_zero_prefix_guard(spark):
    """A vector whose leading ``dims`` components are all zero must
    appear on NEITHER side of the truncated ranking — its truncated
    cosine is 0/0 = NaN, which Spark sorts above every real similarity
    under ``sim DESC``, so unguarded it would outrank every true
    neighbor (and DuckDB's NULL/NaN conventions differ, breaking
    oracle parity on degenerate data)."""
    import math

    rows = [
        (0, [1.0, 0.0] + [0.0] * 62),
        (1, [0.9, 0.1] + [0.0] * 62),
        (2, [0.0, 0.0] + [1.0] * 62),  # zero prefix at dims=2
        (3, [0.5, 0.5] + [0.0] * 62),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = S.truncated_topk(emb, [0, 2], k=3, dims=2).collect()
    assert all(r.vec_id != 2 for r in out)  # never a candidate
    assert all(r.q_id != 2 for r in out)  # zero-prefix query dropped
    assert out and all(not math.isnan(r.sim) for r in out)

    from rds_pgbadger_etl_spark.operators.ann_index import (
        _nonzero_prefix_queries,
    )

    qs = [(0, rows[0][1]), (2, rows[2][1])]
    assert _nonzero_prefix_queries(qs, 2) == [qs[0]]
    assert _nonzero_prefix_queries(qs, 64) == qs


def test_truncated_rerank_exact_when_shortlist_covers(spark, sf_oracle):
    """With shortlist ≥ corpus size the truncated stage cannot drop a
    true neighbor, so the reranked result must equal brute force
    exactly (sims are the FULL-dimension scores by contract)."""
    emb = load_table(spark, sf_oracle, "embeddings")
    n = emb.count()
    qids = [0, 1, 2, 3, 4]
    brute = {tuple(r) for r in S.brute_force_topk(emb, qids, 5).collect()}
    rer = {
        tuple(r)
        for r in S.truncated_rerank_topk(
            emb, qids, 5, dims=8, shortlist=n
        ).collect()
    }
    assert rer == brute


def test_truncated_recall_sweep_shape_and_bounds(spark, sf_oracle):
    """The oracled dims-sweep audit: one row per swept width, hits
    within [0, queries×k], recall = hits/(queries×k), and the rerank
    at the default shortlist must recover at least the truncated-only
    arm's recall at the same width (rerank can only fix, never break,
    an already-correct hit)."""
    from rds_pgbadger_etl_spark.plans.llm_ops import (
        _MRL_DIMS_SWEEP,
        ann_truncated_recall,
    )

    rows = {r.dims: r for r in ann_truncated_recall(spark, sf_oracle).collect()}
    assert set(rows) == set(_MRL_DIMS_SWEEP)
    for r in rows.values():
        assert 0 <= r.hits <= 25
        assert abs(r.recall - round(r.hits / 25.0, 6)) < 1e-12

    emb = load_table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    full = {
        (r.q_id, r.vec_id) for r in S.brute_force_topk(emb, qids, 5).collect()
    }
    t16 = {
        (r.q_id, r.vec_id)
        for r in S.truncated_topk(emb, qids, 5, dims=16).collect()
    }
    r16 = {
        (r.q_id, r.vec_id)
        for r in S.truncated_rerank_topk(emb, qids, 5, dims=16).collect()
    }
    assert len(r16 & full) >= len(t16 & full)


def test_multimodal_decode_real_roundtrip(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(6)
    decoded = M.decode_media(M.attach_real_media(docs)).collect()
    assert len(decoded) == 6
    for r in decoded:
        if r.doc_id % 2 == 0:
            assert r.media_kind == "bmp"
            assert r.width >= 1 and r.height >= 1 and r.bit_depth == 24
        else:
            assert r.media_kind == "wav"
            assert r.sample_rate >= 8000 and r.n_samples >= 1
            assert r.byte_len == 44 + 2 * r.n_samples
    # non-media payloads classify as unknown, never crash
    fake = M.attach_binary(docs)
    kinds = {r.media_kind for r in M.decode_media(fake).collect()}
    assert kinds == {"unknown"}
    feats = M.extract_features(fake).collect()
    assert len(feats) == 6
    assert all(r.byte_len > 0 and 1 <= r.n_frames <= 7 for r in feats)


def test_word_ngrams_short_and_normal_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "tiny"), (3, "a  b")],
        ["doc_id", "text"],
    )
    rows = D.word_ngrams(df, n=3).collect()
    by_doc: dict[int, set[str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    assert by_doc[1] == {"alpha beta gamma", "beta gamma delta"}
    # fewer words than n: one clamped shingle, never zero rows
    assert by_doc[2] == {"tiny"}
    # empty tokens from double spaces are dropped before n-gramming
    assert by_doc[3] == {"a b"}


def test_ngram_jaccard_finds_token_level_dup(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " x1 x2"
    other = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"]
    )
    pairs = {(r.a, r.b): r.jaccard for r in D.ngram_jaccard_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.7
    assert all(3 not in p for p in pairs)


def test_ivf_recall_vs_brute_force(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    brute = S.brute_force_topk(emb, qids, 5).collect()
    approx = S.ivf_topk(emb, qids, 5).collect()
    assert all(1 <= r.rank <= 5 for r in approx)
    brute_top1 = {r.q_id: r.vec_id for r in brute if r.rank == 1}
    approx_hits = {(r.q_id, r.vec_id) for r in approx}
    hits = sum(1 for q, v in brute_top1.items() if (q, v) in approx_hits)
    assert hits >= 3


def test_resize_real_and_frame_sampling(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(5)
    # real nearest-neighbor resize: decoding the resized BMPs reports
    # the requested dimensions; WAV payloads pass through untouched
    resized = M.resize_media(M.attach_real_media(docs), 8, 6)
    for r in M.decode_media(resized).collect():
        if r.media_kind == "bmp":
            assert (r.width, r.height) == (8, 6)
        else:
            assert r.media_kind == "wav"

    media = M.attach_binary(docs)
    frames = M.sample_frames(media).collect()
    assert len(frames) >= 5  # at least one frame per doc
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        # interleave slices partition the payload when every frame is
        # sampled; with stride 2 the sampled slices never overlap, so
        # byte counts stay <= payload length and frame ids are even
        assert all(r.frame_id % 2 == 0 for r in rows)
        assert all(r.frame_bytes >= 0 for r in rows)


def test_connected_components_chain_and_islands(spark):
    # Chain 1-2-3-4 has diameter 3 (needs >1 propagation round) plus a
    # separate island {10,11}: labels must converge to the component min.
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    comp = {r.vertex: r.component for r in D.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_adversarial_long_chain(spark):
    # A 10k-vertex path graph — diameter 9999, far beyond max_iters for
    # pure min-label propagation. The pointer-jump step must make rounds
    # O(log n), so convergence within the default max_iters=50 proves the
    # log-round behavior (and the sum-stable stop criterion is only hit
    # at a true fixed point).
    n = 10_000
    edges = spark.range(n - 1).selectExpr("id AS a", "id + 1 AS b")
    comp = D.connected_components(edges, max_iters=50)
    assert comp.filter("component != 0").count() == 0
    assert comp.count() == n


def test_dedup_cluster_assignments_covers_all_docs(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    out = D.dedup_cluster_assignments(docs, threshold=0.5)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc assigned, singletons too
    by_comp: dict[int, list] = {}
    for r in rows:
        assert r.component <= r.doc_id  # component = min id of the cluster
        by_comp.setdefault(r.component, []).append(r)
    for cid, members in by_comp.items():
        canon = [r for r in members if r.is_canonical == 1]
        assert len(canon) == 1 and canon[0].doc_id == cid
    assert any(len(m) > 1 for m in by_comp.values())  # real clusters exist


def test_assign_cells_matches_window_formulation(spark, sf_oracle):
    """The map-only nearest-centroid kernel (r13) is bit-identical to
    the broadcast-crossJoin + per-vector-top-1-window plan it replaced:
    same round-6 squared distance, same (dist asc, cell asc) tie-break."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_oracle, "embeddings")
    cents = emb.filter(F.col("vec_id") < S.KMEANS_K).select(
        F.col("vec_id").alias("cell"),
        S.as_double(F.col("embedding")).alias("c_emb"),
    )
    got = sorted(
        (int(r.vec_id), int(r.cell), float(r.dist))
        for r in S._assign_cells(emb, cents).collect()
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        S.sqdist_batch(
            S.as_double(F.col("embedding")), F.col("c_emb")
        ).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cell")
    want = sorted(
        (int(r.vec_id), int(r.cell), float(r.dist))
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert got == want and got


def test_kmeans_refine_improves_objective(spark, sf_oracle):
    # one refined round must not worsen the within-cluster sum of
    # squared distances vs assignment to the raw init centroids
    emb = load_table(spark, sf_oracle, "embeddings")
    init = S.kmeans_refine(emb, n_iters=1)  # assignment to init centroids
    refined = S.kmeans_refine(emb, n_iters=2)
    obj0 = init.agg(F.sum("dist")).collect()[0][0]
    obj1 = refined.agg(F.sum("dist")).collect()[0][0]
    assert obj1 <= obj0
    assert refined.count() == emb.count()
    assert refined.select("cluster").distinct().count() <= S.KMEANS_K


def test_dedup_operators_handle_empty_corpus(spark):
    # empty inputs must produce empty (not crash): the incremental /
    # per-partition paths hit genuinely empty batches in production
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.near_dup_pairs(empty_docs).count() == 0
    assert D.simhash(empty_docs).count() == 0
    empty_edges = spark.createDataFrame([], "a long, b long")
    assert D.connected_components(empty_edges).count() == 0
    assert D.dedup_cluster_assignments(empty_docs).count() == 0


def test_pq_codes_structure_and_self_centroids(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    n = emb.count()
    codes = S.pq_codes(emb).collect()
    # every vector gets exactly PQ_M sub-codes, all in [0, PQ_K)
    assert len(codes) == n * S.PQ_M
    assert all(0 <= r.code < S.PQ_K for r in codes)
    # a codebook member is its own nearest centroid with zero distortion
    for r in codes:
        if r.vec_id < S.PQ_K:
            assert r.code == r.vec_id and r.sq == 0


def test_pq_adc_overlaps_exact_l2(spark, sf_oracle):
    import numpy as np

    emb = load_table(spark, sf_oracle, "embeddings")
    rows = emb.collect()
    V = {
        r.vec_id: np.round(
            np.array(r.embedding, dtype=np.float64) * S.PQ_INT_SCALE
        ).astype(np.int64)
        for r in rows
    }
    qids = [0, 1, 2, 3, 4]
    adc = S.pq_adc_topk(emb, qids, 5).collect()
    assert all(1 <= r.rank <= 5 for r in adc)
    by_q = {}
    for r in adc:
        by_q.setdefault(r.q_id, []).append(r.vec_id)
    overlaps = 0
    for q in qids:
        d = {v: int(((V[q] - V[v]) ** 2).sum()) for v in V if v != q}
        exact5 = set(sorted(d, key=lambda v: (d[v], v))[:5])
        if exact5 & set(by_q[q]):
            overlaps += 1
    # 4x16 codebook on random data is coarse; require agreement signal,
    # not perfection (refined codebooks via kmeans_refine do better)
    assert overlaps >= 3


def test_ivfpq_consistent_with_full_adc(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    qids = [0, 1, 2, 3, 4]
    full = {(r.q_id, r.vec_id): r.adc_dist for r in S.pq_adc_topk(emb, qids, 50).collect()}
    ivfpq = S.ivfpq_topk(emb, qids, 5).collect()
    assert all(1 <= r.rank <= 5 for r in ivfpq)
    # where the probed search surfaces a pair the full ADC also ranked,
    # the distances must agree exactly (same integer LUT)
    agree = [r for r in ivfpq if (r.q_id, r.vec_id) in full]
    assert agree, "probed results should overlap the full ADC ranking"
    assert all(full[(r.q_id, r.vec_id)] == r.adc_dist for r in agree)


def test_exact_substring_overlap_run_semantics(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rds_pgbadger_etl_spark.plans.llm_ops import exact_substring_overlap

    run = " ".join(f"w{i}" for i in range(25))          # 25-token shared run
    filler_a = " ".join(f"a{i}" for i in range(30))
    filler_b = " ".join(f"b{i}" for i in range(30))
    scattered = " ".join(f"w{i % 8} c{i}" for i in range(40))  # no long run
    texts = [
        (0, f"{filler_a} {run} tail0"),
        (1, f"{filler_b} {run} tail1"),
        (2, scattered),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([t[0] for t in texts], pa.int64()),
            "text": pa.array([t[1] for t in texts]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t[1]) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = exact_substring_overlap(spark, str(tmp_path)).collect()
    got = {(r.a, r.b): r.max_overlap_tokens for r in rows}
    assert (0, 1) in got and got[(0, 1)] == 25
    assert all(k == (0, 1) for k in got)


def test_dedup_span_removal_semantics(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rds_pgbadger_etl_spark.plans.llm_ops import dedup_span_removal

    run = " ".join(f"w{i}" for i in range(25))          # 25-token shared run
    filler_a = " ".join(f"a{i}" for i in range(30))
    filler_b = " ".join(f"b{i}" for i in range(30))
    scattered = " ".join(f"w{i % 8} c{i}" for i in range(40))  # no long run
    texts = [
        (0, f"{filler_a} {run} tail0"),   # first occurrence: kept intact
        (1, f"{filler_b} {run} tail1"),   # shared run removed, rest kept
        (2, f"{filler_a} {run} tail0"),   # full copy of doc 0: emptied
        (3, scattered),                   # untouched
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([t[0] for t in texts], pa.int64()),
            "text": pa.array([t[1] for t in texts]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array(
                [len(t[1]) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r for r in dedup_span_removal(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {0, 1, 2, 3}          # emptied docs still present
    assert rows[0].n_removed == 0 and rows[0].clean_text == texts[0][1]
    # doc 1: exactly the 25 run tokens go (context grams differ, so the
    # run is maximal at the planted span), filler + tail survive
    assert rows[1].n_removed == 25
    assert rows[1].clean_text == f"{filler_b} tail1"
    # doc 2 duplicates doc 0 end-to-end: one 56-token run covers it all
    assert rows[2].n_removed == rows[2].n_tokens == 56
    assert rows[2].clean_text == ""
    assert rows[3].n_removed == 0 and rows[3].clean_text == texts[3][1]


def test_bpe_train_merges_greedy_and_weighted(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from rds_pgbadger_etl_spark.plans.llm_ops import bpe_train_merges

    # hand-computable corpus: vocab {aaaa: 2, aaa: 1}
    texts = [(0, "aaaa aaa"), (1, "aaaa")]
    tbl = pa.table(
        {
            "doc_id": pa.array([t[0] for t in texts], pa.int64()),
            "text": pa.array([t[1] for t in texts]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t[1]) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = sorted(
        bpe_train_merges(spark, str(tmp_path)).collect(),
        key=lambda r: r.step,
    )
    got = [(r.merged, r.pair_count) for r in rows]
    # step 1: (a,a) appears 3x in aaaa (weight 2) + 2x in aaa (weight 1).
    # GREEDY application must turn aaaa into [aa,aa] (island parity keeps
    # candidates 1 and 3), so step 2 sees (aa,aa) weight 2 beating
    # (aa,a) weight 1; a keep-first-candidate-only bug would leave
    # aaaa as [aa,a,a] and flip step 2.
    assert got == [("aa", 8), ("aaaa", 2), ("aaa", 1)]


def test_ann_recall_report(spark, sf_oracle):
    from rds_pgbadger_etl_spark.plans.llm_ops import ann_recall_report

    rows = {r.method: r for r in ann_recall_report(spark, sf_oracle).collect()}
    assert set(rows) == {
        "lsh",
        "ivf",
        "pq_adc",
        "ivfpq",
        "truncated",
        "truncated_rerank",
    }
    for r in rows.values():
        # the recall denominator is the FIXED query set (5 queries x k),
        # independent of how many queries a method returned rows for
        assert 1 <= r.n_queries <= 5
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits == round(r.recall_at_k * 50)
    # the compressed-domain methods still find a usable share of true
    # neighbors on the test corpus; ivf should not be worse than ivfpq's
    # floor (ivfpq prunes ivf's candidate set further)
    assert rows["ivf"].recall_at_k >= rows["ivfpq"].recall_at_k - 1e-9
    assert rows["ivf"].recall_at_k > 0.5
    # exact rerank of the truncated shortlist can only keep or improve
    # the truncated arm's recall (every surviving true neighbor stays
    # top-k under its exact score)
    assert (
        rows["truncated_rerank"].recall_at_k
        >= rows["truncated"].recall_at_k - 1e-9
    )


def test_semantic_dedup_invariants(spark, sf_oracle):
    from rds_pgbadger_etl_spark.plans.llm_ops import semantic_dedup
    from rds_pgbadger_etl_spark.sources.tables import load_table

    rows = semantic_dedup(spark, sf_oracle).collect()
    n_vectors = load_table(spark, sf_oracle, "embeddings").count()
    # cells partition the corpus; removals never exceed members-1
    assert sum(r.n_members for r in rows) == n_vectors
    assert all(0 <= r.n_removed < r.n_members for r in rows)
    # the corpus-tuned threshold actually exercises the removal path
    assert sum(r.n_removed for r in rows) > 0


def test_near_dup_triangles_closed_semantics(spark, tmp_path):
    """A 4-clique yields binomial(3,2)=3 triangles per vertex; an open
    chain yields none — triangle membership requires every pair edge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rds_pgbadger_etl_spark.plans.llm_ops import near_dup_triangles

    base = " ".join(f"tok{i}" for i in range(60))
    chain_a = " ".join(f"c{i}" for i in range(60))
    # 4 exact clones -> all 6 edges -> K4; two loosely-chained docs
    texts = [base, base, base, base, chain_a, chain_a + " tail extra words here"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r.n_triangles for r in near_dup_triangles(spark, str(tmp_path)).collect()}
    assert {0, 1, 2, 3} <= set(rows)
    assert all(rows[d] == 3 for d in (0, 1, 2, 3))
    assert 4 not in rows and 5 not in rows  # edge without closure: no triangle


def test_heavy_hitter_pruning_is_lossless(spark):
    """The per-partition threshold prune must equal the naive global
    GROUP BY on a Zipf-ish corpus where the tail vocabulary is much
    larger than the candidate set — including an adversarial item that
    is heavy globally but spread evenly across partitions."""
    import pandas as pd

    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.operators.text import heavy_hitter_words

    rows = []
    for i in range(8000):
        rows.append((f"tail{i}",))          # 8000 singletons
    rows += [("hot",)] * 400                # clear heavy hitter
    rows += [("spread",)] * 60              # heavy only in aggregate
    words = spark.createDataFrame(rows, "w string").repartition(16)
    got = {
        (r.w, r.freq)
        for r in heavy_hitter_words(words, threshold_div=100).collect()
    }
    exact = {
        (r.w, r.freq)
        for r in words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(words.agg(F.count(F.lit(1)).alias("n"))))
        .filter(F.col("freq") * 100 > F.col("n"))
        .select("w", "freq")
        .collect()
    }
    assert got == exact
    assert ("hot", 400) in got


def test_containment_verify_strategies_agree(spark, sf_smoke):
    """containment_pairs now routes through the same two-path
    _verify_join as pair_jaccard (round-6 rehearsal measured the
    broadcast verify superlinear past ~1e5 candidates): the shuffle
    path must return the exact rows of the broadcast path."""
    docs = load_table(spark, sf_smoke, "documents").limit(40)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = docs.union(clones)
    b = D.containment_pairs(corpus, verify_strategy="broadcast")
    s = D.containment_pairs(corpus, verify_strategy="shuffle")
    rows_b = sorted(map(str, b.select("a", "b", "containment").collect()))
    rows_s = sorted(map(str, s.select("a", "b", "containment").collect()))
    assert rows_b == rows_s and len(rows_b) >= 40


def test_auto_verify_strategy_picks_by_candidate_count(spark):
    """"auto" resolves to broadcast below AUTO_VERIFY_PAIRS and shuffle
    above — the measured cutover, applied without caller knowledge."""
    small = spark.range(10).selectExpr("id AS a", "id + 1 AS b")
    big = spark.range(D.AUTO_VERIFY_PAIRS + 1).selectExpr(
        "id AS a", "id + 1 AS b"
    )
    assert D.resolve_verify_strategy("auto", small) == "broadcast"
    assert D.resolve_verify_strategy("auto", big) == "shuffle"
    assert D.resolve_verify_strategy("shuffle", small) == "shuffle"
    assert D.resolve_verify_strategy("broadcast", big) == "broadcast"


def _excerpt_corpus(spark):
    """One tiny excerpt doc whose shingle set is fully contained in a
    much larger host doc: resemblance between the pair is ~0.07, far
    below what two 2-sig MinHash bands can catch."""
    import hashlib

    host = "".join(
        hashlib.md5(f"host{i}".encode()).hexdigest() for i in range(16)
    )  # 512 unique-ish chars -> ~497 shingles
    excerpt = host[100:148]  # 48 chars -> 33 shingles, every one in host
    return spark.createDataFrame(
        [(1, host), (2, excerpt)], "doc_id long, text string"
    )


def test_resemblance_bands_miss_planted_excerpt(spark):
    """Assert the documented recall gap IS real on this fixture: the
    LSH containment pipeline produces no candidate for the excerpt pair
    (its resemblance ~0.07 makes a band collision essentially
    impossible), so the pair is silently lost."""
    docs = _excerpt_corpus(spark)
    assert D.containment_pairs(docs, threshold=0.8).collect() == []


def test_containment_prefix_recovers_excerpt_pair(spark):
    """The prefix-filter pipeline must catch exactly that pair at
    containment 1.0 — the pigeonhole guarantee in action."""
    docs = _excerpt_corpus(spark)
    got = D.containment_prefix_pairs(docs, threshold=0.8).collect()
    assert [(r.a, r.b, r.containment) for r in got] == [(1, 2, 1.0)]


def test_containment_prefix_exact_integer_boundary(spark):
    """Regression for the FP prefix-length bug: with t=0.8 and |S_A|=5,
    (1-t)*|S| is mathematically 1.0 but FP computes
    0.2*5 = 0.9999999999999998, so an unguarded floor() gives
    prefix_len=1 instead of 2. Doc A's single RAREST shingle (df-order
    prefix) is exactly the one shingle B does NOT share (df=1 vs df=2
    for the shared four), so the one-shingle prefix provably generates
    no candidate and the pair — containment exactly 4/5 = t — is
    silently dropped. The epsilon-guarded floor must keep it."""
    # A: 20 unique chars -> exactly 5 distinct 16-char shingles.
    a = "abcdefghijklmnopqrst"
    # B: A's first 19 chars (A's shingles 1-4) + unrelated filler; the
    # junction windows contain digits so none equals A's 5th shingle.
    b = a[:19] + "0123456789012345678901234567890123456789"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    got = D.containment_prefix_pairs(docs, threshold=0.8).collect()
    assert [(r.a, r.b, round(r.containment, 6)) for r in got] == [
        (1, 2, 0.8)
    ]


def test_curation_funnel_monotone(spark, sf_oracle):
    """The funnel stages are cumulative gates, so doc and token counts
    must be non-increasing, stage 0 must equal the raw table, and the
    final stage must agree with pretrain_filter's total minus the
    benchmark slice's own survivors (stage 4 adds the >= bench-id and
    contamination gates on top of stage 3)."""
    from rds_pgbadger_etl_spark.plans.llm_ops import (
        _FUNNEL_STAGES,
        curation_funnel,
    )

    rows = {r.stage: r for r in curation_funnel(spark, sf_oracle).collect()}
    assert list(rows) == _FUNNEL_STAGES  # stack() preserves stage order
    docs = load_table(spark, sf_oracle, "documents")
    assert rows["0_raw"].n_docs == docs.count()
    for prev, cur in zip(_FUNNEL_STAGES, _FUNNEL_STAGES[1:]):
        assert rows[cur].n_docs <= rows[prev].n_docs
        assert rows[cur].n_tokens <= rows[prev].n_tokens
    # every survivor carries at least one token
    assert rows["4_decontaminated"].n_tokens >= rows["4_decontaminated"].n_docs


def test_embedding_pagerank_mass_and_hubs(spark, sf_oracle):
    """Integer-scaled PageRank invariants: one score per vector, total
    mass <= 1 (equality when no node dangles), every score at least the
    teleport floor 0.15/N, and the graph actually differentiates nodes
    (a hub scores above the floor)."""
    from rds_pgbadger_etl_spark.plans.llm_ops import embedding_pagerank

    emb = load_table(spark, sf_oracle, "embeddings")
    n = emb.count()
    rows = embedding_pagerank(spark, sf_oracle).collect()
    assert len(rows) == n
    total = sum(r.pagerank for r in rows)
    assert total <= 1.0 + 1e-9
    floor = 0.15 / n
    assert all(r.pagerank >= floor - 1e-12 for r in rows)
    assert max(r.pagerank for r in rows) > 2 * floor


def test_image_ahash_scale_invariant(spark):
    """The perceptual hash's point: the SAME rendered content at a
    different stored resolution hashes identically (nearest-neighbor
    upscale commutes with the 8x8 resample), while different content
    does not. Also pins the hex format (16 lowercase digits)."""
    b_small = M._bmp_encode(4, 4, seed=7)
    b_big = M._bmp_resize(b_small, 8, 8)  # 2x upscale, same rendering
    b_other = M._bmp_encode(4, 4, seed=99)
    df = spark.createDataFrame(
        [(1, "image/bmp", b_small), (2, "image/bmp", b_big),
         (3, "image/bmp", b_other), (4, "audio/wav", b"RIFF")],
        "doc_id long, media_type string, payload binary",
    )
    got = {r.doc_id: r.ahash for r in M.image_ahash(df).collect()}
    assert set(got) == {1, 2, 3}  # non-image rows dropped
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert all(len(h) == 16 and h == h.lower() for h in got.values())


def test_audio_fingerprint_contour_semantics(spark):
    """Planted PCM: a quiet-then-loud clip and its reverse get
    complementary-shaped fingerprints (the contour discriminates), an
    exact re-encode collapses to the same fingerprint, and the RIFF
    walk survives an extra chunk before data. (The synthetic corpus's
    clips are all the same descending ramp, so the registered query
    collapses them into one group — this test supplies the shapes the
    corpus lacks.)"""
    import struct

    def wav(samples, extra_chunk=False):
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = struct.pack("<4sI", b"fmt ", 16) + fmt
        if extra_chunk:
            body += struct.pack("<4sI", b"LIST", 4) + b"INFO"
        body += struct.pack("<4sI", b"data", len(data)) + data
        return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body

    quiet_loud = [10] * 64 + [30000] * 64
    loud_quiet = [30000] * 64 + [10] * 64
    df = spark.createDataFrame(
        [
            (1, "audio/wav", wav(quiet_loud)),
            (2, "audio/wav", wav(loud_quiet)),
            (3, "audio/wav", wav(quiet_loud, extra_chunk=True)),
            (4, "image/bmp", b"BM"),
        ],
        "doc_id long, media_type string, payload binary",
    )
    got = {r.doc_id: r.fingerprint for r in M.audio_fingerprint(df).collect()}
    assert set(got) == {1, 2, 3}  # non-audio dropped
    assert got[1] == "00ff"  # loud back half above the mean
    assert got[2] == "ff00"  # the reverse
    assert got[3] == got[1]  # chunk walk reaches the same PCM


def test_image_near_dup_pairs_hamming_banding(spark):
    """Planted images: B differs from A in exactly one 8x8 cell (hamming
    1 — within the pigeonhole-guaranteed <= 3 recall window), C is a
    checkerboard (far from both). The banded join must surface exactly
    the (A, B) pair with its true Hamming distance."""
    import struct

    def bmp8(bit_fn):
        rows = []
        for y in range(8):
            row = bytearray()
            for x in range(8):
                v = 255 if bit_fn(x, y) else 0
                row += bytes((v, v, v))
            rows.append(bytes(row))  # stride 24, no pad
        img = b"".join(rows)
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, len(img), 2835, 2835, 0, 0
        )
        return hdr + info + img

    a = bmp8(lambda x, y: x >= 4)  # right half bright
    b = bmp8(lambda x, y: x >= 4 or (x, y) == (0, 0))  # one extra cell
    c = bmp8(lambda x, y: (x + y) % 2 == 0)  # checkerboard
    df = spark.createDataFrame(
        [(1, "image/bmp", a), (2, "image/bmp", b), (3, "image/bmp", c)],
        "doc_id long, media_type string, payload binary",
    )
    hashes = M.image_ahash(df)
    pairs = {(r.a, r.b): r.hamming for r in
             M.image_near_dup_pairs(hashes).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 1


def test_embedding_communities_assignment(spark, sf_oracle):
    """LPA invariants: one label per vector, every label is itself a
    vector id (labels only ever propagate from nodes), and the kNN
    graph actually collapses neighborhoods (fewer communities than
    nodes, largest community > 1)."""
    from rds_pgbadger_etl_spark.plans.llm_ops import embedding_communities

    emb = load_table(spark, sf_oracle, "embeddings")
    n = emb.count()
    rows = embedding_communities(spark, sf_oracle).collect()
    assert len(rows) == n
    ids = {r.vec_id for r in rows}
    labels = [r.label for r in rows]
    assert set(labels) <= ids
    from collections import Counter

    counts = Counter(labels)
    assert len(counts) < n
    assert max(counts.values()) > 1


def test_audio_contour64_near_dup_banding(spark):
    """Planted PCM at the 64-window resolution: A's loud windows are
    0..31, B shifts the loud block by one window (hamming 2 — inside
    the pigeonhole window), C is A's complement (hamming 64). The
    banded join must surface exactly (A, B), and a re-encoded copy
    (extra RIFF chunk, same PCM) must land at hamming 0."""
    import struct

    def wav(loud_windows, extra_chunk=False):
        # 128 samples -> window i*64//128: two samples per window
        samples = []
        for i in range(128):
            w = i * 64 // 128
            samples.append(30000 if w in loud_windows else 10)
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = struct.pack("<4sI", b"fmt ", 16) + fmt
        if extra_chunk:
            body += struct.pack("<4sI", b"LIST", 4) + b"INFO"
        body += struct.pack("<4sI", b"data", len(data)) + data
        return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body

    a = wav(set(range(32)))
    b = wav(set(range(1, 33)))
    c = wav(set(range(32, 64)))
    a2 = wav(set(range(32)), extra_chunk=True)
    df = spark.createDataFrame(
        [(1, "audio/wav", a), (2, "audio/wav", b), (3, "audio/wav", c),
         (4, "audio/wav", a2), (5, "image/bmp", b"BM")],
        "doc_id long, media_type string, payload binary",
    )
    contours = M.audio_contour64(df)
    got = {r.doc_id: (r.afp, r.hi, r.lo) for r in contours.collect()}
    assert set(got) == {1, 2, 3, 4}  # non-audio dropped
    assert got[1][1] == 0xFFFFFFFF and got[1][2] == 0
    assert got[3][1] == 0 and got[3][2] == 0xFFFFFFFF
    assert all(len(fp) == 16 and fp == fp.lower() for fp, *_ in got.values())
    pairs = {(r.a, r.b): r.hamming
             for r in M.audio_near_dup_pairs(contours).collect()}
    assert pairs == {(1, 2): 2, (1, 4): 0, (2, 4): 2}


def test_video_dedup_planted_variants(spark):
    """attach_real_video's planted structure must come back out of the
    frame-hash containment join: within every family the re-encoded
    copy (byte-different payload) and the trimmed copy pair with the
    canonical at containment 1.0; the unrelated j=3 member pairs with
    nobody in its family."""
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    vids = M.attach_real_video(docs)
    payloads = {r.doc_id: bytes(r.payload) for r in vids.collect()}
    fh = M.video_frame_hashes(vids)
    pairs = {(r.a, r.b): (r.shared_frames, r.containment)
             for r in M.video_dedup_pairs(fh).collect()}
    for fam in range(3):
        base = 4 * fam
        nf = fam % 3 + 2
        # re-encode: byte-different container, identical frame set
        assert payloads[base] != payloads[base + 1]
        assert pairs[(base, base + 1)] == (nf, 1.0)
        # trim: subset frame set, still containment 1.0
        assert pairs[(base, base + 2)] == (nf - 1, 1.0)
        assert pairs[(base + 1, base + 2)] == (nf - 1, 1.0)
        # unrelated member: no pair with any family sibling
        for j in range(3):
            key = tuple(sorted((base + j, base + 3)))
            assert key not in pairs


def test_video_near_dup_pairs_frame_level_hamming(spark):
    """video_near_dup_pairs must pair videos whose frames are CLOSE but
    not identical (the case video_dedup_pairs misses): video 2's first
    frame is one bit off video 1's, its second is far from everything,
    so exactly half the smaller side matches (containment 0.5)."""
    def row(doc, fid, hi, lo):
        return (doc, fid, f"{hi:08x}{lo:08x}", hi, lo)

    far = 0x0F0F0F0F
    rows = [
        row(1, 0, 0xFFFF0000, 0), row(1, 1, 0x12345678, 0x9ABCDEF0),
        row(2, 0, 0xFFFF0001, 0), row(2, 1, far, far),  # 1 bit off A
        row(3, 0, 0x00FF00FF, 0x11111111), row(3, 1, 0x33333333, 0x77777777),
    ]
    fh = spark.createDataFrame(
        rows, "doc_id long, frame_id int, ahash string, hi long, lo long"
    )
    near = {(r.a, r.b): (r.matched_frames, r.containment)
            for r in M.video_near_dup_pairs(fh).collect()}
    assert near == {(1, 2): (1, 0.5)}
    # the exact-frame join does NOT pair them — no identical hashes
    exact = M.video_dedup_pairs(fh).collect()
    assert exact == []

def test_band_freq_cap_bounds_hot_band_candidates(spark):
    """max_band_freq must stop a globally-hot band value (the constant
    signature a black frame / silence produces) from generating
    candidates, while pairs sharing any NON-hot clean band survive —
    the quadratic-hot-key guard for corpus-scale banding. A pair whose
    only clean bands are hot is the documented recall cost."""
    # 10 fillers share band0=0xDEAD and band1=0x0000 (both hot at
    # cap=5) but sit >=8 apart pairwise in lo, so none verify.
    rows = [
        (i, 0xDEAD0000, int(f"{i:x}" * 8, 16)) for i in range(1, 11)
    ]
    # C/D: within hamming 2, but their clean bands are exactly the two
    # hot ones (lo differs one bit per band) -> lost under the cap.
    rows += [(21, 0xDEAD0000, 0xABCD1234), (22, 0xDEAD0000, 0xABCC1235)]
    # A/B: within hamming 1 via band1, clean bands 2/3 are private
    # (freq 2) -> survive the cap.
    rows += [(23, 0xDEAD7777, 0x55AA55AA), (24, 0xDEAD7776, 0x55AA55AA)]
    words = spark.createDataFrame(rows, "doc_id long, hi long, lo long")

    uncapped = {(r.a, r.b) for r in M.hamming_band_pairs(words).collect()}
    capped = {
        (r.a, r.b)
        for r in M.hamming_band_pairs(words, max_band_freq=5).collect()
    }
    assert {(21, 22), (23, 24)} <= uncapped
    assert (23, 24) in capped
    assert (21, 22) not in capped
    assert capped <= uncapped


def test_video_near_dup_band_cap_drops_boilerplate_frame_pairs(spark):
    """Frame-level hot-band cap: two videos whose ONLY near frames are a
    boilerplate (constant, corpus-wide) frame must stop pairing when
    max_band_freq is set; a pair matching on a distinctive frame keeps
    its answer. The boilerplate frame's constant words appear in every
    video, so all four of its bands blow past the cap."""
    def row(doc, fid, hi, lo):
        return (doc, fid, f"{hi:08x}{lo:08x}", hi, lo)

    rows = []
    # every video carries the boilerplate black frame (constant words)
    for v in range(1, 9):
        rows.append(row(v, 0, 0, 0))
    # videos 1/2: a distinctive near pair (1 bit apart) -> containment
    # 2/2 = 1.0 uncapped; with the boilerplate bands capped the
    # distinctive frame still matches and the boilerplate frame pair is
    # exact-equal... its hamming-0 candidacy comes only via hot bands,
    # so matched drops to 1 of 2 (containment 0.5) — still >= half.
    rows.append(row(1, 1, 0x12345678, 0x9ABCDEF0))
    rows.append(row(2, 1, 0x12345679, 0x9ABCDEF0))
    # videos 3/4: second frames far apart -> only the boilerplate frame
    # matches (1 of 2 = half) -> paired uncapped, dropped when capped.
    rows.append(row(3, 1, 0xFFFF0000, 0x11111111))
    rows.append(row(4, 1, 0x0000FFFF, 0x66666666))
    fh = spark.createDataFrame(
        rows, "doc_id long, frame_id int, ahash string, hi long, lo long"
    )
    uncapped = {
        (r.a, r.b): r.matched_frames
        for r in M.video_near_dup_pairs(fh).collect()
    }
    capped = {
        (r.a, r.b): r.matched_frames
        for r in M.video_near_dup_pairs(fh, max_band_freq=4).collect()
    }
    assert uncapped[(1, 2)] == 2 and uncapped[(3, 4)] == 1
    assert capped.get((1, 2)) == 1  # distinctive frame still pairs them
    assert (3, 4) not in capped  # boilerplate-only pair gone


def test_dedup_band_cap_bounds_template_family(spark):
    """candidate_pairs(max_band_freq=...) must stop a giant boilerplate
    family's band values from going quadratic while ordinary near-dup
    pairs (bands shared by few docs) keep their answer — the text-dedup
    twin of the multimodal hot-band cap."""
    from rds_pgbadger_etl_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [(i, base) for i in range(30)]  # one giant exact-ish family
    rows += [(100, "completely different interesting content " * 8)]
    rows += [(101, "completely different interesting content " * 8 + "x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = D.minhash_signatures(D.char_shingles(docs))
    bands = D.lsh_bands(sigs)
    uncapped = {
        (r.a, r.b) for r in D.candidate_pairs(bands).collect()
    }
    capped = {
        (r.a, r.b)
        for r in D.candidate_pairs(bands, max_band_freq=10).collect()
    }
    # the 30-doc family is quadratic uncapped (435 pairs), gone capped
    assert sum(1 for a, b in uncapped if a < 30 and b < 30) == 435
    assert not any(a < 30 and b < 30 for a, b in capped)
    # the small true pair survives the cap
    assert (100, 101) in uncapped and (100, 101) in capped
    # end-to-end plumb: near_dup_pairs honors the cap
    pairs = D.near_dup_pairs(docs, max_band_freq=10)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (100, 101) in got and not any(a < 30 for a, b in got)


def test_dhash_second_family_recovers_mean_shift_flips(spark):
    """The documented aHash failure: painting one region bright shifts
    the IMAGE MEAN, flipping every near-mean cell's threshold bit —
    aHash hamming blows far past 3 for a pair that renders near-alike.
    The dHash gradient family is mean-invariant (both sides of each
    comparison move together), so the dual-family join recovers the
    pair; aHash alone must (and does) miss it — that asymmetry is the
    reason the second family exists."""
    import struct

    def bmp8(paint_cell=None):
        # 8x8 24-bpp BMP, one pixel per hash cell, channels equal:
        # lum alternates 102/99 around the 100.5 mean, so a painted
        # white cell drags the mean past every 102-cell
        rows = []
        for y in range(8):
            row = bytearray()
            for x in range(8):
                v = 34 if (x + y) % 2 == 0 else 33
                if paint_cell == (x, y):
                    v = 255
                row += bytes([v, v, v])
            rows.append(bytes(row))  # stride 24 — no pad needed
        img = b"".join(rows)
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, len(img), 2835, 2835, 0, 0
        )
        return hdr + info + img

    media = spark.createDataFrame(
        [
            (0, "image/bmp", bmp8()),
            (1, "image/bmp", bmp8(paint_cell=(6, 7))),
        ],
        "doc_id long, media_type string, payload binary",
    )
    ah = M.image_ahash(media).persist()
    dh = M.image_dhash(media).persist()
    # aHash alone misses the pair (mean shift flipped ~half the bits)
    assert M.image_near_dup_pairs(ah).count() == 0
    got = M.image_near_dup_pairs(ah, dh).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.a, r.b) == (0, 1)
    assert r.hamming > 3 and r.dhamming <= 3
    ah.unpersist()
    dh.unpersist()


def test_image_hashes_fused_matches_single_family_kernels(spark):
    """The fused one-decode-pass kernel (image_hashes) must be
    BIT-IDENTICAL to running image_ahash and image_dhash separately —
    same rows (non-image dropped), same hex strings, same words —
    so rewiring the staged table to the fused pass cannot move any
    oracle. Mixed media (BMP + WAV) pins the drop behavior too."""
    media = spark.createDataFrame(
        [
            (0, "image/bmp", M._bmp_encode(12, 9, seed=3)),
            (1, "audio/wav", M._wav_encode(8000, 50, seed=4)),
            (2, "image/bmp", M._bmp_encode(31, 17, seed=200)),
            (4, "image/bmp", M._bmp_encode(1, 1, seed=0)),
        ],
        "doc_id long, media_type string, payload binary",
    )
    fused = {r.doc_id: r for r in M.image_hashes(media).collect()}
    ah = {r.doc_id: r for r in M.image_ahash(media).collect()}
    dh = {r.doc_id: r for r in M.image_dhash(media).collect()}
    assert set(fused) == set(ah) == set(dh) == {0, 2, 4}
    for did, f in fused.items():
        assert (f.ahash, f.a_hi, f.a_lo) == (
            ah[did].ahash,
            ah[did].hi,
            ah[did].lo,
        )
        assert (f.dhash, f.d_hi, f.d_lo) == (
            dh[did].dhash,
            dh[did].hi,
            dh[did].lo,
        )


def test_auto_band_cap_fires_with_no_knob(spark):
    """The DEFAULT ("auto") hot-band threshold must stop a corpus-scale
    template family (freq > max(64, 8 x median)) with NO knob passed,
    while an ordinary near-dup pair keeps its answer — the cap a 100 TB
    user gets without knowing the failure mode exists. Small corpora
    (the registered fixtures) sit below the 64 floor, so their outputs
    equal the uncapped join the oracle twins model (checked here via an
    explicit huge cap as the uncapped reference)."""
    from rds_pgbadger_etl_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [(i, base) for i in range(80)]  # 80-doc family: band freq 80
    rows += [(100, "completely different interesting content " * 8)]
    rows += [(101, "completely different interesting content " * 8 + "x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bands = D.lsh_bands(D.minhash_signatures(D.char_shingles(docs)))
    # median band freq is 1 (the family is 2 VALUES among many), so the
    # auto cap sits at the 64 floor and the 80-doc family blows past it
    counts = bands.groupBy("band").agg(F.count(F.lit(1)).alias("_n"))
    assert D.resolve_band_freq_cap(counts, "auto") == D.AUTO_BAND_FREQ_FLOOR
    auto = {(r.a, r.b) for r in D.candidate_pairs(bands).collect()}
    assert not any(a < 80 and b < 80 for a, b in auto)  # family gone
    assert (100, 101) in auto  # the true small pair survives
    uncapped = {
        (r.a, r.b)
        for r in D.candidate_pairs(bands, max_band_freq=10**9).collect()
    }
    assert sum(1 for a, b in uncapped if a < 80 and b < 80) == 80 * 79 // 2


def test_auto_band_cap_fires_multimodal_no_knob(spark):
    """hamming_band_pairs' default auto cap: a constant signature region
    carried by 70+ docs (black frames / silence) stops generating
    candidates with NO knob passed; a pair sharing a private clean band
    still pairs."""
    # 70 fillers share bands 0/1 (constant hi) but are pairwise-far in lo
    rows = [
        (i, 0xDEAD0000, ((0x9E3779B9 * i) & 0xFFFFFFFF) | 1)
        for i in range(1, 71)
    ]
    # C/D: within hamming 2 but their clean bands are the two hot ones
    rows += [(221, 0xDEAD0000, 0xABCD1234), (222, 0xDEAD0000, 0xABCC1235)]
    # A/B: within hamming 1 via private bands 2/3 (freq 2) -> survive
    rows += [(223, 0x1357AAAA, 0x55AA55AA), (224, 0x1357AAAB, 0x55AA55AA)]
    words = spark.createDataFrame(rows, "doc_id long, hi long, lo long")
    auto = {(r.a, r.b) for r in M.hamming_band_pairs(words).collect()}
    assert (223, 224) in auto
    assert (221, 222) not in auto  # hot-band-only pair is the recall cost
    unc = {
        (r.a, r.b)
        for r in M.hamming_band_pairs(words, max_band_freq=None).collect()
    }
    assert (221, 222) in unc and (223, 224) in unc


def test_auto_band_cap_fires_in_store_lookup(spark, tmp_path):
    """The streaming dedup store lookup's default auto cap: a template
    band accumulated across the ingested HISTORY (80 stored docs) stops
    joining against new batches with no knob, while a genuine stored
    near-dup of a batch doc is still flagged."""
    from rds_pgbadger_etl_spark.operators import dedup_index as DI

    d = str(tmp_path / "store")
    base = "the quick brown fox jumps over the lazy dog " * 8
    hist = [(i, base) for i in range(80)]
    hist += [(300, "completely different interesting content " * 8)]
    DI.build_dedup_index(
        spark, spark.createDataFrame(hist, "doc_id long, text string"), d
    )
    batch = spark.createDataFrame(
        [
            (900, base),  # matches ONLY the hot template family
            (901, "completely different interesting content " * 8 + "x"),
        ],
        "doc_id long, text string",
    )
    auto = {
        (r.old_id, r.new_id)
        for r in DI.dedup_index_lookup(spark, batch, d).collect()
    }
    assert (300, 901) in auto  # the real near-dup still flags
    assert not any(n == 900 for _o, n in auto)  # template probe capped
    prof, bands = DI._encode(batch, "doc_id", "text")
    unc, pinned = DI._lookup_encoded(
        spark, prof, bands, d, max_band_freq=None
    )
    unc_pairs = {(r.old_id, r.new_id) for r in unc.collect()}
    assert any(n == 900 for _o, n in unc_pairs)  # uncapped DOES join it
    for df in pinned + [prof]:
        df.unpersist()


def test_image_near_dups_staged_bands_equivalent(spark, sf_smoke):
    """Handing image_near_dup_pairs a pre-staged fused band table
    (image_fused_bands) must reproduce the internally-banded result
    exactly — the staging is a pure evaluation-cost move."""
    from rds_pgbadger_etl_spark.operators import multimodal as MM
    from rds_pgbadger_etl_spark.plans.llm_ops import (
        _image_dhashes_shared,
        _image_hashes_shared,
    )

    h = _image_hashes_shared(spark, sf_smoke)
    dh = _image_dhashes_shared(spark, sf_smoke)
    inline = sorted(
        map(
            str,
            MM.image_near_dup_pairs(h, dh, max_band_freq=64).collect(),
        )
    )
    staged = sorted(
        map(
            str,
            MM.image_near_dup_pairs(
                h,
                dh,
                max_band_freq=64,
                bands=MM.image_fused_bands(h, dh),
            ).collect(),
        )
    )
    assert staged == inline
