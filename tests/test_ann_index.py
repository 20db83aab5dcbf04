"""Persisted ANN index (operators/ann_index.py): artifact parity with
the in-session ANN family, partition-pruned probe scans, and the
fresh-session answers-without-rebuild guarantee (the 100 TB contract:
the index build is paid once, not per session)."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.operators import ann_index as AI
from rds_pgbadger_etl_spark.operators import index_maintenance as M
from rds_pgbadger_etl_spark.operators import similarity as S
from rds_pgbadger_etl_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

QUERY_IDS = [0, 1, 2, 3, 4]
K = 5


def _rows(df):
    return sorted(map(str, df.select(sorted(df.columns)).collect()))


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index"))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index(spark, emb, d)
    return d


def _queries(spark):
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    return [(int(r.vec_id), list(r.embedding)) for r in rows]


def test_ivfpq_reader_matches_in_session(spark, index_dir):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    expected = _rows(S.ivfpq_topk(emb, QUERY_IDS, K))
    got = _rows(AI.ann_index_ivfpq_topk(spark, index_dir, _queries(spark), K))
    assert got == expected and len(got) == len(QUERY_IDS) * K


def test_ivf_reader_matches_in_session(spark, index_dir):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    expected = _rows(S.ivf_topk(emb, QUERY_IDS, K))
    got = _rows(AI.ann_index_ivf_topk(spark, index_dir, _queries(spark), K))
    assert got == expected and len(got) == len(QUERY_IDS) * K


def test_lsh_reader_matches_in_session(spark, index_dir):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    expected = _rows(S.lsh_topk(emb, QUERY_IDS, K))
    got = _rows(AI.ann_index_lsh_topk(spark, index_dir, _queries(spark), K))
    assert got == expected and len(got) > 0


def test_reader_plan_is_pruned_and_corpus_free(spark, index_dir):
    """The search plan must (a) partition-prune the vectors scan to the
    probed cells and (b) never touch the raw corpus table — the whole
    point of the artifact."""
    df = AI.ann_index_ivfpq_topk(spark, index_dir, _queries(spark), K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    explain = df._jdf.queryExecution().toString()
    assert "embeddings.parquet" not in explain
    assert "embeddings.parquet" not in plan
    # partition pruning on the probed cells reaches the scan
    # (e.g. "PartitionFilters: [cell#12 IN (0,1,3,...), ...]")
    import re

    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("cell" in x and " IN " in x for x in pf), pf


def test_upsert_equals_full_build(spark, index_dir, tmp_path):
    """build(first half) + append(second half) must be search-equivalent
    to build(full corpus) for ALL THREE readers: stored quantizers make
    incremental encoding identical to one-shot encoding."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d2 = str(tmp_path / "upsert_index")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d2)
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= half), d2)
    qs = _queries(spark)
    for reader in (
        AI.ann_index_ivfpq_topk,
        AI.ann_index_ivf_topk,
        AI.ann_index_lsh_topk,
    ):
        assert _rows(reader(spark, d2, qs, K)) == _rows(
            reader(spark, index_dir, qs, K)
        ), reader.__name__


def test_refined_build_and_recall_query(spark, index_dir, tmp_path):
    """refine_iters wires kmeans_centroids into the artifact build: the
    refined index must serve well-formed top-k from its own stored
    quantizer, and the registered recall audit must report both
    variants with sane recall (the refined variant is graded, not
    assumed better — uniform synthetic corpora need not reward it)."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.plans.llm_ops import (
        ann_index_refined_recall,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "refined_index")
    AI.build_ann_index(spark, emb, d, refine_iters=2)
    # the stored quantizer is the refined one, not the first-N sample
    stored = {
        r.cell: list(r.c_emb)
        for r in spark.read.parquet(M.table_path(d, "centroids")).collect()
    }
    first_n = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 16).collect()
    }
    assert stored.keys() == set(range(16))
    assert any(stored[c] != first_n[c] for c in stored)

    got = AI.ann_index_ivfpq_topk(spark, d, _queries(spark), K)
    per_q = {r.q_id for r in got.collect()}
    assert per_q == set(QUERY_IDS)
    assert got.count() == len(QUERY_IDS) * K

    rows = {r.variant: r for r in ann_index_refined_recall(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "first_n",
        "kmeans_refined",
        "residual_pq",
        "sq8",
        "binary",
        "cascade",
    }
    for r in rows.values():
        assert 0.0 <= r.recall_at_k <= 1.0 and r.n_hits >= 0


def test_layout_version_guard(spark, tmp_path):
    """An index dir without the manifest layout stamp (a pre-packed-
    schema artifact) must fail LOUDLY on append/search/compact with a
    rebuild message — not silently append mixed-schema parquet or
    misread tables. A freshly-built dir carries the stamp and passes."""
    d = str(tmp_path / "legacy_idx")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index(spark, emb, d)
    assert M.read_meta(d, AI._LAYOUT_KEY) == AI.LAYOUT_VERSION
    # simulate a pre-stamp artifact: drop the marker, clear the memos
    import json
    import os

    mpath = os.path.join(d, "_MANIFEST.json")
    with open(mpath) as fh:
        manifest = json.load(fh)
    manifest.pop(AI._LAYOUT_KEY)
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    AI._LAYOUT_OK.discard(d)
    AI._CENTROIDS.pop(d, None)
    AI._CODEBOOKS.pop(d, None)
    with pytest.raises(ValueError, match="rebuild"):
        AI.append_to_ann_index(spark, emb.limit(1), d)
    with pytest.raises(ValueError, match="rebuild"):
        AI.ann_index_ivfpq_topk(spark, d, _queries(spark), K)
    with pytest.raises(ValueError, match="rebuild"):
        AI.compact_ann_index(spark, d)
    # rebuilding restamps and everything works again
    AI.build_ann_index(spark, emb, d)
    got = AI.ann_index_ivfpq_topk(spark, d, _queries(spark), K)
    assert got.count() == len(QUERY_IDS) * K


def test_adc_handles_short_codebook_prefix(spark, tmp_path):
    """A corpus with fewer than PQ_K vectors stores a SHORT codebook
    (< PQ_K cells per subspace). The flattened ADC LUT packs with the
    STORED cell count, so the reader's subscript stride must be that
    same count — indexing with the nominal PQ_K would silently misalign
    every subspace past the first. Truth: the shape-agnostic in-session
    IVF-PQ path over the identical corpus."""
    d = str(tmp_path / "short_idx")
    emb = load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") < 10
    )
    AI.build_ann_index(spark, emb, d)
    assert AI._load_codebook(spark, d).shape[1] == 10  # genuinely short
    qids = [0, 1]
    rows = emb.filter(F.col("vec_id").isin(qids)).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in rows]
    expected = _rows(S.ivfpq_topk(emb, qids, 3))
    got = _rows(AI.ann_index_ivfpq_topk(spark, d, queries, 3))
    assert got == expected and got


def test_fresh_session_answers_from_index(spark, index_dir, tmp_path):
    """A brand-new Spark process given ONLY the index directory must
    return the same top-k — with no encode/assignment stage (no corpus
    path in its plan). This converts the 'staged tables persist instead
    of recompute' claim from a docstring into an executed contract."""
    expected = _rows(
        AI.ann_index_ivfpq_topk(spark, index_dir, _queries(spark), K)
    )
    queries = _queries(spark)
    script = textwrap.dedent(
        """
        import json, sys
        sys.path.insert(0, ".")
        from rds_pgbadger_etl_spark.operators import ann_index as AI
        from rds_pgbadger_etl_spark.session import get_spark

        index_dir, qpath = sys.argv[1], sys.argv[2]
        queries = [
            (int(q), vec) for q, vec in json.load(open(qpath))
        ]
        spark = get_spark(app_name="ann-index-fresh", cpus="4")
        df = AI.ann_index_ivfpq_topk(spark, index_dir, queries, 5)
        plan = df._jdf.queryExecution().toString()
        assert "embeddings.parquet" not in plan, "corpus access in plan"
        rows = sorted(map(str, df.select(sorted(df.columns)).collect()))
        print("ROWS_JSON:" + json.dumps(rows))
        """
    )
    spath = tmp_path / "fresh_session_reader.py"
    spath.write_text(script)
    qpath = tmp_path / "queries.json"
    qpath.write_text(json.dumps(queries))
    out = subprocess.run(
        [sys.executable, str(spath), index_dir, str(qpath)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith("ROWS_JSON:")
    )
    assert json.loads(line[len("ROWS_JSON:"):]) == expected


def test_compaction_preserves_search_and_reduces_files(spark, tmp_path):
    """N appends → compact_ann_index: every reader's results must be
    BIT-IDENTICAL before/after (compaction rewrites layout, never rows)
    and the per-table data-file counts must drop back to one file-set
    per partition (the append path lands one per batch)."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "idx")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    # build on 40%, then three appends of 20% each
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < n * 2 // 5), d)
    for lo, hi in ((2, 3), (3, 4), (4, 5)):
        AI.append_to_ann_index(
            spark,
            emb.filter(
                (F.col("vec_id") >= n * lo // 5) & (F.col("vec_id") < n * hi // 5)
            ),
            d,
        )
    qs = _queries(spark)
    before = {
        "ivfpq": _rows(AI.ann_index_ivfpq_topk(spark, d, qs, K)),
        "ivf": _rows(AI.ann_index_ivf_topk(spark, d, qs, K)),
        "lsh": _rows(AI.ann_index_lsh_topk(spark, d, qs, K)),
    }
    stats_before = {
        r.table: r
        for r in AI.ann_index_stats(spark, d).collect()
    }
    # 1 build + 3 appends = up to 4 file-sets in any hot partition
    assert stats_before["vectors"].max_part_files > 1

    fstats = AI.compact_ann_index(spark, d)
    for t, s in fstats.items():
        assert s["files_after"] < s["files_before"], (t, s)

    after = {
        "ivfpq": _rows(AI.ann_index_ivfpq_topk(spark, d, qs, K)),
        "ivf": _rows(AI.ann_index_ivf_topk(spark, d, qs, K)),
        "lsh": _rows(AI.ann_index_lsh_topk(spark, d, qs, K)),
    }
    assert after == before
    stats_after = {
        r.table: r for r in AI.ann_index_stats(spark, d).collect()
    }
    for t in ("vectors", "raw", "lsh_buckets"):
        assert stats_after[t].max_part_files == 1, t
        # row content untouched
        assert stats_after[t].rows == stats_before[t].rows, t
        assert stats_after[t].n_partitions == stats_before[t].n_partitions, t


def test_delete_tombstones_then_compaction_applies(spark, tmp_path):
    """delete_from_ann_index: tombstoned ids vanish from every reader's
    results with zero partition rewrites (logical delete), survivors
    take the vacated ranks, and a later compaction applies the
    tombstones physically — results identical to the logical path, the
    tombstone side table cleared, the rows actually gone from disk."""
    import os

    from pyspark.sql import functions as F

    d = str(tmp_path / "idx")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index(spark, emb, d)
    qs = _queries(spark)

    # tombstone every baseline ivfpq hit → the filter provably bites
    baseline = AI.ann_index_ivfpq_topk(spark, d, qs, K).collect()
    victims = sorted({int(r.vec_id) for r in baseline})
    assert victims
    files_before = len(AI._data_files(M.table_path(d, "vectors")))
    AI.delete_from_ann_index(spark, victims, d)
    # logical: nothing rewritten
    assert len(AI._data_files(M.table_path(d, "vectors"))) == files_before

    for reader in (
        AI.ann_index_ivfpq_topk,
        AI.ann_index_ivf_topk,
        AI.ann_index_lsh_topk,
    ):
        res = reader(spark, d, qs, K).collect()
        assert res, reader.__name__
        assert not ({int(r.vec_id) for r in res} & set(victims)), (
            reader.__name__
        )
    # survivors fill the vacated ranks — still a full k per query
    assert (
        AI.ann_index_ivfpq_topk(spark, d, qs, K).count()
        == len(QUERY_IDS) * K
    )

    logical = {
        "ivfpq": _rows(AI.ann_index_ivfpq_topk(spark, d, qs, K)),
        "ivf": _rows(AI.ann_index_ivf_topk(spark, d, qs, K)),
        "lsh": _rows(AI.ann_index_lsh_topk(spark, d, qs, K)),
    }
    AI.compact_ann_index(spark, d)
    assert M._tombstone_files(d) == []
    after = {
        "ivfpq": _rows(AI.ann_index_ivfpq_topk(spark, d, qs, K)),
        "ivf": _rows(AI.ann_index_ivf_topk(spark, d, qs, K)),
        "lsh": _rows(AI.ann_index_lsh_topk(spark, d, qs, K)),
    }
    assert after == logical
    # physically reclaimed
    assert (
        spark.read.parquet(M.table_path(d, "raw"))
        .filter(F.col("vec_id").isin(victims))
        .count()
        == 0
    )


def test_auto_n_centroids_rule(spark, index_dir, tmp_path):
    # constant ~AUTO_CELL_ROWS cell volume, power-of-two, floored at
    # the fixture constant, capped where the quantizer should shard
    # instead (values measured in BENCH_NOTES "centroid scaling at 4M")
    assert AI.auto_n_centroids(0) == S.N_CENTROIDS
    assert AI.auto_n_centroids(1_000) == S.N_CENTROIDS  # floor bites
    assert AI.auto_n_centroids(1_000_000) == S.N_CENTROIDS  # 15.3 cells
    assert AI.auto_n_centroids(4_000_000) == 64  # 61 -> 2^6
    assert AI.auto_n_centroids(16_000_000) == 256
    assert AI.auto_n_centroids(10**12) == AI.AUTO_MAX_CELLS  # cap bites
    # monotone non-decreasing across decades
    sizes = [10**p for p in range(3, 13)]
    autos = [AI.auto_n_centroids(n) for n in sizes]
    assert autos == sorted(autos)

    # n_centroids=None builds via the rule; the 500-vector smoke corpus
    # clamps to the default, so the artifact answers bit-identically to
    # the module's default-built index — None is pure sizing, no drift
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d_auto = str(tmp_path / "auto_idx")
    AI.build_ann_index(spark, emb, d_auto, n_centroids=None)
    cents = spark.read.parquet(M.table_path(d_auto, "centroids"))
    assert cents.count() == AI.auto_n_centroids(emb.count()) == S.N_CENTROIDS
    got = _rows(AI.ann_index_ivfpq_topk(spark, d_auto, _queries(spark), K))
    expected = _rows(
        AI.ann_index_ivfpq_topk(spark, index_dir, _queries(spark), K)
    )
    assert got == expected and len(got) == len(QUERY_IDS) * K


# ---------------------------------------------------------------------------
# Two-level IVF (sharded quantizer) — the layout past the AUTO_MAX_CELLS
# wall. Parity is checked against an independent numpy reference of the
# composed assignment (the DuckDB twin _ANN_2LEVEL_SQL covers the
# relational formulation in the oracle gate).


@pytest.fixture(scope="module")
def index2_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index_2l"))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index_2level(spark, emb, d)
    return d


def _np_2level_expected(spark, k=K):
    """Composed two-level search, straight numpy: gmap over ALL groups,
    vector assignment over LIVE groups then within-group cells, probe =
    top groups then top cells within probed groups, exact rounded
    cosine rerank — the same conventions the operator documents."""
    import numpy as np

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([int(r.vec_id) for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    assert (ids == np.arange(len(ids))).all()

    def rcos(A, B):
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return np.round((A @ B.T) / (na[:, None] * nb[None, :]), 6)

    G, C = AI.N_GROUPS_2L, AI.N_CELLS_2L
    g_mat, c_mat = X[:G], X[:C]
    gmap = np.argmax(rcos(c_mat, g_mat), axis=1)
    live = sorted({int(g) for g in gmap})
    gl = g_mat[np.array(live)]
    vg = np.array(live)[np.argmax(rcos(X, gl), axis=1)]
    cell = np.empty(len(X), dtype=int)
    for g in live:
        cells_g = np.nonzero(gmap == g)[0]
        mask = vg == g
        sims = rcos(X[mask], c_mat[cells_g])
        cell[mask] = cells_g[np.argmax(sims, axis=1)]

    expected = []
    for q in QUERY_IDS:
        qv = X[q : q + 1]
        gsims = rcos(qv, gl)[0]
        pg = [g for g, _ in sorted(zip(live, gsims), key=lambda t: (-t[1], t[0]))][
            : AI.N_PROBE_GROUPS
        ]
        cand_cells = np.nonzero(np.isin(gmap, pg))[0]
        csims = rcos(qv, c_mat[cand_cells])[0]
        pc = [
            c
            for c, _ in sorted(
                zip(cand_cells, csims), key=lambda t: (-t[1], t[0])
            )
        ][: S.N_PROBE]
        members = np.nonzero(np.isin(cell, pc) & (ids != q))[0]
        sims = rcos(qv, X[members])[0]
        ranked = sorted(zip(members, sims), key=lambda t: (-t[1], t[0]))[:k]
        expected.extend(
            (q, int(v), float(s), r + 1) for r, (v, s) in enumerate(ranked)
        )
    return sorted(map(str, expected))


def test_2level_reader_matches_numpy_reference(spark, index2_dir):
    got = sorted(
        str((r.q_id, r.vec_id, float(r.sim), r.rank))
        for r in AI.ann_index_2level_topk(
            spark, index2_dir, _queries(spark), K
        ).collect()
    )
    assert got == _np_2level_expected(spark) and len(got) == len(QUERY_IDS) * K


def test_2level_layout_total_and_consistent(spark, index2_dir):
    """Every corpus vector lands in exactly one (group, cell) partition,
    and each raw row's group agrees with the fine table's gmap."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    raw = spark.read.parquet(M.table_path(index2_dir, "raw"))
    assert raw.count() == emb.count()
    assert raw.select("vec_id").distinct().count() == emb.count()
    fine = spark.read.parquet(M.table_path(index2_dir, "fine")).select(
        "cell", F.col("group").alias("fine_group")
    )
    mismatches = (
        raw.join(fine, "cell")
        .filter(F.col("group") != F.col("fine_group"))
        .count()
    )
    assert mismatches == 0
    # live coarse groups == the groups that own fine cells
    coarse = spark.read.parquet(M.table_path(index2_dir, "coarse"))
    live_coarse = sorted(r.group for r in coarse.select("group").collect())
    live_fine = sorted(
        r.fine_group
        for r in fine.select("fine_group").distinct().collect()
    )
    assert live_coarse == live_fine


def test_2level_plan_is_pruned_and_corpus_free(spark, index2_dir):
    """The 2-level search must prune BOTH partition levels (group at the
    top directory level, cell below) and never touch the corpus."""
    df = AI.ann_index_2level_topk(spark, index2_dir, _queries(spark), K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    explain = df._jdf.queryExecution().toString()
    assert "embeddings.parquet" not in explain
    assert "embeddings.parquet" not in plan
    import re

    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("group" in x and "cell" in x and " IN " in x for x in pf), pf


def test_2level_fresh_process_answers_from_artifact(spark, index2_dir):
    """A reader with no in-process quantizer cache answers from the
    artifact alone (the build-once contract, 2-level edition)."""
    AI._COARSE.pop(index2_dir, None)
    got = _rows(AI.ann_index_2level_topk(spark, index2_dir, _queries(spark), K))
    assert len(got) == len(QUERY_IDS) * K


def test_auto_quantizer_shape_rule():
    # below the cap: single level, same count as auto_n_centroids
    for n in (0, 10**6, 4 * 10**6, 10**8):
        g, c = AI.auto_quantizer_shape(n)
        assert g == 1 and c == AI.auto_n_centroids(n)
    # past the cap: two levels, uncapped constant-volume cell count,
    # ~sqrt sharding, both powers of two
    import math

    for n in (6 * 10**8, 10**9, 10**10, 6 * 10**10):
        g, c = AI.auto_quantizer_shape(n)
        assert g > 1 and c > AI.AUTO_MAX_CELLS
        assert 2 ** round(math.log2(g)) == g
        assert 2 ** round(math.log2(c)) == c
        assert g <= AI.AUTO_MAX_CELLS and c // g <= AI.AUTO_MAX_CELLS
        # cell volume stays within 2x of the single-level target
        assert c / 2 <= n / AI.AUTO_CELL_ROWS <= c * 2
    # far wall: cells clamp at the driver-feasible quantizer-build
    # size (AUTO_MAX_CELLS_2L), not the layout's theoretical max —
    # the shipped build trains quantizers driver-side
    g, c = AI.auto_quantizer_shape(10**15)
    assert c == AI.AUTO_MAX_CELLS_2L and g == 2 ** 10
    # monotone non-decreasing total cells across decades
    cells = [AI.auto_quantizer_shape(10**p)[1] for p in range(3, 15)]
    assert cells == sorted(cells)


def test_2level_upsert_equals_full_build(spark, index2_dir, tmp_path):
    """build(first half) + append_to_ann_index_2level(rest) must be
    search-equivalent to the one-shot build: stored quantizers make the
    composed assignment identical for old and new rows."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "idx2l_upsert")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") < half), d)
    AI.append_to_ann_index_2level(
        spark, emb.filter(F.col("vec_id") >= half), d
    )
    got = _rows(AI.ann_index_2level_topk(spark, d, _queries(spark), K))
    expected = _rows(
        AI.ann_index_2level_topk(spark, index2_dir, _queries(spark), K)
    )
    assert got == expected and len(got) == len(QUERY_IDS) * K


def test_2level_delete_tombstones_filter_results(spark, tmp_path):
    """The layout-agnostic tombstone delete applies to the 2-level
    reader: deleted ids vanish from results, survivors fill the ranks,
    nothing in the partitioned tables is rewritten."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "idx2l_del")
    AI.build_ann_index_2level(spark, emb, d)
    before = {
        (r.q_id, r.rank): r.vec_id
        for r in AI.ann_index_2level_topk(spark, d, _queries(spark), K).collect()
    }
    victims = sorted({v for v in before.values()})[:3]
    files_before = sorted(M.data_files(M.table_path(d, "raw")))
    AI.delete_from_ann_index(spark, victims, d)
    after = AI.ann_index_2level_topk(spark, d, _queries(spark), K).collect()
    assert sorted(M.data_files(M.table_path(d, "raw"))) == files_before
    assert not {r.vec_id for r in after} & set(victims)
    assert len(after) == len(QUERY_IDS) * K  # survivors fill the ranks


def test_2level_flag_matches_reader(spark, tmp_path):
    """flag_against_index_2level (distributed two-stage broadcast probe
    + cogrouped per-cell matmul) must answer exactly what the
    driver-probe reader answers for the same query vectors — the
    ingest-flag verb and the search verb are one semantics."""
    from rds_pgbadger_etl_spark.streaming.incremental_ann import (
        flag_against_index_2level,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "idx2l_flag")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") >= 10), d)
    batch = emb.filter(F.col("vec_id") < 10)
    flags = {
        (r.vec_id, r.rank): (r.neighbor_id, r.cosine)
        for r in flag_against_index_2level(spark, batch, d, k=K).collect()
    }
    rows = emb.filter(F.col("vec_id") < 10).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in rows]
    reader = {
        (r.q_id, r.rank): (r.vec_id, r.sim)
        for r in AI.ann_index_2level_topk(spark, d, queries, K).collect()
    }
    assert flags == reader and len(flags) == len(queries) * K


def test_flag_probe_meta_cache_hits_and_invalidates(
    spark, tmp_path, monkeypatch
):
    """A repeated flag of the same batch against an unchanged store
    reuses the cached probe-cell metadata (the distinct+collect runs
    ONCE) with identical rows; a store REBUILD rewrites the quantizer
    files, so the fingerprint key changes and the probe set is
    recomputed instead of reusing stale cells."""
    from rds_pgbadger_etl_spark.streaming import incremental_ann as IA

    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "idx_probe_meta")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < 30), d)
    batch = emb.filter(F.col("vec_id") >= 35)
    remembers = []
    real = IA._remember_probe_meta
    monkeypatch.setattr(
        IA,
        "_remember_probe_meta",
        lambda k, v: (remembers.append(k), real(k, v))[1],
    )
    first = sorted(map(str, IA.flag_against_index(spark, batch, d, k=K).collect()))
    assert len(remembers) == 1
    again = sorted(map(str, IA.flag_against_index(spark, batch, d, k=K).collect()))
    assert again == first and len(remembers) == 1  # cache hit
    # rebuild: quantizer files rewritten -> new fingerprint -> recompute
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < 35), d)
    third = sorted(map(str, IA.flag_against_index(spark, batch, d, k=K).collect()))
    assert len(remembers) == 2
    IA._PROBE_META.clear()
    fresh = sorted(map(str, IA.flag_against_index(spark, batch, d, k=K).collect()))
    assert third == fresh


def test_2level_ivfpq_reader_matches_upsert_build(spark, index2_dir, tmp_path):
    """The 2-level PQ arm: (a) well-formed top-k from codes alone, and
    (b) build(half) + append(rest) is search-identical to the one-shot
    build — the stored codebook makes incremental PQ encoding equal to
    one-shot encoding (the immutable-quantizer invariant, PQ edition)."""
    got_full = _rows(
        AI.ann_index_2level_ivfpq_topk(spark, index2_dir, _queries(spark), K)
    )
    assert len(got_full) == len(QUERY_IDS) * K

    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "idx2l_pq_upsert")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") < half), d)
    AI.append_to_ann_index_2level(
        spark, emb.filter(F.col("vec_id") >= half), d
    )
    got_upsert = _rows(
        AI.ann_index_2level_ivfpq_topk(spark, d, _queries(spark), K)
    )
    assert got_upsert == got_full


def test_2level_ivfpq_plan_reads_codes_not_floats(spark, index2_dir):
    """The PQ arm's plan must (a) prune BOTH partition levels of the
    vectors table, (b) never touch the corpus, and (c) never scan the
    raw-embedding table — codes are the only per-vector bytes read (the
    ~100x probed-IO cut the two-level layout exists for)."""
    df = AI.ann_index_2level_ivfpq_topk(spark, index2_dir, _queries(spark), K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    explain = df._jdf.queryExecution().toString()
    assert "embeddings.parquet" not in explain
    assert "embeddings.parquet" not in plan
    assert "/raw" not in plan  # no raw-float scan anywhere in the plan
    import re

    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("group" in x and "cell" in x and " IN " in x for x in pf), pf


def test_2level_compaction_preserves_search_and_reduces_files(spark, tmp_path):
    """Maintenance verbs on the (group, cell) layout: three appends
    accumulate file-sets per hot partition; compact_ann_index
    (layout-dispatched) collapses them, both search arms stay
    bit-identical, and ann_index_stats audits the 2-level tables."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    d = str(tmp_path / "idx2l_compact")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") < n // 4), d)
    for b in range(1, 4):
        AI.append_to_ann_index_2level(
            spark,
            emb.filter(
                (F.col("vec_id") >= b * n // 4)
                & (F.col("vec_id") < (b + 1) * n // 4)
            ),
            d,
        )
    qs = _queries(spark)
    before_flat = _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    before_pq = _rows(AI.ann_index_2level_ivfpq_topk(spark, d, qs, K))

    stats = AI.compact_ann_index(spark, d)
    assert set(stats) == {"vectors", "raw", "fine"}
    for t in ("vectors", "raw"):
        assert stats[t]["files_after"] < stats[t]["files_before"], (t, stats)
    # one file-set per (group, cell) partition after the rewrite
    vec_dir = M.table_path(d, "vectors")
    assert vec_dir.endswith("__g1")  # manifest flipped to gen 1
    per_part = {}
    for f in M.data_files(vec_dir):
        part = "/".join(f.split("/")[:-1])
        per_part[part] = per_part.get(part, 0) + 1
    assert per_part and max(per_part.values()) == 1

    assert _rows(AI.ann_index_2level_topk(spark, d, qs, K)) == before_flat
    assert _rows(AI.ann_index_2level_ivfpq_topk(spark, d, qs, K)) == before_pq

    st = {r.table: r for r in AI.ann_index_stats(spark, d).collect()}
    assert set(st) == {"vectors", "raw", "fine"}
    assert st["vectors"].max_part_files == 1
    assert st["raw"].rows == n


def test_2level_delete_then_compaction_applies_physically(spark, tmp_path):
    """Tombstoned ids must disappear PHYSICALLY from the 2-level tables
    at compaction (rows gone from vectors/ and raw/, tombstone side
    table cleared), with search results identical to the logical-delete
    answers before the rewrite."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "idx2l_del_compact")
    AI.build_ann_index_2level(spark, emb, d)
    qs = _queries(spark)
    victims = sorted(
        {
            r.vec_id
            for r in AI.ann_index_2level_topk(spark, d, qs, K).collect()
        }
    )[:3]
    AI.delete_from_ann_index(spark, victims, d)
    logical_flat = _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    logical_pq = _rows(AI.ann_index_2level_ivfpq_topk(spark, d, qs, K))

    AI.compact_ann_index(spark, d)
    assert M.tombstones(spark, d) is None  # cleared after full compaction
    for t in ("vectors", "raw"):
        remaining = (
            spark.read.parquet(M.table_path(d, t))
            .filter(F.col("vec_id").isin([int(v) for v in victims]))
            .count()
        )
        assert remaining == 0, t
    assert _rows(AI.ann_index_2level_topk(spark, d, qs, K)) == logical_flat
    assert _rows(AI.ann_index_2level_ivfpq_topk(spark, d, qs, K)) == logical_pq

def test_rerank_with_full_shortlist_equals_ivf_flat(spark, index_dir):
    """The two-stage search's semantics anchor: with a shortlist
    covering the whole probed population, ADC-shortlist + exact-rerank
    must equal the IVF-Flat reader EXACTLY (same probes, same cosine,
    same tie-breaks) — the shortlist only ever trims, never reorders."""
    qs = _queries(spark)
    full = _rows(
        AI.ann_index_ivfpq_rerank_topk(spark, index_dir, qs, K, 10**9)
    )
    flat = _rows(AI.ann_index_ivf_topk(spark, index_dir, qs, K))
    assert full == flat and len(full) == len(QUERY_IDS) * K
    # a tight shortlist still returns well-formed top-k
    tight = AI.ann_index_ivfpq_rerank_topk(spark, index_dir, qs, K, K)
    assert tight.count() == len(QUERY_IDS) * K


def test_2level_rerank_with_full_shortlist_equals_flat(spark, index2_dir):
    qs = _queries(spark)
    full = _rows(
        AI.ann_index_2level_ivfpq_rerank_topk(spark, index2_dir, qs, K, 10**9)
    )
    flat = _rows(AI.ann_index_2level_topk(spark, index2_dir, qs, K))
    assert full == flat and len(full) == len(QUERY_IDS) * K

def test_2level_distributed_build_matches_driver_build(spark, index2_dir, tmp_path):
    """build_ann_index_2level_distributed (map-side gmap, cogrouped
    per-group cell assignment, quantizer never collected) must write a
    search-identical artifact to the driver-side build: identical raw
    (vec_id, group, cell) assignments and identical results from all
    three readers — the parity that licenses using it past the
    AUTO_MAX_CELLS_2L clamp."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "idx2l_dist")
    AI.build_ann_index_2level_distributed(spark, emb, d)
    qs = _queries(spark)
    for reader in (
        AI.ann_index_2level_topk,
        AI.ann_index_2level_ivfpq_topk,
        AI.ann_index_2level_ivfpq_rerank_topk,
    ):
        assert _rows(reader(spark, d, qs, K)) == _rows(
            reader(spark, index2_dir, qs, K)
        ), reader.__name__
    ra = {
        (r.vec_id, r.group, r.cell)
        for r in spark.read.parquet(M.table_path(d, "raw")).collect()
    }
    rb = {
        (r.vec_id, r.group, r.cell)
        for r in spark.read.parquet(
            M.table_path(index2_dir, "raw")
        ).collect()
    }
    assert ra == rb and ra


def test_truncated_reader_with_full_shortlist_equals_ivf_flat(
    spark, index_dir
):
    """ann_index_truncated_topk's exactness anchor: with shortlist ≥
    the probed volume the truncated stage cannot drop a candidate, so
    the full-dim rerank must reproduce IVF-Flat bit-for-bit; at the
    default (16-dim, 25-row) operating point the result stays a valid
    top-k contract (k rows per query, exact full-dim sims)."""
    qs = _queries(spark)
    flat = _rows(AI.ann_index_ivf_topk(spark, index_dir, qs, K))
    full = _rows(
        AI.ann_index_truncated_topk(spark, index_dir, qs, K, shortlist=10**9)
    )
    assert full == flat
    tight = AI.ann_index_truncated_topk(spark, index_dir, qs, K).collect()
    assert len(tight) == len(QUERY_IDS) * K
    sims = {(r.q_id, r.vec_id): r.sim for r in tight}
    exact = {
        (r[0], r[1]): r[2]
        for r in flat
    }
    # every reranked sim that IS a true IVF neighbor carries the exact score
    for key, sim in sims.items():
        if key in exact:
            assert sim == exact[key]


def test_2level_truncated_reader_with_full_shortlist_equals_flat(
    spark, index2_dir
):
    """The two-level truncated reader's exactness anchor, mirroring the
    single-level one: a covering shortlist must reproduce the flat
    2-level reader bit-for-bit, and the default operating point keeps
    the top-k contract with exact full-dim sims."""
    qs = _queries(spark)
    flat = _rows(AI.ann_index_2level_topk(spark, index2_dir, qs, K))
    full = _rows(
        AI.ann_index_2level_truncated_topk(
            spark, index2_dir, qs, K, shortlist=10**9
        )
    )
    assert full == flat
    tight = AI.ann_index_2level_truncated_topk(
        spark, index2_dir, qs, K
    ).collect()
    assert len(tight) == len(QUERY_IDS) * K


def test_sq8_arm_on_distributed_build_matches_driver_build(
    spark, index2_dir, tmp_path
):
    """add_sq8_to_ann_index is layout-agnostic by design (grid from
    raw/, codes under the layout's own pruning key) — pin that deriving
    it on a DISTRIBUTED-built two-level store yields the same grid and
    search-identical SQ8 results as on the driver-built store, so the
    past-the-clamp build path keeps the full arm ladder."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "idx2l_dist_sq8")
    AI.build_ann_index_2level_distributed(spark, emb, d)
    AI.add_sq8_to_ann_index(spark, d)
    d_ref = str(tmp_path / "idx2l_drv_sq8")
    AI.build_ann_index_2level(spark, emb, d_ref)
    AI.add_sq8_to_ann_index(spark, d_ref)
    qs = _queries(spark)
    assert _rows(AI.ann_index_2level_sq8_topk(spark, d, qs, K)) == _rows(
        AI.ann_index_2level_sq8_topk(spark, d_ref, qs, K)
    )
    va, sa = AI._read_sq_stats(spark, d)
    vb, sb = AI._read_sq_stats(spark, d_ref)
    assert (va == vb).all() and (sa == sb).all()


def test_residual_index_semantics_and_lifecycle(spark, tmp_path):
    """The residual-PQ artifact (FAISS IndexIVFPQ composition): codes
    are argmin over the residual codebook; the per-(query, probed cell)
    LUT scores them. Contract pins: (a) the rerank semantics anchor
    holds — shortlist >= population equals IVF-Flat exactly (the ADC
    stage only ever trims); (b) append == one-shot build over the union
    corpus (immutable quantizers, comparable codes); (c) the residual
    ADC ranking is NOT the raw-PQ ranking (the encoding genuinely
    changes the approximation, not just the labels)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    d = str(tmp_path / "res_idx")
    AI.build_ann_index(spark, emb, d, residual=True)
    assert M.read_meta(d, AI._RESIDUAL_KEY) is True
    qs = _queries(spark)

    full = _rows(AI.ann_index_ivfpq_rerank_topk(spark, d, qs, K, 10**9))
    flat = _rows(AI.ann_index_ivf_topk(spark, d, qs, K))
    assert full == flat and len(full) == len(QUERY_IDS) * K

    d2 = str(tmp_path / "res_idx_upsert")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < n // 2), d2,
                       residual=True)
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= n // 2), d2)
    got = _rows(AI.ann_index_ivfpq_topk(spark, d2, qs, K))
    want = _rows(AI.ann_index_ivfpq_topk(spark, d, qs, K))
    assert got == want and got

    d3 = str(tmp_path / "raw_idx")
    AI.build_ann_index(spark, emb, d3)
    raw = _rows(AI.ann_index_ivfpq_topk(spark, d3, qs, K))
    assert raw != want  # residual ADC is a different approximation


def _clustered_emb(spark, n=2000, dim=S.DIM, spread=0.02):
    """Deterministic clustered corpus: 4 well-separated centers
    (vec_id % 4), tiny intra-cluster jitter — the regime where residual
    encoding wins (cells capture nearly all the variance)."""
    import numpy as np

    centers = np.array(
        [
            [1.0] * dim,
            [-1.0] * dim,
            [1.0, -1.0] * (dim // 2),
            [-1.0, 1.0] * (dim // 2),
        ]
    )
    rs = np.random.RandomState(7)
    rows = []
    for i in range(n):
        v = centers[i % 4] + rs.uniform(-spread, spread, dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_residual_auto_selection_picks_the_regime(spark, tmp_path):
    """residual="auto" — the build DEFAULT — must pick raw on a corpus
    whose cells capture no locality (the fixture's hash-uniform
    embeddings: measured ratio ~1.5) and residual on a clustered corpus
    (ratio ~0), on BOTH layouts, with the choice and the measured
    variance ratio stamped in the manifest; an explicit bool overrides
    and stamps mode="explicit". The auto-chosen residual store must be
    artifact-equivalent to an explicitly-residual build (same decision
    path downstream of the flag)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qs = _queries(spark)

    d_u = str(tmp_path / "auto_uniform")
    AI.build_ann_index(spark, emb, d_u)  # default residual="auto"
    mode = M.read_meta(d_u, AI._RESIDUAL_MODE_KEY)
    assert mode["mode"] == "auto" and mode["chosen_residual"] is False
    assert mode["variance_ratio"] > AI.RESIDUAL_AUTO_RATIO
    assert M.read_meta(d_u, AI._RESIDUAL_KEY) is False

    clustered = _clustered_emb(spark).persist()
    cqs = [
        (int(r.vec_id), list(r.embedding))
        for r in clustered.filter(F.col("vec_id") < 3).collect()
    ]
    d_c = str(tmp_path / "auto_clustered")
    AI.build_ann_index(spark, clustered, d_c)
    mode = M.read_meta(d_c, AI._RESIDUAL_MODE_KEY)
    assert mode["mode"] == "auto" and mode["chosen_residual"] is True
    assert mode["variance_ratio"] < AI.RESIDUAL_AUTO_RATIO
    assert M.read_meta(d_c, AI._RESIDUAL_KEY) is True
    # auto-chosen residual == explicitly-residual (same store semantics)
    d_ce = str(tmp_path / "explicit_clustered")
    AI.build_ann_index(spark, clustered, d_ce, residual=True)
    assert _rows(
        AI.ann_index_ivfpq_topk(spark, d_c, cqs, K)
    ) == _rows(AI.ann_index_ivfpq_topk(spark, d_ce, cqs, K))
    assert (
        M.read_meta(d_ce, AI._RESIDUAL_MODE_KEY)["mode"] == "explicit"
    )

    # the 2-level layout makes the same call in both regimes
    d2_u = str(tmp_path / "auto2l_uniform")
    AI.build_ann_index_2level(spark, emb, d2_u)
    assert (
        M.read_meta(d2_u, AI._RESIDUAL_MODE_KEY)["chosen_residual"]
        is False
    )
    d2_c = str(tmp_path / "auto2l_clustered")
    AI.build_ann_index_2level(spark, clustered, d2_c)
    m2 = M.read_meta(d2_c, AI._RESIDUAL_MODE_KEY)
    assert m2["mode"] == "auto" and m2["chosen_residual"] is True

    # the DISTRIBUTED build makes the same no-knob call via its sampled
    # diagnostic (no fine-quantizer collect), both regimes
    dd_u = str(tmp_path / "autodist_uniform")
    AI.build_ann_index_2level_distributed(spark, emb, dd_u)
    md = M.read_meta(dd_u, AI._RESIDUAL_MODE_KEY)
    assert md["mode"] == "auto" and md["chosen_residual"] is False
    assert M.read_meta(dd_u, AI._RESIDUAL_KEY) is False
    dd_c = str(tmp_path / "autodist_clustered")
    AI.build_ann_index_2level_distributed(spark, clustered, dd_c)
    md = M.read_meta(dd_c, AI._RESIDUAL_MODE_KEY)
    assert md["mode"] == "auto" and md["chosen_residual"] is True
    assert M.read_meta(dd_c, AI._RESIDUAL_KEY) is True
    # distributed auto == driver auto on the same corpus (same choice,
    # same search results)
    assert _rows(
        AI.ann_index_2level_topk(spark, dd_c, cqs, K)
    ) == _rows(AI.ann_index_2level_topk(spark, d2_c, cqs, K))
    clustered.unpersist()
    # uniform-fixture sanity: the auto default left the standard index
    # bit-compatible with the raw-PQ oracle family
    got = _rows(AI.ann_index_ivfpq_topk(spark, d_u, qs, K))
    want = _rows(S.ivfpq_topk(emb, QUERY_IDS, K))
    assert got == want


def test_2level_residual_builds_match_and_hold_semantics(spark, tmp_path):
    """Residual PQ on the TWO-LEVEL layout: the driver build (fine
    collectible → cell-keyed residual encoder) and the distributed
    build (codebook from the PQ_K prefix through the same two-stage
    assignment, then ONE cogroup that assigns AND encodes with the
    group's own shard — the fine quantizer never leaves the executors)
    must land search-identical artifacts; the rerank anchor holds
    (shortlist >= population == IVF-Flat exactly); append joins the
    residual store with comparable codes (== one-shot build)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    d1 = str(tmp_path / "res2l_drv")
    d2 = str(tmp_path / "res2l_dist")
    AI.build_ann_index_2level(spark, emb, d1, residual=True)
    AI.build_ann_index_2level_distributed(spark, emb, d2, residual=True)
    assert M.read_meta(d1, AI._RESIDUAL_KEY) is True
    qs = _queries(spark)
    for reader in (
        AI.ann_index_2level_ivfpq_topk,
        AI.ann_index_2level_ivfpq_rerank_topk,
    ):
        r1 = _rows(reader(spark, d1, qs, K))
        r2 = _rows(reader(spark, d2, qs, K))
        assert r1 == r2 and r1, reader.__name__
    # codes identical between the two builds (not just search results)
    va = {
        (r.vec_id, tuple(r.codes))
        for r in spark.read.parquet(M.table_path(d1, "vectors")).collect()
    }
    vb = {
        (r.vec_id, tuple(r.codes))
        for r in spark.read.parquet(M.table_path(d2, "vectors")).collect()
    }
    assert va == vb and len(va) == n
    # rerank semantics anchor on the residual artifact
    full = _rows(
        AI.ann_index_2level_ivfpq_rerank_topk(spark, d1, qs, K, 10**9)
    )
    flat = _rows(AI.ann_index_2level_topk(spark, d1, qs, K))
    assert full == flat and len(full) == len(QUERY_IDS) * K
    # append == one-shot build over the union corpus
    d3 = str(tmp_path / "res2l_upsert")
    AI.build_ann_index_2level(
        spark, emb.filter(F.col("vec_id") < n // 2), d3, residual=True
    )
    AI.append_to_ann_index_2level(
        spark, emb.filter(F.col("vec_id") >= n // 2), d3
    )
    got = _rows(AI.ann_index_2level_ivfpq_topk(spark, d3, qs, K))
    want = _rows(AI.ann_index_2level_ivfpq_topk(spark, d1, qs, K))
    assert got == want and got


def test_assign_cells_grouped_matches_window_formulation(spark):
    """The cogrouped per-group assignment kernel (r13) is bit-identical
    to the equi-join + per-vector-top-1-window plan it replaced: same
    round-6 squared distance, same (dist asc, cell asc) tie-break,
    restricted to each row's group."""
    from pyspark.sql import Window

    emb = load_table(spark, SF_SMOKE, "embeddings")
    members = emb.select(
        "vec_id", "embedding", (F.col("vec_id") % 3).alias("group")
    )
    cents = (
        emb.filter(F.col("vec_id") < 9)
        .select(
            (F.col("vec_id") % 3).alias("group"),
            F.col("vec_id").alias("cell"),
            S.as_double(F.col("embedding")).alias("c_emb"),
        )
    )
    got = sorted(
        (int(r.vec_id), int(r.group), int(r.cell))
        for r in AI._assign_cells_grouped(members, cents).collect()
    )
    scored = members.join(cents, "group").select(
        "vec_id",
        "group",
        "cell",
        S.sqdist_batch(
            S.as_double(F.col("embedding")), F.col("c_emb")
        ).alias("dist"),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cell")
    want = sorted(
        (int(r.vec_id), int(r.group), int(r.cell))
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert got == want and got


def test_2level_refined_builds_match_and_hold_invariants(spark, tmp_path):
    """refine_iters=1 trains BOTH quantizer levels with Lloyd's k-means
    (coarse globally, fine per group — _refined_quantizers_2level). The
    driver and distributed builds must land search-identical artifacts
    from the refined quantizers; every fine cell's group is live; cell
    ids are the init members' vec_ids (globally unique); the quantizer
    tables hold DOUBLES (a float32 cast would perturb the round(avg, 6)
    values the DuckDB twin computes)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d1 = str(tmp_path / "ref_drv")
    d2 = str(tmp_path / "ref_dist")
    AI.build_ann_index_2level(spark, emb, d1, refine_iters=1)
    AI.build_ann_index_2level_distributed(spark, emb, d2, refine_iters=1)
    qs = _queries(spark)
    for reader in (
        AI.ann_index_2level_topk,
        AI.ann_index_2level_ivfpq_topk,
        AI.ann_index_2level_ivfpq_rerank_topk,
    ):
        r1 = _rows(reader(spark, d1, qs, K))
        r2 = _rows(reader(spark, d2, qs, K))
        assert r1 == r2 and r1, reader.__name__
    ra = {
        (r.vec_id, r.group, r.cell)
        for r in spark.read.parquet(M.table_path(d1, "raw")).collect()
    }
    rb = {
        (r.vec_id, r.group, r.cell)
        for r in spark.read.parquet(M.table_path(d2, "raw")).collect()
    }
    assert ra == rb and len(ra) == emb.count()
    coarse = spark.read.parquet(M.table_path(d1, "coarse"))
    fine = spark.read.parquet(M.table_path(d1, "fine"))
    assert dict(coarse.dtypes)["g_emb"] == "array<double>"
    assert dict(fine.dtypes)["c_emb"] == "array<double>"
    groups = {int(r.group) for r in coarse.collect()}
    frows = fine.collect()
    assert {int(r.group) for r in frows} <= groups
    cells = [int(r.cell) for r in frows]
    assert len(cells) == len(set(cells)) <= AI.N_CELLS_2L
    # (prefix-vs-refined recall divergence is pinned by the registered
    # ann_index_2level_recall audit; the structural invariants above
    # are this test's contract)


# ---------------------------------------------------------------------------
# SQ8 arm (derived scalar-quantized table: add / search / append /
# compact / tombstones)


@pytest.fixture(scope="module")
def sq8_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index_sq8"))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index(spark, emb, d)
    AI.add_sq8_to_ann_index(spark, d)
    return d


def test_sq8_reader_requires_arm(spark, index_dir):
    """An index without the derived arm fails loudly, not with a
    missing-path scan error mid-plan."""
    with pytest.raises(ValueError, match="SQ8"):
        AI.ann_index_sq8_topk(spark, index_dir, _queries(spark), K)


def test_sq8_rerank_with_full_shortlist_equals_ivf_flat(spark, sq8_dir):
    """Semantics anchor, same contract as the PQ rerank twin: with the
    shortlist covering the probed population, SQ8-shortlist +
    exact-rerank equals the IVF-Flat reader EXACTLY — quantization can
    trim the shortlist, never reorder the exact stage."""
    qs = _queries(spark)
    full = _rows(AI.ann_index_sq8_topk(spark, sq8_dir, qs, K, 10**9))
    flat = _rows(AI.ann_index_ivf_topk(spark, sq8_dir, qs, K))
    assert full == flat and len(full) == len(QUERY_IDS) * K
    tight = AI.ann_index_sq8_topk(spark, sq8_dir, qs, K, K)
    assert tight.count() == len(QUERY_IDS) * K


def test_sq8_truncated_dims_identity_and_covering_exactness(spark, sq8_dir):
    """The dims knob's anchors: full-width slicing is the identity
    (dims=DIM bit-identical to the unsliced arm — the per-dim grid is
    independent, so the prefix of the trained grid IS the trained grid
    of the prefix), and a covering shortlist makes the truncated
    code-space stage unable to drop a candidate, so the exact rerank
    equals IVF-Flat even at dims=16."""
    qs = _queries(spark)
    full = _rows(AI.ann_index_sq8_topk(spark, sq8_dir, qs, K))
    ident = _rows(AI.ann_index_sq8_topk(spark, sq8_dir, qs, K, dims=S.DIM))
    assert ident == full
    cover = _rows(
        AI.ann_index_sq8_topk(spark, sq8_dir, qs, K, 10**9, dims=16)
    )
    assert cover == _rows(AI.ann_index_ivf_topk(spark, sq8_dir, qs, K))


@pytest.fixture(scope="module")
def sq8_2l_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index_2l_sq8"))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index_2level(spark, emb, d)
    AI.add_sq8_to_ann_index(spark, d)
    return d


def test_2level_sq8_truncated_dims_identity_and_covering(spark, sq8_2l_dir):
    """The dims knob's anchors on the TWO-LEVEL layout — same contract
    as the single-level composition: full-width slice is the identity,
    covering shortlist equals the flat 2-level reader at dims=16."""
    qs = _queries(spark)
    full = _rows(AI.ann_index_2level_sq8_topk(spark, sq8_2l_dir, qs, K))
    ident = _rows(
        AI.ann_index_2level_sq8_topk(spark, sq8_2l_dir, qs, K, dims=S.DIM)
    )
    assert ident == full
    cover = _rows(
        AI.ann_index_2level_sq8_topk(
            spark, sq8_2l_dir, qs, K, 10**9, dims=16
        )
    )
    assert cover == _rows(AI.ann_index_2level_topk(spark, sq8_2l_dir, qs, K))


def test_sq8_codes_match_driver_encoder_and_fit_byte_grid(spark, sq8_dir):
    """The JVM transform encoder and the driver-side query encoder are
    the same grid bit for bit (the convention pair every quantized arm
    pins: F.round HALF_UP == S._half_up), and training-corpus codes all
    land in [0, 255] — the 1-byte/dim storage claim."""
    vmin, scale = AI._read_sq_stats(spark, sq8_dir)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    want = {
        int(r.vec_id): [
            int(c) for c in AI._sq8_encode_np(r.embedding, vmin, scale)
        ]
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    }
    sq8 = spark.read.parquet(M.table_path(sq8_dir, "sq8"))
    got = {
        int(r.vec_id): list(r.codes)
        for r in sq8.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    }
    assert got == want
    lo, hi = sq8.select(
        F.min(F.array_min("codes")), F.max(F.array_max("codes"))
    ).first()
    assert 0 <= lo and hi <= 255


def test_sq8_append_uses_stored_grid_and_stays_exact(spark, tmp_path):
    """Append encodes against the STORED per-dim grid (immutable
    quantizer — sq_stats bit-identical across the append) and, because
    codes are unclipped, the two-stage search with a covering shortlist
    still equals IVF-Flat over the grown corpus."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "sq8_upsert")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_sq8_to_ann_index(spark, d)
    stats_before = _rows(spark.read.parquet(M.table_path(d, "sq_stats")))
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= half), d)
    assert (
        _rows(spark.read.parquet(M.table_path(d, "sq_stats")))
        == stats_before
    )
    # appended rows carry stored-grid codes (driver re-encode agrees)
    vmin, scale = AI._read_sq_stats(spark, d)
    probe_ids = [int(half), int(half) + 1]
    want = {
        int(r.vec_id): [
            int(c) for c in AI._sq8_encode_np(r.embedding, vmin, scale)
        ]
        for r in emb.filter(F.col("vec_id").isin(probe_ids)).collect()
    }
    got = {
        int(r.vec_id): list(r.codes)
        for r in spark.read.parquet(M.table_path(d, "sq8"))
        .filter(F.col("vec_id").isin(probe_ids))
        .collect()
    }
    assert got == want
    qs = _queries(spark)
    assert _rows(AI.ann_index_sq8_topk(spark, d, qs, K, 10**9)) == _rows(
        AI.ann_index_ivf_topk(spark, d, qs, K)
    )


def test_sq8_grid_drift_audit_reports_oob_while_search_stays_exact(
    spark, tmp_path
):
    """A deliberately drifted append population (components scaled past
    the trained grid's range) must surface in ann_index_stats as a
    non-zero sq8_oob_code_frac plus the rows-past-grid age, while the
    covering-shortlist search anchor still equals IVF-Flat (codes are
    unclipped, so exactness survives drift — the audit is about storage
    and resolution, not correctness). Pre-drift the fraction is exactly
    zero and the age anchor matches the trained row count."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    half = n // 2
    d = str(tmp_path / "sq8_drift")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_sq8_to_ann_index(spark, d)
    st = {r.table: r for r in AI.ann_index_stats(spark, d).collect()}
    assert st["sq8"].sq8_oob_code_frac == 0.0
    assert st["sq8"].sq8_rows_past_grid == 0
    assert st["raw"].sq8_oob_code_frac is None  # audit is sq8-only
    # the byte-footprint columns ground the storage ladder: the int8
    # codes table must sit well under the float raw table per row
    for t in ("raw", "sq8", "vectors"):
        assert st[t].bytes > 0 and st[t].bytes_per_row > 0, t
    assert st["sq8"].bytes_per_row < st["raw"].bytes_per_row

    # drifted appends: 3x the trained range on every component
    drifted = emb.filter(F.col("vec_id") >= half).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x * F.lit(3.0)).cast("float")
        ).alias("embedding"),
    )
    AI.append_to_ann_index(spark, drifted, d)
    st = {r.table: r for r in AI.ann_index_stats(spark, d).collect()}
    assert st["sq8"].sq8_oob_code_frac > 0.0
    assert st["sq8"].sq8_rows_past_grid == n - half
    # exactness anchor unharmed by OOB codes
    qs = _queries(spark)
    assert _rows(AI.ann_index_sq8_topk(spark, d, qs, K, 10**9)) == _rows(
        AI.ann_index_ivf_topk(spark, d, qs, K)
    )
    # the drift-only reader returns the same numbers from ONE sq8
    # aggregate (the registered query's shape)
    row = AI.sq8_drift_stats(spark, d).collect()[0]
    assert row.sq8_oob_code_frac == st["sq8"].sq8_oob_code_frac
    assert row.sq8_rows_past_grid == st["sq8"].sq8_rows_past_grid
    # the retrain verb clears the audit (grid re-derived over the union)
    AI.add_sq8_to_ann_index(spark, d)
    st = {r.table: r for r in AI.ann_index_stats(spark, d).collect()}
    assert st["sq8"].sq8_oob_code_frac == 0.0
    assert st["sq8"].sq8_rows_past_grid == 0
    # net-growth semantics: compacted deletes shrink the corpus below
    # what the grid trained on — the documented negative reading
    victims = [int(r.vec_id) for r in emb.limit(5).collect()]
    AI.delete_from_ann_index(spark, victims, d)
    AI.compact_ann_index(spark, d)
    st = {r.table: r for r in AI.ann_index_stats(spark, d).collect()}
    assert st["sq8"].sq8_rows_past_grid == -len(victims)
    # no arm => loud, like the sq8 readers
    d_raw = str(tmp_path / "no_arm")
    AI.build_ann_index(spark, emb, d_raw)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        AI.sq8_drift_stats(spark, d_raw)


def test_sq8_tombstones_and_compaction(spark, tmp_path):
    """Tombstoned ids vanish from SQ8 search logically; compaction
    includes the sq8 table (one file-set per cell again, deletes
    applied physically) and preserves results bit for bit."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "sq8_compact")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_sq8_to_ann_index(spark, d)
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= half), d)
    qs = _queries(spark)
    baseline = AI.ann_index_sq8_topk(spark, d, qs, K).collect()
    victims = sorted({int(r.vec_id) for r in baseline})
    assert victims
    AI.delete_from_ann_index(spark, victims, d)
    logical = _rows(AI.ann_index_sq8_topk(spark, d, qs, K))
    assert logical
    hit_ids = {
        int(r.vec_id) for r in AI.ann_index_sq8_topk(spark, d, qs, K).collect()
    }
    assert not (hit_ids & set(victims))
    res = AI.compact_ann_index(spark, d)
    assert "sq8" in res  # the derived arm joins the maintenance map
    n_cells = (
        spark.read.parquet(M.table_path(d, "sq8"))
        .select("cell")
        .distinct()
        .count()
    )
    assert res["sq8"]["files_after"] == n_cells
    assert _rows(AI.ann_index_sq8_topk(spark, d, qs, K)) == logical


def test_2level_sq8_arm_lifecycle(spark, tmp_path):
    """The SQ8 arm on the sharded-quantizer layout: derived under the
    (group, cell) key, covering-shortlist search equals the 2-level
    IVF-Flat reader exactly, appends encode with the STORED grid
    (sq_stats bit-identical), and compaction rewrites the arm to one
    file-set per (group, cell) with results preserved."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "sq8_2l")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") < half), d)
    qs = _queries(spark)
    with pytest.raises(ValueError, match="SQ8"):
        AI.ann_index_2level_sq8_topk(spark, d, qs, K)
    AI.add_sq8_to_ann_index(spark, d)
    # partitioned under the layout's composed key
    part_cols = {
        tuple(sorted(c for c in ("group", "cell") if f"{c}=" in p))
        for p in AI._data_files(M.table_path(d, "sq8"))
    }
    assert part_cols == {("cell", "group")}
    assert _rows(AI.ann_index_2level_sq8_topk(spark, d, qs, K, 10**9)) == (
        _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    )
    stats_before = _rows(spark.read.parquet(M.table_path(d, "sq_stats")))
    AI.append_to_ann_index_2level(
        spark, emb.filter(F.col("vec_id") >= half), d
    )
    assert (
        _rows(spark.read.parquet(M.table_path(d, "sq_stats")))
        == stats_before
    )
    grown = _rows(AI.ann_index_2level_sq8_topk(spark, d, qs, K, 10**9))
    assert grown == _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    res = AI.compact_ann_index(spark, d)
    assert "sq8" in res
    n_parts = (
        spark.read.parquet(M.table_path(d, "sq8"))
        .select("group", "cell")
        .distinct()
        .count()
    )
    assert res["sq8"]["files_after"] == n_parts
    assert _rows(AI.ann_index_2level_sq8_topk(spark, d, qs, K, 10**9)) == grown


def test_sq8_plan_is_pruned_and_corpus_free(spark, sq8_dir):
    """The SQ8 search plan honors the artifact contract like every
    other reader: the codes scan partition-prunes to the probed cells
    and the plan never touches the raw corpus parquet."""
    import re

    df = AI.ann_index_sq8_topk(spark, sq8_dir, _queries(spark), K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in df._jdf.queryExecution().toString()
    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("cell" in x and " IN " in x for x in pf), pf


def test_2level_rebuild_invalidates_sq8_arm(spark, tmp_path):
    """Rebuilding a two-level index over a dir that carried an SQ8 arm
    must drop the manifest flag (the grid was trained on the old
    corpus): the reader fails loudly until add_sq8 re-derives it —
    never serves stale codes."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "rebuild_2l")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") < 100), d)
    AI.add_sq8_to_ann_index(spark, d)
    assert M.read_meta(d, AI._SQ8_KEY) is True
    AI.build_ann_index_2level(spark, emb, d)
    assert M.read_meta(d, AI._SQ8_KEY) is False
    with pytest.raises(ValueError, match="SQ8"):
        AI.ann_index_2level_sq8_topk(spark, d, _queries(spark), K)
    AI.add_sq8_to_ann_index(spark, d)
    got = _rows(AI.ann_index_2level_sq8_topk(spark, d, _queries(spark), K, 10**9))
    assert got == _rows(AI.ann_index_2level_topk(spark, d, _queries(spark), K))


def test_sq8_prefix_arm_bit_identity_and_lifecycle(spark, tmp_path):
    """The materialized prefix-codes arm (sq8_prefix/) must be
    INVISIBLE in results: a store carrying it answers every truncated
    width at or under the materialized width bit-identically to a twin
    store without it (per-dim grid independence), while the probed
    scan actually switches to the prefix table (plan-pinned — the
    scan-side IO cut is the arm's whole point). Lifecycle: appends
    land sliced rows alongside the full codes, compaction covers the
    table, a grid retrain re-derives it, a rebuild invalidates it."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d_arm = str(tmp_path / "with_arm")
    d_twin = str(tmp_path / "no_arm")
    for d in (d_arm, d_twin):
        AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
        AI.add_sq8_to_ann_index(spark, d)
    AI.add_sq8_prefix_to_ann_index(spark, d_arm)  # default width 16
    assert M.read_meta(d_arm, AI._SQ8_PREFIX_DIMS_KEY) == S.MRL_DIMS
    qs = _queries(spark)

    def trunc(d, dims):
        return _rows(AI.ann_index_sq8_topk(spark, d, qs, K, dims=dims))

    # bit-identity at the materialized width, below it, and (fallback
    # to the full codes table) above it
    for dims in (16, 8, 32, None):
        assert trunc(d_arm, dims) == trunc(d_twin, dims), dims
    # the dims<=width scan reads the prefix table, not the full codes
    # (widen the metadata string limit: the default 100 truncates the
    # long pytest tmp path out of the Location entry)
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = AI.ann_index_sq8_topk(spark, d_arm, qs, K, dims=16)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "/sq8_prefix" in plan  # the table dir, not the test name
        full_plan = (
            AI.ann_index_sq8_topk(spark, d_arm, qs, K)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "/sq8_prefix" not in full_plan
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    # appends maintain the arm (sliced rows land alongside)
    for d in (d_arm, d_twin):
        AI.append_to_ann_index(
            spark, emb.filter(F.col("vec_id") >= half), d
        )
    for dims in (16, 8, None):
        assert trunc(d_arm, dims) == trunc(d_twin, dims), dims
    n_sq8 = spark.read.parquet(M.table_path(d_arm, "sq8")).count()
    pfx = spark.read.parquet(M.table_path(d_arm, "sq8_prefix"))
    assert pfx.count() == n_sq8
    assert pfx.select(F.max(F.size("codes"))).collect()[0][0] == S.MRL_DIMS
    # tombstones + compaction ride the same lifecycle (prefix table is
    # in the maintenance map, anti-joined and rewritten)
    victims = [int(r.vec_id) for r in emb.limit(3).collect()]
    for d in (d_arm, d_twin):
        AI.delete_from_ann_index(spark, victims, d)
    res_arm = AI.compact_ann_index(spark, d_arm)
    AI.compact_ann_index(spark, d_twin)
    assert "sq8_prefix" in res_arm
    for dims in (16, None):
        assert trunc(d_arm, dims) == trunc(d_twin, dims), dims
    assert (
        spark.read.parquet(M.table_path(d_arm, "sq8_prefix")).count()
        == spark.read.parquet(M.table_path(d_arm, "sq8")).count()
    )
    # a grid retrain re-derives the arm from the fresh codes
    for d in (d_arm, d_twin):
        AI.add_sq8_to_ann_index(spark, d)
    assert M.read_meta(d_arm, AI._SQ8_PREFIX_DIMS_KEY) == S.MRL_DIMS
    for dims in (16, 8):
        assert trunc(d_arm, dims) == trunc(d_twin, dims), dims
    # a rebuild invalidates the arm with the rest of the SQ8 state
    AI.build_ann_index(spark, emb, d_arm)
    assert M.read_meta(d_arm, AI._SQ8_PREFIX_DIMS_KEY) is None
    # and the verb refuses a store with no SQ8 arm
    with pytest.raises(ValueError, match="SQ8"):
        AI.add_sq8_prefix_to_ann_index(spark, d_arm)


def test_2level_sq8_prefix_arm_bit_identity(spark, tmp_path):
    """The prefix arm on the sharded-quantizer layout: (group, cell)
    partitioning, bit-identical truncated results vs the slice-side
    twin, appends maintained, plan scans the prefix table."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d_arm = str(tmp_path / "arm_2l")
    d_twin = str(tmp_path / "twin_2l")
    for d in (d_arm, d_twin):
        AI.build_ann_index_2level(
            spark, emb.filter(F.col("vec_id") < half), d
        )
        AI.add_sq8_to_ann_index(spark, d)
    AI.add_sq8_prefix_to_ann_index(spark, d_arm)
    part_cols = {
        tuple(sorted(c for c in ("group", "cell") if f"{c}=" in p))
        for p in AI._data_files(M.table_path(d_arm, "sq8_prefix"))
    }
    assert part_cols == {("cell", "group")}
    qs = _queries(spark)

    def trunc(d, dims):
        return _rows(
            AI.ann_index_2level_sq8_topk(spark, d, qs, K, dims=dims)
        )

    for dims in (16, 8, None):
        assert trunc(d_arm, dims) == trunc(d_twin, dims), dims
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = (
            AI.ann_index_2level_sq8_topk(spark, d_arm, qs, K, dims=16)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "/sq8_prefix" in plan  # the table dir, not the test name
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    for d in (d_arm, d_twin):
        AI.append_to_ann_index_2level(
            spark, emb.filter(F.col("vec_id") >= half), d
        )
    for dims in (16, 8, None):
        assert trunc(d_arm, dims) == trunc(d_twin, dims), dims


def test_sq8_drift_counters_match_exact_scan(spark, tmp_path):
    """The O(metadata) manifest counters must agree EXACTLY with the
    full-table aggregate after every lifecycle transition — retrain
    stamp, clean append, drifted append, and post-compaction restamp
    (with the auto-retrain disabled to isolate the accounting)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "counters")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_sq8_to_ann_index(spark, d)

    def agree():
        inc = AI._sq8_drift_numbers(spark, d)
        ex = AI._sq8_drift_numbers(spark, d, exact=True)
        assert inc == ex
        return inc

    assert agree() == (0.0, half, 0)
    # drifted append: counters accumulate the batch's own aggregate
    drifted = emb.filter(F.col("vec_id") >= half).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x * F.lit(3.0)).cast("float")
        ).alias("embedding"),
    )
    AI.append_to_ann_index(spark, drifted, d)
    frac, n_rows, past = agree()
    assert frac > 0.0 and past == emb.count() - half
    # compaction (auto-retrain off) applies tombstones physically and
    # restamps the counters exactly
    victims = [int(r.vec_id) for r in emb.limit(4).collect()]
    AI.delete_from_ann_index(spark, victims, d)
    AI.compact_ann_index(spark, d, sq8_drift_check=False)
    frac2, n2, past2 = agree()
    assert n2 == emb.count() - len(victims)
    # stats and the drift-only reader serve the counter numbers
    row = AI.sq8_drift_stats(spark, d).collect()[0]
    assert (row.sq8_oob_code_frac, row.sq8_rows_past_grid) == (frac2, past2)


def test_compaction_auto_retrains_drifted_sq8(spark, tmp_path):
    """The no-knob drift response: a store whose append distribution
    walked past the trained grid (oob_frac > the documented 1%) must
    auto-heal on compaction — grid re-derived, every vector re-encoded,
    prefix arm re-landed, counters reset, manifest records the retrain
    — while covering-shortlist search stays exactly IVF-Flat. A second
    store triggers via the GROWTH rule (corpus more than doubled past
    the grid) with no OOB at all."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    half = n // 2
    qs = _queries(spark)

    d = str(tmp_path / "oob_drift")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_sq8_to_ann_index(spark, d)
    AI.add_sq8_prefix_to_ann_index(spark, d)
    drifted = emb.filter(F.col("vec_id") >= half).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x * F.lit(3.0)).cast("float")
        ).alias("embedding"),
    )
    AI.append_to_ann_index(spark, drifted, d)
    frac_before, _, _ = AI._sq8_drift_numbers(spark, d)
    assert frac_before > AI.SQ8_RETRAIN_OOB_FRAC
    res = AI.compact_ann_index(spark, d)
    assert res["sq8_retrain"]["oob_frac"] == frac_before
    assert M.read_meta(d, "__sq8_last_retrain__") == res["sq8_retrain"]
    frac_after, n_rows, past = AI._sq8_drift_numbers(spark, d)
    assert frac_after == 0.0 and past == 0 and n_rows == n
    assert AI._sq8_drift_numbers(spark, d, exact=True) == (0.0, n, 0)
    # the prefix arm re-derived against the retrained grid
    assert M.read_meta(d, AI._SQ8_PREFIX_DIMS_KEY) == S.MRL_DIMS
    assert (
        spark.read.parquet(M.table_path(d, "sq8_prefix")).count() == n
    )
    # exactness anchor: covering shortlist still equals IVF-Flat
    assert _rows(AI.ann_index_sq8_topk(spark, d, qs, K, 10**9)) == _rows(
        AI.ann_index_ivf_topk(spark, d, qs, K)
    )

    # growth-rule trigger: tiny trained prefix, large clean append
    d2 = str(tmp_path / "growth_drift")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < 100), d2)
    AI.add_sq8_to_ann_index(spark, d2)
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= 100), d2)
    _, _, past2 = AI._sq8_drift_numbers(spark, d2)
    assert past2 > AI.SQ8_RETRAIN_GROWTH * 100
    res2 = AI.compact_ann_index(spark, d2)
    assert res2["sq8_retrain"]["rows_past_grid"] == past2
    assert AI._sq8_drift_numbers(spark, d2) == (0.0, n, 0)
    # and a clean store does NOT retrain
    res3 = AI.compact_ann_index(spark, d2)
    assert "sq8_retrain" not in res3


# --------------------------------------------------------------------------
# Binary (1-bit sign) arm: packed-word Hamming shortlist + exact rerank.


@pytest.fixture(scope="module")
def binary_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index_binary"))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index(spark, emb, d)
    AI.add_binary_to_ann_index(spark, d)
    return d


def test_binary_reader_requires_arm(spark, index_dir):
    """Same fail-loudly contract as the SQ8 reader: no arm, no scan."""
    with pytest.raises(ValueError, match="binary"):
        AI.ann_index_binary_topk(spark, index_dir, _queries(spark), K)


def test_pack_bits_matches_unpacked_hamming():
    """The packed-word representation is EXACTLY the unpacked bit
    vector: for random multi-word inputs (70 dims → 2 longs, bit 63
    exercised in the sign position) the xor/popcount Hamming over the
    packed words equals the direct unequal-bit count, and the pad bits
    contribute nothing."""
    import numpy as np

    rng = np.random.default_rng(7)
    bits = rng.random((40, 70)) > 0.5
    words = AI._pack_bits(bits)
    assert words.shape == (40, 2) and words.dtype == np.int64
    # sign bit reachable: some word must be negative with p ~ 1
    assert (words < 0).any()
    direct = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
    u = words.view(np.uint64)
    packed = np.zeros_like(direct)
    for w in range(u.shape[1]):
        x = u[:, None, w] ^ u[None, :, w]
        packed += np.vectorize(lambda v: bin(int(v)).count("1"))(x)
    assert (packed == direct).all()


def test_binary_words_match_driver_encoder_and_midrange(spark, binary_dir):
    """The stored words re-derive exactly from raw/ with the driver
    encoder, and the stored thresholds are the per-dim midrange of the
    corpus (exact under any summation order — the property that makes
    the DuckDB twin bit-identical)."""
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    mat = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    want_thresh = (mat.min(axis=0) + mat.max(axis=0)) / 2.0
    thresh = AI._read_bin_thresh(spark, binary_dir)
    assert np.array_equal(thresh, want_thresh)
    stored = {
        int(r.vec_id): list(r.words)
        for r in spark.read.parquet(
            M.table_path(binary_dir, "binary")
        ).collect()
    }
    assert len(stored) == mat.shape[0]
    for vid in (0, 1, 17, len(stored) - 1):
        assert stored[vid] == AI._binary_encode_np(mat[vid], thresh), vid


def test_binary_rerank_with_full_shortlist_equals_ivf_flat(
    spark, binary_dir
):
    """Semantics anchor, same contract as the SQ8/PQ rerank twins: a
    covering shortlist makes the Hamming stage unable to drop a
    candidate, so binary-shortlist + exact-rerank equals the IVF-Flat
    reader EXACTLY; a tight shortlist still returns k rows per query."""
    qs = _queries(spark)
    full = _rows(AI.ann_index_binary_topk(spark, binary_dir, qs, K, 10**9))
    flat = _rows(AI.ann_index_ivf_topk(spark, binary_dir, qs, K))
    assert full == flat and len(full) == len(QUERY_IDS) * K
    tight = AI.ann_index_binary_topk(spark, binary_dir, qs, K, K)
    assert tight.count() == len(QUERY_IDS) * K


def test_binary_plan_is_pruned_jvm_only_shortlist(spark, binary_dir):
    """The binary plan honors the artifact contract (partition-pruned
    words scan, no corpus parquet) AND the arm's distinguishing claim:
    the whole query — Hamming shortlist AND the bounded exact rerank
    (cosine_rounded since r13) — runs with NO Python evaluation at
    all."""
    import re

    df = AI.ann_index_binary_topk(spark, binary_dir, _queries(spark), K)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "embeddings.parquet" not in qe.toString()
    pf = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("cell" in x and " IN " in x for x in pf), pf
    # zero Python-eval nodes: the rerank cosine is a JVM expression
    n_python = plan.count("ArrowEvalPython") + plan.count(
        "BatchEvalPython"
    )
    assert n_python == 0, plan


def test_binary_append_uses_stored_thresholds_and_counters(
    spark, tmp_path
):
    """Append encodes against the STORED midrange thresholds (immutable
    quantizer — bin_stats bit-identical across the append), the
    bit-balance counters accumulate to exactly the full-table recount,
    and the covering-shortlist search still equals IVF-Flat over the
    grown corpus."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "binary_upsert")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_binary_to_ann_index(spark, d)
    stats_before = _rows(spark.read.parquet(M.table_path(d, "bin_stats")))
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= half), d)
    assert (
        _rows(spark.read.parquet(M.table_path(d, "bin_stats")))
        == stats_before
    )
    thresh = AI._read_bin_thresh(spark, d)
    probe_ids = [int(half), int(half) + 1]
    want = {
        int(r.vec_id): AI._binary_encode_np(r.embedding, thresh)
        for r in emb.filter(F.col("vec_id").isin(probe_ids)).collect()
    }
    got = {
        int(r.vec_id): list(r.words)
        for r in spark.read.parquet(M.table_path(d, "binary"))
        .filter(F.col("vec_id").isin(probe_ids))
        .collect()
    }
    assert got == want
    # counter-vs-exact equality across the append transition
    assert AI._binary_drift_numbers(spark, d) == AI._binary_drift_numbers(
        spark, d, exact=True
    )
    qs = _queries(spark)
    assert _rows(AI.ann_index_binary_topk(spark, d, qs, K, 10**9)) == _rows(
        AI.ann_index_ivf_topk(spark, d, qs, K)
    )


def test_binary_tombstones_compaction_and_growth_retrain(spark, tmp_path):
    """Lifecycle sweep: tombstoned rows vanish from the binary search;
    compaction preserves results, restamps the balance counters
    exactly, and — on a store whose corpus more than doubled past the
    trained thresholds — auto-retrains the arm (manifest evidence,
    counters reset, search anchor still exact)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    d = str(tmp_path / "binary_life")
    AI.build_ann_index(spark, emb, d)
    AI.add_binary_to_ann_index(spark, d)
    qs = _queries(spark)
    base = _rows(AI.ann_index_binary_topk(spark, d, qs, K, 10**9))
    victim = int(base[0].split("vec_id=")[1].split(",")[0].rstrip(")"))
    AI.delete_from_ann_index(spark, [victim], d)
    after = _rows(AI.ann_index_binary_topk(spark, d, qs, K, 10**9))
    assert not any(f"vec_id={victim}" in r for r in after)
    res = AI.compact_ann_index(spark, d)
    assert "binary" in res
    assert "binary_retrain" not in res  # balance unchanged, no growth
    assert _rows(AI.ann_index_binary_topk(spark, d, qs, K, 10**9)) == after
    assert AI._binary_drift_numbers(spark, d) == AI._binary_drift_numbers(
        spark, d, exact=True
    )

    # growth-rule trigger: tiny trained prefix, large clean append
    d2 = str(tmp_path / "binary_growth")
    AI.build_ann_index(spark, emb.filter(F.col("vec_id") < 100), d2)
    AI.add_binary_to_ann_index(spark, d2)
    AI.append_to_ann_index(spark, emb.filter(F.col("vec_id") >= 100), d2)
    _, _, past = AI._binary_drift_numbers(spark, d2)
    assert past > AI.BINARY_RETRAIN_GROWTH * 100
    res2 = AI.compact_ann_index(spark, d2)
    assert res2["binary_retrain"]["rows_past_train"] == past
    frac, rows, past2 = AI._binary_drift_numbers(spark, d2)
    assert (rows, past2) == (n, 0)
    # retrained thresholds are the FULL corpus's midrange now
    assert M.read_meta(d2, AI._BINARY_TRAINED_ROWS_KEY) == n
    assert _rows(
        AI.ann_index_binary_topk(spark, d2, qs, K, 10**9)
    ) == _rows(AI.ann_index_ivf_topk(spark, d2, qs, K))
    # and a clean store does NOT retrain again
    res3 = AI.compact_ann_index(spark, d2)
    assert "binary_retrain" not in res3


def test_2level_binary_arm_lifecycle(spark, tmp_path):
    """The binary arm on the sharded-quantizer layout: derive, search
    (covering shortlist == 2-level flat), append against stored
    thresholds, rebuild orphans the arm (fail-loudly), re-derive."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half = emb.count() // 2
    d = str(tmp_path / "binary_2l")
    AI.build_ann_index_2level(spark, emb.filter(F.col("vec_id") < half), d)
    AI.add_binary_to_ann_index(spark, d)
    qs = _queries(spark)
    assert _rows(
        AI.ann_index_2level_binary_topk(spark, d, qs, K, 10**9)
    ) == _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    AI.append_to_ann_index_2level(spark, emb.filter(F.col("vec_id") >= half), d)
    assert AI._binary_drift_numbers(spark, d) == AI._binary_drift_numbers(
        spark, d, exact=True
    )
    assert _rows(
        AI.ann_index_2level_binary_topk(spark, d, qs, K, 10**9)
    ) == _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    AI.build_ann_index_2level(spark, emb, d)
    assert M.read_meta(d, AI._BINARY_KEY) is False
    with pytest.raises(ValueError, match="binary"):
        AI.ann_index_2level_binary_topk(spark, d, qs, K)


# --------------------------------------------------------------------------
# The cascade: binary -> SQ8 -> exact, the ladder composed.


@pytest.fixture(scope="module")
def cascade_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index_cascade"))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    AI.build_ann_index(spark, emb, d)
    AI.add_sq8_to_ann_index(spark, d)
    AI.add_binary_to_ann_index(spark, d)
    return d


def test_cascade_requires_both_arms(spark, sq8_dir, binary_dir):
    """Each missing arm fails loudly with its own derive hint."""
    with pytest.raises(ValueError, match="binary"):
        AI.ann_index_cascade_topk(spark, sq8_dir, _queries(spark), K)
    with pytest.raises(ValueError, match="SQ8"):
        AI.ann_index_cascade_topk(spark, binary_dir, _queries(spark), K)


def test_cascade_covering_anchors(spark, cascade_dir):
    """The cascade's two collapse anchors: a covering COARSE shortlist
    makes stage 1 unable to drop a candidate, so the cascade equals
    the plain SQ8 two-stage search at the same shortlist; covering
    BOTH shortlists collapses it to IVF-Flat. And the defaulted
    cascade still returns k rows per query."""
    qs = _queries(spark)
    assert _rows(
        AI.ann_index_cascade_topk(spark, cascade_dir, qs, K, 4 * K, 10**9)
    ) == _rows(AI.ann_index_sq8_topk(spark, cascade_dir, qs, K, 4 * K))
    assert _rows(
        AI.ann_index_cascade_topk(spark, cascade_dir, qs, K, 10**9, 10**9)
    ) == _rows(AI.ann_index_ivf_topk(spark, cascade_dir, qs, K))
    assert (
        AI.ann_index_cascade_topk(spark, cascade_dir, qs, K).count()
        == len(QUERY_IDS) * K
    )


def test_cascade_first_two_stages_are_jvm_only(spark, cascade_dir):
    """The cascade's distinguishing plan property: ALL three stages —
    Hamming, integer code L2, and (since r13) the bounded final cosine
    rerank — run with no Python evaluation at all."""
    df = AI.ann_index_cascade_topk(spark, cascade_dir, _queries(spark), K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 0
    ), plan


def test_2level_cascade_covering_anchor(spark, tmp_path):
    """The cascade on the sharded-quantizer layout: covering both
    shortlists collapses to the 2-level flat reader."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    d = str(tmp_path / "cascade_2l")
    AI.build_ann_index_2level(spark, emb, d)
    AI.add_sq8_to_ann_index(spark, d)
    AI.add_binary_to_ann_index(spark, d)
    qs = _queries(spark)
    assert _rows(
        AI.ann_index_2level_cascade_topk(
            spark, d, qs, K, 10**9, 10**9
        )
    ) == _rows(AI.ann_index_2level_topk(spark, d, qs, K))
    assert (
        AI.ann_index_2level_cascade_topk(spark, d, qs, K).count()
        == len(QUERY_IDS) * K
    )
