"""Persisted on-disk ANN index (SURVEY X3 — the 100 TB artifact).

The in-session ANN family (operators/similarity.py) stages its IVF cell
assignment, PQ codes, and LSH bands with ``persist()`` — right for one
session, but a user re-attaching to the corpus would rebuild everything.
This module is the missing operational half: ``build_ann_index`` writes
the staging tables ONCE as layout-aware parquet, and the ``ann_index_*``
readers answer top-k from the artifact alone — a fresh SparkSession
never touches the raw corpus again (pinned by
tests/test_ann_index.py::test_fresh_session_answers_from_index).

Layout (all under ``index_dir``):

- ``centroids/``   (cell, c_emb) — the IVF coarse quantizer, tiny.
- ``codebook/``    (subspace, dim, cell, ic) — PQ centroid components in
  the exact-integer domain (PQ_INT_SCALE), m×k×sub rows, tiny.
- ``vectors/``     (vec_id, codes array<int>) **partitioned by cell** —
  the PQ-encoded corpus, ONE row per vector with the PQ_M codes packed
  into an array (the long form repeated the 8-byte vec_id per subspace
  — 4x the rows and bytes for 4x 4-bit payloads). Probing n_probe of
  n_centroids cells is a partition-pruned scan reading
  ~n_probe/n_centroids of log2(PQ_K)·PQ_M bits per vector: both IVF-PQ
  pruning axes fall out of the layout, and ADC scoring is a MAP-SIDE
  array expression over the broadcast flattened LUT (no per-subspace
  join, no (q_id, vec_id) re-aggregation shuffle).
- ``raw/``         (vec_id, embedding) **partitioned by cell** — the
  IVF-Flat rerank arm: exact cosine inside probed cells only.
- ``lsh_buckets/`` (vec_id, bucket) **partitioned by table_id** — the
  random-hyperplane bands for candidate generation.

Query-side terms (probe selection, the per-query ADC lookup table, the
query's LSH bucket signatures) are computed on the DRIVER from the tiny
centroid/codebook tables: queries × n_centroids cosines and
queries × m × k integer distances — metadata-scale by construction, and
bit-identical to the distributed formulas (same np.round/einsum
conventions as similarity.cosine_batch / pq_distances), so results
hash-match the in-session ann_*_topk oracles exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rds_pgbadger_etl_spark.operators import index_maintenance as M
from rds_pgbadger_etl_spark.operators import similarity as S

Query = tuple[int, list[float]]


AUTO_CELL_ROWS = 65_536  # target IVF cell volume for auto sizing
AUTO_MAX_CELLS = 4_096
# Fine-cell ceiling for the SHIPPED two-level build: quantizer training
# collects the max(n_groups, n_cells) prefix to the driver and
# _group_of_cells does a dense n_cells x n_groups matmul — ~1M cells
# (256 MB of float64 centroids at DIM=64) is where that pass stops
# being driver-feasible. The (group, cell) LAYOUT itself would carry
# AUTO_MAX_CELLS**2 cells; raising this cap means distributing the
# quantizer-assignment pass, not changing the layout or any reader.
AUTO_MAX_CELLS_2L = 2**20

# Two-level IVF defaults for the registered benchmark queries (tiny
# fixture corpora; production shapes come from auto_quantizer_shape).
N_GROUPS_2L = 4
N_CELLS_2L = 16
N_PROBE_GROUPS = 2

# On-disk layout version, stamped into the generation manifest by every
# build and checked by append/read/compact. Version 2 = the packed
# ``vectors/`` schema (one (vec_id, codes array<int>) row per vector;
# 2-level dirs additionally require vectors/ + codebook/). Artifacts
# from before the stamp existed (or from the long-form (vec_id,
# subspace, code) era) have no marker and fail loudly with a rebuild
# message instead of, e.g., an append writing mixed-schema parquet into
# one table — a corruption that only surfaces at read time.
LAYOUT_VERSION = 2
_LAYOUT_KEY = "__ann_layout__"
_LAYOUT_OK: set[str] = set()  # per-process memo: one manifest read per dir


def _stamp_layout(index_dir: str) -> None:
    M.write_meta(index_dir, _LAYOUT_KEY, LAYOUT_VERSION)
    _LAYOUT_OK.add(index_dir)


def _check_layout(index_dir: str) -> None:
    if index_dir in _LAYOUT_OK:
        return
    got = M.read_meta(index_dir, _LAYOUT_KEY)
    if got != LAYOUT_VERSION:
        raise ValueError(
            f"ANN index at {index_dir!r} has layout version {got!r}, "
            f"expected {LAYOUT_VERSION} (the packed vectors/ schema). "
            "It predates the current on-disk format — rebuild it with "
            "build_ann_index / build_ann_index_2level before appending, "
            "searching, or compacting."
        )
    _LAYOUT_OK.add(index_dir)


def auto_n_centroids(n_vecs: int, n_probe: int = S.N_PROBE) -> int:
    """Measured-calibrated coarse-quantizer size for ``n_vecs`` vectors:
    hold cell volume at ~AUTO_CELL_ROWS rows, capped at AUTO_MAX_CELLS.

    FLOP balance alone (probe cost ``a*C`` vs cell-scan cost
    ``b*n_probe*n/C``) says ``C* = sqrt(n_probe*n)`` — but on a
    file-per-cell parquet layout per-file constants (listing, open,
    footer, row-group minima) dominate once cells shrink: the 4M-vector
    rehearsal measured C=2048 (the sqrt point, ~2k-row cells) at 3x the
    point-search latency and ~2x the build/append/compact cost of
    C=32..64 (~65-125k-row cells), while flag-batch throughput between
    the two differed by <2x (BENCH_NOTES "centroid scaling at 4M").
    Constant cell volume also makes per-batch ingest-flag cost flat in
    corpus size (the incremental_ann contract) instead of linear.

    Power-of-two so cell counts are stable across nearby corpus sizes;
    floored at N_CENTROIDS; capped at AUTO_MAX_CELLS (~270M rows on) —
    past the cap, cells fatten again and a deployment should shard the
    quantizer instead (IMI / two-level IVF), which changes the layout,
    not this rule. ``n_probe`` is accepted for signature stability but
    the volume rule does not depend on it.
    """
    import math

    cells = n_vecs / AUTO_CELL_ROWS
    pow2 = 2 ** round(math.log2(cells)) if cells >= 1 else 1
    return int(min(AUTO_MAX_CELLS, max(S.N_CENTROIDS, pow2)))


def auto_quantizer_shape(n_vecs: int) -> tuple[int, int]:
    """Quantizer shape past the AUTO_MAX_CELLS wall: ``(n_groups,
    n_cells)``; ``n_groups == 1`` means single-level (use
    :func:`build_ann_index` with :func:`auto_n_centroids`).

    Single-level IVF holds cell volume at ~AUTO_CELL_ROWS up to
    AUTO_MAX_CELLS cells (~270M vectors); past the cap cells fatten
    linearly and per-probe scan cost grows with the corpus again. The
    two-level quantizer (coarse groups over fine cells — IMI/two-level
    IVF) removes the cap: total fine cells keep following the
    constant-volume rule UNCAPPED, and the cells are sharded into
    ~sqrt(n_cells) coarse groups so no single quantizer level exceeds
    ~sqrt of the uncapped count. Probe cost per query is then
    ``n_groups + n_probe_groups * n_cells / n_groups`` centroid cosines
    instead of ``n_cells`` — the driver/assignment-side wall that
    motivated the cap. Both levels stay power-of-two for stability
    across nearby corpus sizes.

    The rule clamps at AUTO_MAX_CELLS_2L fine cells (~6.9e10 rows at
    constant volume) — not the layout's theoretical AUTO_MAX_CELLS**2 —
    because the SHIPPED build trains the quantizers driver-side
    (build_ann_index_2level's prefix collect + _group_of_cells matmul),
    which is feasible to ~1M cells. Past the clamp, cells fatten
    linearly exactly as single-level does past ITS cap; recovering
    constant volume means distributing the quantizer-assignment pass,
    which changes no reader and no layout.
    """
    import math

    cells = n_vecs / AUTO_CELL_ROWS
    pow2 = 2 ** round(math.log2(cells)) if cells >= 1 else 1
    n_cells = int(max(S.N_CENTROIDS, pow2))
    if n_cells <= AUTO_MAX_CELLS:
        return 1, n_cells
    n_cells = min(n_cells, AUTO_MAX_CELLS_2L)
    n_groups = 2 ** round(math.log2(math.sqrt(n_cells)))
    return int(n_groups), n_cells


# Residual PQ (the FAISS IndexIVFPQ composition): encode r(x) = x - c(x)
# — the vector MINUS its IVF centroid — instead of x itself. Residuals
# concentrate around the origin with far less variance than raw
# vectors, so the SAME codebook size quantizes them finer and ADC
# distances sharpen; the cost is that the query-side LUT becomes
# per-(query, PROBED CELL): the query's residual depends on which cell
# is being scanned. Everything stays in the exact integer domain —
# residual components are DIFFERENCES of the standard half-up
# quantizations (ir = iv(x) - iv(c)), so codes and ADC sums remain
# bit-reproducible across engines and the DuckDB twin is plain integer
# arithmetic over the existing lf CTE.
_RESIDUAL_KEY = "__pq_residual__"

# How the residual knob was resolved: {"mode": "auto"|"explicit",
# "variance_ratio": float|None, "chosen_residual": bool} — stamped in
# the generation manifest so a store's encoding choice is auditable.
_RESIDUAL_MODE_KEY = "__pq_residual_mode__"

# residual="auto" picks residual encoding when the coarse quantizer
# captures locality: intra-cell variance E||x - c(x)||^2 well below the
# corpus variance E||x - mean||^2 means residuals concentrate near the
# origin and the codebook quantizes them finer (the clustered regime,
# measured 8x better ADC recall at 8M); on a corpus the cells DON'T
# compress (hash-uniform embeddings: ratio ~= 1) residual encoding is
# strictly worse (the registered negative control, 0.24 vs 0.40
# recall@10), so raw wins. 0.5 sits between the measured regimes
# (clustered rehearsal ~0.1, uniform fixture ~0.9) with wide margins.
RESIDUAL_AUTO_RATIO = 0.5

# diagnostic sample: 1-in-16 deterministic hash sample, plus the low-id
# prefix so tiny fixtures never sample empty
_VAR_SAMPLE_MOD = 16
_VAR_SAMPLE_PREFIX = 1024


def _assignment_variance_ratio(
    cells: DataFrame, cell_ids: np.ndarray, cents: np.ndarray
) -> float:
    """Intra-cell / global variance ratio of an assigned corpus — the
    residual="auto" diagnostic, computed from the assignment pass the
    build already materializes (no extra shuffle: one map-only pass over
    a deterministic hash sample, one metadata-sized partial per
    partition). intra = mean ||x - c(x)||^2 against the ASSIGNED
    centroid; global = mean ||x||^2 - ||mean x||^2 (the standard
    decomposition, so no second pass for the mean). ``cents`` is the
    FLOAT centroid matrix aligned with sorted ``cell_ids`` (non-
    contiguous fine-cell ids from a refined 2-level train are fine)."""
    sample = cells.filter(
        (F.pmod(F.abs(F.hash("vec_id")), F.lit(_VAR_SAMPLE_MOD)) == 0)
        | (F.col("vec_id") < _VAR_SAMPLE_PREFIX)
    ).select("embedding", "cell")
    ids = np.asarray(cell_ids, dtype="int64")
    cmat = np.asarray(cents, dtype=np.float64)

    def xc(pdf):
        x = np.vstack(pdf["embedding"].map(np.asarray).to_numpy()).astype(
            np.float64
        )
        return x, cmat[np.searchsorted(ids, pdf["cell"].to_numpy("int64"))]

    return _ratio_from_partials(_variance_partials(sample, xc))


_VAR_PARTIAL_SCHEMA = "n bigint, ss double, rss double, sv array<double>"


def _variance_partials(df: DataFrame, xc_of) -> list:
    """Metadata-sized (n, ss, rss, sv) variance partials, one row per
    Arrow batch of ``df``; ``xc_of(pdf)`` returns the batch's (vector,
    assigned-centroid) float64 matrices — the ONLY piece that differs
    between the driver and distributed diagnostics, so the statistics
    themselves cannot diverge."""

    def partials(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            x, c = xc_of(pdf)
            r = x - c
            yield pd.DataFrame(
                {
                    "n": pd.Series([len(x)], dtype="int64"),
                    "ss": [float((x * x).sum())],
                    "rss": [float((r * r).sum())],
                    "sv": [x.sum(axis=0).tolist()],
                }
            )

    return df.mapInPandas(partials, _VAR_PARTIAL_SCHEMA).collect()


def _ratio_from_partials(rows) -> float:
    """Reduce the metadata-sized (n, ss, rss, sv) partials into the
    intra-cell / global variance ratio."""
    n = sum(r.n for r in rows)
    if n == 0:
        return 1.0  # empty corpus: no locality evidence, keep raw
    ss = sum(r.ss for r in rows)
    rss = sum(r.rss for r in rows)
    mean = np.sum([r.sv for r in rows], axis=0) / n
    var_total = ss / n - float(mean @ mean)
    if var_total <= 0:  # all-identical corpus: residuals are exact
        return 0.0
    return (rss / n) / var_total


def _resolve_residual_auto(
    index_dir: str,
    residual: bool | str,
    cells: DataFrame,
    cell_ids: np.ndarray | None,
    cents: np.ndarray | None,
) -> bool:
    """Resolve the residual knob AFTER the assignment exists: explicit
    bools pass through; ``"auto"`` measures the variance ratio and
    chooses. Either way the choice and how it was made are stamped in
    the manifest (readers and appends dispatch off _RESIDUAL_KEY as
    before; _RESIDUAL_MODE_KEY is the audit trail)."""
    if residual == "auto":
        ratio = _assignment_variance_ratio(cells, cell_ids, cents)
        chosen = ratio < RESIDUAL_AUTO_RATIO
        M.write_meta(
            index_dir,
            _RESIDUAL_MODE_KEY,
            {
                "mode": "auto",
                "variance_ratio": round(float(ratio), 4),
                "chosen_residual": bool(chosen),
            },
        )
    else:
        chosen = bool(residual)
        M.write_meta(
            index_dir,
            _RESIDUAL_MODE_KEY,
            {
                "mode": "explicit",
                "variance_ratio": None,
                "chosen_residual": chosen,
            },
        )
    M.write_meta(index_dir, _RESIDUAL_KEY, bool(chosen))
    return chosen


def _int_centroids(mat: np.ndarray) -> np.ndarray:
    """half-up integer components of the centroid matrix — the same
    PQ_INT_SCALE quantization pq_long_form applies to corpus vectors,
    so residual components are differences of like-quantized values."""
    return S._half_up(np.asarray(mat, dtype=np.float64) * S.PQ_INT_SCALE)


def _pq_encode_residual_udf(rcb: np.ndarray, icent: np.ndarray):
    """Vectorized residual-PQ encoder: per row, quantize the embedding
    (HALF_UP), subtract the row's OWN cell centroid's integer
    components, then argmin exact integer squared distances per
    subspace against the residual codebook (first-minimum = lower cell,
    the pq_codes tie-break). Takes (embedding, cell) columns."""
    m, _k, sub = rcb.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(emb: pd.Series, cell: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        ir = S._half_up(x * S.PQ_INT_SCALE) - icent[cell.to_numpy()]
        out = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            qs = ir[:, s * sub : (s + 1) * sub]
            d = ((qs[:, None, :] - rcb[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series([row.tolist() for row in out])

    return encode


def build_ann_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    n_centroids: int | None = S.N_CENTROIDS,
    n_tables: int = S.N_TABLES,
    n_planes: int = S.N_PLANES,
    refine_iters: int = 0,
    residual: bool | str = "auto",
    train_fraction: float | None = None,
) -> None:
    """Encode the corpus once and land every staging table on disk.

    One IVF assignment pass + one PQ encode pass + one LSH banding pass
    over ``emb`` (all map-only vectorized kernels over the
    metadata-sized quantizers — zero shuffle; the only exchanges are the
    partitionBy writes); everything else written here is metadata-sized.
    Re-runs overwrite atomically per Spark's committer (O13 semantics).

    ``n_centroids=None`` sizes the coarse quantizer with the
    FLOP-balanced sqrt-of-corpus rule (auto_n_centroids) at the cost of
    one count job; the explicit default S.N_CENTROIDS keeps fixture
    corpora and registered-query artifacts deterministic.

    ``refine_iters > 0`` trains the coarse quantizer with Lloyd's
    k-means (similarity.kmeans_centroids — the production refinement the
    ivf_cells docstring describes) before assignment; the artifact
    layout and every reader are unchanged, because readers derive
    probes from the STORED centroid table, whatever produced it.

    ``residual=True`` PQ-encodes each vector's RESIDUAL against its own
    IVF centroid instead of the raw vector (module comment above) —
    codebook = the first PQ_K vectors' residuals, the same
    deterministic-sample convention; the codebook table keeps its
    schema so `_load_codebook` is unchanged, and the manifest carries
    the flag so readers and appends dispatch the matching encode/LUT.
    The DEFAULT ``residual="auto"`` measures the intra-cell / global
    variance ratio on the assignment this build materializes anyway and
    picks the regime's winning encoding with no knob
    (:func:`_resolve_residual_auto` — clustered corpora get residual,
    uniform ones raw; the choice and ratio are stamped in the manifest).
    """
    _CENTROIDS.pop(index_dir, None)  # rebuilt index invalidates the
    _CODEBOOKS.pop(index_dir, None)  # in-process quantizer cache
    _SQ_STATS.pop(index_dir, None)
    _stamp_layout(index_dir)
    # a rebuild orphans any derived SQ8 arm (its grid was trained on the
    # old corpus); drop the flag so readers fail loudly until it's re-added
    M.write_meta(index_dir, _SQ8_KEY, False)
    M.write_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
    # ... and any derived binary arm (thresholds trained on the old
    # corpus) — same fail-loudly contract
    _BIN_THRESH.pop(index_dir, None)
    M.write_meta(index_dir, _BINARY_KEY, False)
    if n_centroids is None:  # auto: sqrt-of-corpus rule (one count job)
        n_centroids = auto_n_centroids(emb.count())
    if refine_iters > 0:
        # mini-batch k-means past fixture scale: train the quantizer on
        # a deterministic hash sample (plus the init prefix) — the
        # full-corpus assignment round is corpus x k rows through a
        # per-vector window, the same wall the 2-level refinement's
        # train_fraction documents
        train = emb
        if train_fraction is not None:
            train = emb.filter(
                (
                    F.pmod(F.abs(F.hash("vec_id")), F.lit(10_000))
                    < F.lit(int(train_fraction * 10_000))
                )
                | (F.col("vec_id") < n_centroids)
            )
        from pyspark.sql import Window

        # kmeans drops cells that lose every member (clustered corpora
        # with a biased init), leaving non-contiguous init-id labels —
        # relabel 0..n-1 (stable by original id). Readers never care:
        # they derive probes from the STORED table, and cell ids are
        # opaque to every downstream consumer.
        cents = (
            S.kmeans_centroids(train, n_centroids, refine_iters + 1)
            .withColumn(
                "cell",
                (
                    F.row_number().over(Window.orderBy("cell")) - 1
                ).cast("int"),
            )
            .select(
                "cell", F.col("c_emb").cast("array<float>").alias("c_emb")
            )
        )
    else:
        cents = emb.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").cast("int").alias("cell"),
            F.col("embedding").alias("c_emb"),
        )
    cents.coalesce(1).write.mode("overwrite").parquet(M.table_path(index_dir, "centroids"))

    # map-only assignment against the JUST-WRITTEN centroid table (the
    # same kernel and semantics as similarity.ivf_cells; for
    # refine_iters=0 the matrix is identical, so so are the cells)
    cell_ids, cent_matrix = _read_centroids(spark, index_dir)
    assert cell_ids == list(range(len(cell_ids))), "non-contiguous cells"
    nearest = S.nearest_cell_udf(cent_matrix)
    cells = emb.select(
        "vec_id",
        "embedding",
        nearest(F.col("embedding")).cast("int").alias("cell"),
    )
    # one assignment pass feeds both partitioned layouts
    cells = cells.persist()
    try:
        residual = _resolve_residual_auto(
            index_dir,
            residual,
            cells,
            np.arange(len(cent_matrix), dtype="int64"),
            cent_matrix,
        )
        if residual:
            # residual codebook: the first PQ_K vectors' residuals
            # against THEIR OWN centroids (metadata-sized collect —
            # PQ_K rows), written in the standard codebook schema
            icent = _int_centroids(cent_matrix)
            head = cells.filter(F.col("vec_id") < S.PQ_K).collect()
            head.sort(key=lambda r: r.vec_id)
            rows = []
            for k, r in enumerate(head):
                ir = (
                    S._half_up(
                        np.asarray(r.embedding, dtype=np.float64)
                        * S.PQ_INT_SCALE
                    )
                    - icent[int(r.cell)]
                )
                rows.extend(
                    (s, d, k, int(ir[s * S.PQ_SUB + d]))
                    for s in range(S.PQ_M)
                    for d in range(S.PQ_SUB)
                )
            spark.createDataFrame(
                rows, "subspace int, dim int, cell int, ic long"
            ).coalesce(1).write.mode("overwrite").parquet(
                M.table_path(index_dir, "codebook")
            )
            encode = _pq_encode_residual_udf(
                _load_codebook(spark, index_dir), icent
            )(F.col("embedding"), F.col("cell"))
        else:
            codebook = (
                S.pq_long_form(emb)
                .filter(F.col("vec_id") < S.PQ_K)
                .select(
                    "subspace",
                    "dim",
                    F.col("vec_id").cast("int").alias("cell"),
                    F.col("iv").alias("ic"),
                )
            )
            codebook.coalesce(1).write.mode("overwrite").parquet(
                M.table_path(index_dir, "codebook")
            )
            encode = S.pq_encode_udf(_load_codebook(spark, index_dir))(
                F.col("embedding")
            )
        # vectorized encoder (map-only) FUSED onto the assigned rows —
        # bit-identical codes to the long-form reference S.pq_codes
        # (pinned by test); at 100 TB the encode pass must not fan out
        # corpus x dims x k rows through aggregates, and a codes-by-id
        # join back to the assignment would shuffle corpus-sized tables
        # (measured ~200 MB spill per 8M-row build before the fuse)
        (
            cells.select("vec_id", "cell", encode.alias("codes"))
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(M.table_path(index_dir, "vectors"))
        )
        (
            cells.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(M.table_path(index_dir, "raw"))
        )
    finally:
        cells.unpersist()

    (
        S.lsh_buckets_long(emb, n_tables=n_tables, n_planes=n_planes)
        .select("vec_id", "bucket", "table_id")
        .repartition("table_id")
        .write.mode("overwrite")
        .partitionBy("table_id")
        .parquet(M.table_path(index_dir, "lsh_buckets"))
    )


def append_to_ann_index(
    spark: SparkSession,
    emb_new: DataFrame,
    index_dir: str,
    n_tables: int = S.N_TABLES,
    n_planes: int = S.N_PLANES,
) -> None:
    """Incremental index maintenance — the corpus grows, the index never
    rebuilds. New vectors are encoded against the STORED quantizers
    (centroids + PQ codebook are immutable once built: the IVF-PQ
    invariant that makes append O(new), and what keeps old and new codes
    comparable under one ADC LUT), then their rows APPEND into the
    cell-partitioned tables — existing partitions' files are never
    rewritten. Equivalence with a from-scratch build over the union
    corpus is pinned by tests/test_ann_index.py (same quantizers ⇒
    identical assignments, codes, bands, and search results)."""
    _check_layout(index_dir)
    # map-only assignment against the STORED quantizer (same vectorized
    # kernel and tie-break as similarity.ivf_cells — no join, no shuffle)
    cell_ids, cent_matrix = _read_centroids(spark, index_dir)
    assert cell_ids == list(range(len(cell_ids))), "non-contiguous cells"
    nearest = S.nearest_cell_udf(cent_matrix)
    cells = (
        emb_new.select(
            "vec_id",
            "embedding",
            nearest(F.col("embedding")).cast("int").alias("cell"),
        )
        .persist()
    )
    try:
        # PQ-encode against the STORED codebook with the vectorized
        # kernel, fused onto the assigned rows (map-only; same integer
        # argmin + tie-break as the long-form reference path). Residual
        # indexes dispatch the residual encoder — same immutable
        # codebook, same comparability invariant, subtracting the
        # stored centroid first.
        if M.read_meta(index_dir, _RESIDUAL_KEY, False):
            enc = _pq_encode_residual_udf(
                _load_codebook(spark, index_dir),
                _int_centroids(cent_matrix),
            )(F.col("embedding"), F.col("cell"))
        else:
            enc = S.pq_encode_udf(_load_codebook(spark, index_dir))(
                F.col("embedding")
            )
        (
            cells.select("vec_id", "cell", enc.alias("codes"))
            .repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(M.table_path(index_dir, "vectors"))
        )
        (
            cells.repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(M.table_path(index_dir, "raw"))
        )
        if M.read_meta(index_dir, _SQ8_KEY, False):
            # SQ8 arm present: encode against the STORED grid (immutable
            # quantizer, same invariant as the PQ codebook — unclipped
            # codes keep out-of-range components exact) and append
            vmin, scale = _read_sq_stats(spark, index_dir)
            sq8_new = cells.select(
                "vec_id",
                "cell",
                _sq8_encode_udf(vmin, scale)(F.col("embedding")).alias(
                    "codes"
                ),
            )
            (
                sq8_new.repartition("cell")
                .write.mode("append")
                .partitionBy("cell")
                .parquet(M.table_path(index_dir, "sq8"))
            )
            # incremental drift accounting: one O(new) aggregate (the
            # encode kernel re-runs over the persisted batch — cheaper
            # than the O(corpus) stats rescan it replaces)
            _accumulate_sq8_counters(index_dir, sq8_new)
            pdims = M.read_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
            if pdims is not None:
                # prefix arm present: land the sliced rows alongside
                (
                    sq8_new.select(
                        "vec_id",
                        "cell",
                        F.slice("codes", 1, int(pdims)).alias("codes"),
                    )
                    .repartition("cell")
                    .write.mode("append")
                    .partitionBy("cell")
                    .parquet(M.table_path(index_dir, "sq8_prefix"))
                )
        if M.read_meta(index_dir, _BINARY_KEY, False):
            # binary arm present: encode against the STORED thresholds
            # (immutable, so old and new words stay comparable) + append
            bin_new = cells.select(
                "vec_id",
                "cell",
                _binary_encode_udf(_read_bin_thresh(spark, index_dir))(
                    F.col("embedding")
                ).alias("words"),
            )
            (
                bin_new.repartition("cell")
                .write.mode("append")
                .partitionBy("cell")
                .parquet(M.table_path(index_dir, "binary"))
            )
            _accumulate_binary_counters(index_dir, bin_new)
    finally:
        cells.unpersist()
    (
        S.lsh_buckets_long(emb_new, n_tables=n_tables, n_planes=n_planes)
        .select("vec_id", "bucket", "table_id")
        .repartition("table_id")
        .write.mode("append")
        .partitionBy("table_id")
        .parquet(M.table_path(index_dir, "lsh_buckets"))
    )


def delete_from_ann_index(spark: SparkSession, vec_ids, index_dir: str) -> None:
    """Logical delete — the third lifecycle verb (build / append / delete).

    Deleted ids land in a ``tombstones/`` side table (append-only
    parquet; a DataFrame writes distributed, a Python iterable becomes a
    driver-sized single file). Nothing in the partitioned tables is
    rewritten: every reader anti-joins its scan against the tombstones
    (broadcast — the set is metadata-sized BETWEEN compactions, which is
    the operational contract: bulk deletes should be followed by
    :func:`compact_ann_index`, which applies tombstones physically
    during its partition rewrite and then clears them). The quantizers
    are untouched — centroids/codebook derive from the build-time
    corpus and stay valid for the survivors, exactly as with append."""
    M.write_tombstones(spark, vec_ids, index_dir, "vec_id")


def _live(spark: SparkSession, index_dir: str, df: DataFrame) -> DataFrame:
    """Filter a scan of an artifact table down to non-deleted rows —
    broadcast anti-join against the (metadata-sized) tombstones; a
    no-op plan when no tombstones exist."""
    return M.live(spark, index_dir, df, "vec_id")


# --------------------------------------------------------------------------
# Driver-side query terms (tiny, exact twins of the distributed formulas).


def _rounded_cosines(q: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """round(cos, 6) against each row of ``mat`` — the cosine_batch
    convention, so probe selection ties break identically."""
    dots = mat @ q
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat)) * np.sqrt(q @ q)
    return np.round(dots / norms, 6)


# The quantizer tables (centroids, PQ codebook) are metadata-sized and
# immutable once built — every real ANN service pins them in memory.
# Cached per index_dir so repeated searches in one process pay the two
# tiny collect jobs once.
_CENTROIDS: dict[str, tuple] = {}
_CODEBOOKS: dict[str, np.ndarray] = {}


def _read_centroids(spark: SparkSession, index_dir: str):
    cached = _CENTROIDS.get(index_dir)
    if cached is not None:
        return cached
    _check_layout(index_dir)  # every single-level reader passes here
    rows = spark.read.parquet(M.table_path(index_dir, "centroids")).collect()
    rows.sort(key=lambda r: r.cell)
    cells = [int(r.cell) for r in rows]
    mat = np.array([r.c_emb for r in rows], dtype=np.float64)
    _CENTROIDS[index_dir] = (cells, mat)
    return cells, mat


def _load_codebook(spark: SparkSession, index_dir: str) -> np.ndarray:
    """Stored integer codebook as ``ic[subspace][cell][dim]`` (cached
    per index_dir — metadata-sized, immutable once built)."""
    ic = _CODEBOOKS.get(index_dir)
    if ic is None:
        cb = spark.read.parquet(M.table_path(index_dir, "codebook")).collect()
        n_sub = max(r.subspace for r in cb) + 1
        n_cells = max(r.cell for r in cb) + 1
        sub_dim = max(r.dim for r in cb) + 1
        ic = np.zeros((n_sub, n_cells, sub_dim), dtype=np.int64)
        for r in cb:
            ic[r.subspace, r.cell, r.dim] = r.ic
        _CODEBOOKS[index_dir] = ic
    return ic


def _probe_cells(
    queries: list[Query], cells: list[int], mat: np.ndarray, n_probe: int
) -> list[tuple[int, int]]:
    """(q_id, cell) pairs: the n_probe nearest centroids per query,
    ordered by (sim desc, cell asc) like ivf_topk's probe window."""
    out = []
    for q_id, vec in queries:
        sims = _rounded_cosines(np.asarray(vec, dtype=np.float64), mat)
        ranked = sorted(zip(cells, sims), key=lambda cs: (-cs[1], cs[0]))
        out.extend((q_id, c) for c, _ in ranked[:n_probe])
    return out


def _adc_lut_flat(
    spark: SparkSession, index_dir: str, queries: list[Query]
) -> DataFrame:
    """(q_id, d_flat) rows: the query's exact integer squared distance
    to every PQ centroid — pq_distances in the local domain — flattened
    to one PQ_M*PQ_K long array per query (``d_flat[s*PQ_K + code]``),
    so ADC scoring is a broadcast join on q_id plus a MAP-SIDE array
    aggregate: no per-subspace join, no re-aggregation shuffle."""
    ic = _load_codebook(spark, index_dir)
    n_sub, n_cells, sub_dim = ic.shape
    rows = []
    for q_id, vec in queries:
        # HALF_UP, not np.round: every other PQ quantization path
        # (pq_long_form's F.round, pq_encode_udf's _half_up) rounds
        # half away from zero; banker's rounding here would flip any
        # query component landing exactly on .5 and silently break the
        # bit-identical parity with the in-session ivfpq_topk twin.
        iq = S._half_up(np.asarray(vec, dtype=np.float64) * S.PQ_INT_SCALE)
        flat: list[int] = []
        for s in range(n_sub):
            qs = iq[s * sub_dim : (s + 1) * sub_dim]
            d = ((ic[s] - qs) ** 2).sum(axis=1)
            flat.extend(int(d[c]) for c in range(n_cells))
        rows.append((int(q_id), flat))
    return spark.createDataFrame(rows, "q_id long, d_flat array<long>")


def _adc_lut_flat_residual(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    probes: list[tuple[int, int]],
) -> DataFrame:
    """(q_id, cell, d_flat) rows — the residual-PQ LUT: the query's
    residual DEPENDS ON THE PROBED CELL (r = q - c), so each (query,
    probed cell) pair gets its own flattened distance array against the
    residual codebook. Rows = |queries| x n_probe — still broadcast
    metadata; the scoring join gains the cell key and nothing else
    changes (same map-side higher-order aggregate)."""
    ic = _load_codebook(spark, index_dir)
    n_sub, n_cells, sub_dim = ic.shape
    _, cent_mat = _read_centroids(spark, index_dir)
    icent = _int_centroids(cent_mat)
    qvec = {q_id: vec for q_id, vec in queries}
    rows = []
    for q_id, cell in probes:
        iq = (
            S._half_up(
                np.asarray(qvec[q_id], dtype=np.float64) * S.PQ_INT_SCALE
            )
            - icent[cell]
        )
        flat: list[int] = []
        for s in range(n_sub):
            qs = iq[s * sub_dim : (s + 1) * sub_dim]
            d = ((ic[s] - qs) ** 2).sum(axis=1)
            flat.extend(int(d[c]) for c in range(n_cells))
        rows.append((int(q_id), int(cell), flat))
    return spark.createDataFrame(
        rows, "q_id long, cell int, d_flat array<long>"
    )


def _adc_dist_col(n_cells: int = S.PQ_K):
    """Sum of the per-subspace LUT entries selected by the packed codes
    array — exact int64 arithmetic, whole-stage-codegen higher-order
    function (Spark array subscripts are 0-based). ``n_cells`` is the
    LUT's packing stride and MUST be the stored codebook's actual
    per-subspace cell count (``ic.shape[1]`` — what _adc_lut_flat packs
    with): a corpus without a full vec_id 0..PQ_K-1 prefix stores fewer
    than PQ_K cells, and indexing with the nominal PQ_K would silently
    misalign every subspace past the first."""
    return F.expr(
        f"aggregate(sequence(0, {S.PQ_M - 1}), 0L,"
        f" (acc, s) -> acc + d_flat[s * {n_cells} + codes[s]])"
    )


def _cell_predicate(pairs: list[tuple[int, int]]):
    cells = sorted({c for _, c in pairs})
    return F.col("cell").isin(cells)


_PROBE_SCHEMA = "q_id long, cell int"


def _queries_df(spark: SparkSession, queries: list[Query]) -> DataFrame:
    return spark.createDataFrame(
        [(int(q), [float(x) for x in vec]) for q, vec in queries],
        T.StructType(
            [
                T.StructField("q_id", T.LongType()),
                T.StructField("q_emb", T.ArrayType(T.FloatType())),
            ]
        ),
    )


def ann_index_ivfpq_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """IVF-PQ search from the artifact: partition-pruned scan of the
    probed cells' PQ codes, broadcast ADC LUT, integer ranking — the
    same output contract as similarity.ivfpq_topk (q_id, vec_id,
    adc_dist, rank), with zero corpus access. Residual indexes (the
    manifest flag) swap in the per-(query, probed cell) residual LUT —
    the scoring join gains the cell key, nothing else changes."""
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    probes_df = spark.createDataFrame(probes, _PROBE_SCHEMA)
    residual = M.read_meta(index_dir, _RESIDUAL_KEY, False)
    lut_df = (
        _adc_lut_flat_residual(spark, index_dir, queries, probes)
        if residual
        else _adc_lut_flat(spark, index_dir, queries)
    )

    vectors = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "vectors")).where(
            _cell_predicate(probes)
        ),
    )
    scored = (
        vectors.join(F.broadcast(probes_df), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(
            F.broadcast(lut_df),
            ["q_id", "cell"] if residual else ["q_id"],
        )
        .select("q_id", "vec_id", _adc_dist_col(
            _load_codebook(spark, index_dir).shape[1]
        ).alias("adc_dist"))
    )
    return S.topk_per_key(
        scored, "q_id", [F.col("adc_dist"), F.col("vec_id")], k
    )


def ann_index_ivf_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """IVF-Flat search from the artifact: exact cosine inside the probed
    cells' raw partitions only (same output contract as
    similarity.ivf_topk: q_id, vec_id, sim, rank)."""
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    probes_df = spark.createDataFrame(probes, _PROBE_SCHEMA)

    raw = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "raw")).where(_cell_predicate(probes)),
    )
    scored = (
        raw.join(F.broadcast(probes_df), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            S.cosine_batch(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_per_key(
        scored, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def _nonzero_prefix_queries(
    queries: list[Query], dims: int
) -> list[Query]:
    """Drop queries whose leading ``dims`` components are all zero —
    the driver-side half of the truncated readers' NaN guard (a
    zero-prefix query's truncated cosine is 0/0 against every
    candidate, so its whole shortlist would be NaN)."""
    return [(q, v) for q, v in queries if any(x != 0.0 for x in v[:dims])]


def _nonzero_prefix_col(dims: int):
    """Candidate-side zero-prefix guard on the ``embedding`` column —
    same predicate the SQL twins express with ``list_filter`` over
    ``list_slice``."""
    return F.exists(
        F.slice("embedding", 1, dims), lambda x: x != F.lit(0.0)
    )


def ann_index_truncated_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    dims: int = S.MRL_DIMS,
    shortlist: int = S.MRL_SHORTLIST,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """Adaptive retrieval over the artifact — BOTH pruning axes composed
    at the reader with no new index state: the IVF probe prunes WHICH
    raw partitions are read (rows touched ∝ probed cells), and the
    matryoshka truncation prunes HOW MUCH of each row is scored (the
    shortlist cosine runs on the leading ``dims`` of DIM components,
    dims/DIM of the FLOPs and Arrow bytes). The exact rerank then
    re-scores only ≤ queries × shortlist survivors at full dimension —
    a broadcast point-lookup semi-join against the same probed
    partitions, not a second corpus pass. Output contract matches
    ann_index_ivf_topk (q_id, vec_id, sim, rank) with ``sim`` the exact
    full-dimension cosine, so shortlist ≥ probed volume reproduces
    IVF-Flat bit-for-bit (pinned in tests).

    Zero-prefix rows (all-zero leading ``dims``) are dropped from the
    shortlist stage on both sides — queries driver-side, candidates
    with the same ``exists`` guard as similarity.truncated_topk — so a
    0/0 = NaN truncated cosine (which Spark sorts above every real
    similarity) can never pollute the shortlist."""
    queries = _nonzero_prefix_queries(queries, dims)
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    probes_df = spark.createDataFrame(probes, _PROBE_SCHEMA)
    qdf = _queries_df(spark, queries)
    q_sliced = qdf.select(
        "q_id", F.slice("q_emb", 1, dims).alias("q_emb")
    )
    raw = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "raw")).where(
            _cell_predicate(probes)
        ),
    )
    tscored = (
        raw.join(F.broadcast(probes_df), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .filter(_nonzero_prefix_col(dims))
        .join(F.broadcast(q_sliced), "q_id")
        .select(
            "q_id",
            "vec_id",
            S.cosine_batch(
                F.col("q_emb"), F.slice("embedding", 1, dims)
            ).alias("tsim"),
        )
    )
    short = S.topk_per_key(
        tscored, "q_id", [F.col("tsim").desc(), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")
    rescored = (
        raw.select("vec_id", "embedding")
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qdf), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        rescored, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def _query_buckets(
    queries: list[Query], n_tables: int, n_planes: int
) -> list[tuple[int, int, str]]:
    """(q_id, table_id, bucket) — the query's band signatures, computed
    locally with the exact lsh_buckets_long convention (one matmul,
    round 6, sign)."""
    signs_t = S._signs_matrix(n_tables, n_planes, S.DIM).T
    out = []
    for q_id, vec in queries:
        bits = (
            np.round(np.asarray(vec, dtype=np.float64) @ signs_t, 6) > 0
        )
        for t in range(n_tables):
            bucket = "".join(
                "1" if bits[t * n_planes + j] else "0" for j in range(n_planes)
            )
            out.append((q_id, t, bucket))
    return out


def ann_index_lsh_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    n_tables: int = S.N_TABLES,
    n_planes: int = S.N_PLANES,
) -> DataFrame:
    """LSH search from the artifact: candidates collide with the query's
    band signature in ANY stored table (partition-pruned to the query's
    (table_id, bucket) pairs), exact cosine rerank against the raw
    partitions joined by id (same output contract as similarity.lsh_topk:
    q_id, vec_id, sim, rank)."""
    from functools import reduce

    qb = _query_buckets(queries, n_tables, n_planes)
    qb_df = spark.createDataFrame(qb, "q_id long, table_id int, bucket string")
    pairs = sorted({(t, b) for _, t, b in qb})
    pred = reduce(
        lambda acc, tb: acc
        | ((F.col("table_id") == tb[0]) & (F.col("bucket") == tb[1])),
        pairs,
        F.lit(False),
    )
    buckets = _live(
        spark, index_dir, spark.read.parquet(M.table_path(index_dir, "lsh_buckets")).where(pred)
    )
    cands = (
        buckets.join(F.broadcast(qb_df), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .dropDuplicates(["q_id", "vec_id"])
    )
    raw = spark.read.parquet(M.table_path(index_dir, "raw")).select("vec_id", "embedding")
    scored = (
        cands.join(raw, "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            S.cosine_batch(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_per_key(
        scored, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


# --------------------------------------------------------------------------
# Scalar-quantized (SQ8) arm — the middle rung of the compression ladder.
#
# PQ at PQ_M=4 subspaces is a 2-byte/vector shortlist signal: extreme
# compression, coarse ranking. The raw/ arm is exact but 256 B/vector at
# DIM=64 float32. Production ANN services (FAISS's ScalarQuantizer tier)
# keep a per-DIMENSION uniform int8 quantization between the two:
# ~1 byte/dim (64 B/vector here — 4x smaller probed IO than raw), with
# far finer resolution than PQ because every dimension keeps its own
# 8-bit grid instead of sharing a 4-bit codebook across a 16-dim
# subspace. The SQ8 arm is DERIVED state: built from the stored raw/
# partitions by ``add_sq8_to_ann_index`` (so existing indexes upgrade in
# place), maintained by append/compact like the other partitioned
# tables, and searched two-stage (integer code-space shortlist + exact
# cosine rerank) by ``ann_index_sq8_topk``.
#
# Quantizer: per-dim (vmin, vmax) over the live corpus, stored in
# ``sq_stats/`` (64 rows — metadata) and IMMUTABLE once built, the same
# invariant as the PQ codebook: appended vectors encode against the
# stored grid, and because codes are NOT clipped to [0, 255] an
# out-of-range component still round-trips exactly (its code just falls
# outside the byte range — the int32 parquet column bit-packs it all the
# same), so append+search stays exact without retraining.
#
# Scoring: both query and corpus encode on the same grid, and the
# shortlist ranks by the exact-integer code-space L2
# ``sum((q_code_d - code_d)^2)`` — per-dim span-normalized squared
# distance. Like the ADC LUT distances this is a deterministic integer,
# so the DuckDB twin (_ANN_SQ8_RERANK_SQL in plans/llm_ops.py)
# reproduces it bit for bit; the exact rounded-cosine rerank then fixes
# the final ordering. The encode formula (round((x - vmin) / span *
# 255), HALF_UP) is the one embedding_quantize's oracle already proves
# cross-engine-identical.

_SQ8_KEY = "__sq8__"
# Incremental drift accounting (manifest counters): the OOB-component /
# total-component / physical-row counts of the sq8 codes table, stamped
# at retrain, accumulated at append, recomputed exactly at compaction —
# so the drift audit reads three manifest keys instead of rescanning a
# corpus-sized codes table per monitoring call. A store whose counters
# predate this accounting (missing keys) falls back to the exact scan
# until its next retrain or compaction stamps them.
_SQ8_OOB_KEY = "__sq8_oob_components__"
_SQ8_COMP_KEY = "__sq8_components__"
_SQ8_ROWS_KEY = "__sq8_rows__"
# Materialized prefix-codes arm (``sq8_prefix/``): the leading-`dims`
# int8 codes as their own cell-partitioned table, so a truncated
# code-space search cuts SCAN bytes, not just scored bytes. The key
# stores the materialized width; readers with dims <= width scan the
# prefix table instead of the full codes column.
_SQ8_PREFIX_DIMS_KEY = "__sq8_prefix_dims__"
# Row count of the corpus the int8 grid was trained on — stamped by
# add_sq8_to_ann_index so the stats audit can report how far the corpus
# has grown past the grid (the drift-age signal).
_SQ8_TRAINED_ROWS_KEY = "__sq8_trained_rows__"
_SQ_STATS: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _read_sq_stats(spark: SparkSession, index_dir: str):
    """(vmin, scale) per dim from the stored ``sq_stats/`` table —
    metadata-sized, immutable once built, cached per index_dir like the
    centroid/codebook quantizers."""
    cached = _SQ_STATS.get(index_dir)
    if cached is not None:
        return cached
    rows = spark.read.parquet(M.table_path(index_dir, "sq_stats")).collect()
    rows.sort(key=lambda r: r.dim)
    vmin = np.array([r.vmin for r in rows], dtype=np.float64)
    vmax = np.array([r.vmax for r in rows], dtype=np.float64)
    scale = (vmax - vmin) / 255.0
    _SQ_STATS[index_dir] = (vmin, scale)
    return vmin, scale


def _sq8_encode_udf(vmin: np.ndarray, scale: np.ndarray):
    """Vectorized SQ8 encoder over the ``embedding`` column — the same
    Arrow-batched numpy-kernel convention as pq_encode_udf (a per-
    element SQL ``transform`` lambda measured ~5x slower at 1M rows).
    HALF_UP rounding (S._half_up ≡ Spark/DuckDB ``round``); a
    degenerate dimension (vmax == vmin ⇒ scale 0) encodes to 0 by
    convention."""
    safe = np.where(scale == 0.0, 1.0, scale)
    dead = scale == 0.0

    @F.pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        x = np.array(emb.tolist(), dtype=np.float64)
        codes = np.where(
            dead[None, :], 0, S._half_up((x - vmin[None, :]) / safe[None, :])
        ).astype(np.int32)
        return pd.Series(list(codes))

    return encode


def _sq8_encode_np(vec, vmin: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Driver-side twin of :func:`_sq8_encode_udf` for query vectors —
    same grid, same HALF_UP rounding (S._half_up ≡ Spark round)."""
    x = np.asarray(vec, dtype=np.float64)
    safe = np.where(scale == 0.0, 1.0, scale)
    return np.where(
        scale == 0.0, 0, S._half_up((x - vmin) / safe)
    ).astype(np.int64)


def _sq8_dists_udf(q_mat: np.ndarray):
    """Per-row exact-integer code-space squared L2 to ALL query codes
    at once — one int64 matmul per Arrow batch against the closure-held
    (n_queries x dim) query matrix, returning an array the probe join
    indexes into. Each probed row's codes cross Arrow ONCE (the
    score-after-join alternative shipped both arrays per (query, row)
    pair and was measured 2x slower; the 64-element zip_with/aggregate
    HOF before that, 5x). ||b||^2 + ||q||^2 - 2 b.q in int64 is exact —
    no float in the shortlist ranking."""
    qq = np.einsum("ij,ij->i", q_mat, q_mat)[None, :]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def dists(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        # single-pass concat + reshape (np.vstack's per-row atleast_2d
        # loop measured ~2x the whole kernel at 1M rows/batch)
        b = (
            np.concatenate(codes.to_numpy())
            .astype(np.int64)
            .reshape(len(codes), -1)
        )
        d = (
            np.einsum("ij,ij->i", b, b)[:, None]
            + qq
            - 2 * (b @ q_mat.T)
        )
        return pd.Series(list(d))

    return dists


def _sq8_code_aggregate(codes_df: DataFrame) -> tuple[int, int, int]:
    """(oob_components, total_components, n_rows) over a codes table or
    batch — ONE map-side-combined aggregate; the per-element HOF is
    fine because this runs at maintenance/append time, not on the
    probe path."""
    oob = F.size(
        F.filter("codes", lambda c: (c < F.lit(0)) | (c > F.lit(255)))
    )
    row = codes_df.agg(
        F.sum(oob).alias("oob"),
        F.sum(F.size("codes")).alias("comp"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row.oob or 0), int(row.comp or 0), int(row.n)


def _stamp_sq8_counters(index_dir: str, oob: int, comp: int, n: int) -> None:
    M.write_meta(index_dir, _SQ8_OOB_KEY, int(oob))
    M.write_meta(index_dir, _SQ8_COMP_KEY, int(comp))
    M.write_meta(index_dir, _SQ8_ROWS_KEY, int(n))


def _accumulate_sq8_counters(index_dir: str, codes_df: DataFrame) -> None:
    """Append-time half of the incremental drift accounting: fold the
    new batch's (oob, components, rows) into the manifest counters —
    one O(new) aggregate per append instead of an O(corpus) rescan per
    stats call. No-op when the counters were never stamped (a store
    from before this accounting): the exact-scan fallback covers it."""
    if M.read_meta(index_dir, _SQ8_ROWS_KEY, None) is None:
        return
    oob, comp, n = _sq8_code_aggregate(codes_df)
    _stamp_sq8_counters(
        index_dir,
        M.read_meta(index_dir, _SQ8_OOB_KEY, 0) + oob,
        M.read_meta(index_dir, _SQ8_COMP_KEY, 0) + comp,
        M.read_meta(index_dir, _SQ8_ROWS_KEY, 0) + n,
    )


def add_sq8_to_ann_index(spark: SparkSession, index_dir: str) -> None:
    """Derive the SQ8 arm from the stored ``raw/`` partitions: one
    64-row min/max aggregate (map-side combined) trains the grid, one
    map-only encode pass lands ``sq8/`` (vec_id, codes array<int>)
    under the layout's own pruning key — ``cell`` on the single-level
    index, ``(group, cell)`` on the two-level one — so probed reads
    stay partition-pruned on either layout. Idempotent (overwrite);
    re-run after a rebuild to retrain the grid.

    RETRAIN RULE: the grid is immutable once built (appends encode
    against it, unclipped, so search stays exact), but a drifting
    append distribution walks codes outside 0..255 — storage grows past
    the 64 B/vector design point and code-space distances lose
    resolution on the drifted components. :func:`ann_index_stats`
    reports ``sq8_oob_code_frac`` (fraction of code components outside
    the byte range) and ``sq8_rows_past_grid`` (rows appended since the
    grid trained): when oob_frac rises past ~1% or the corpus has more
    than doubled past the grid, re-run this verb — it re-derives the
    grid AND re-encodes every stored vector from ``raw/``, so the arm
    comes back clean in one idempotent pass."""
    _check_layout(index_dir)
    _SQ_STATS.pop(index_dir, None)
    pcols = ["group", "cell"] if _is_2level(index_dir) else ["cell"]
    raw = _live(
        spark, index_dir, spark.read.parquet(M.table_path(index_dir, "raw"))
    )
    (
        raw.select(F.posexplode("embedding").alias("dim", "xf"))
        .select("dim", F.col("xf").cast("double").alias("x"))
        .groupBy("dim")
        .agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(M.table_path(index_dir, "sq_stats"))
    )
    vmin, scale = _read_sq_stats(spark, index_dir)
    (
        raw.select(
            "vec_id",
            *pcols,
            _sq8_encode_udf(vmin, scale)(F.col("embedding")).alias("codes"),
        )
        .repartition(*pcols)
        .write.mode("overwrite")
        .partitionBy(*pcols)
        .parquet(M.table_path(index_dir, "sq8"))
    )
    # drift-age anchor + counter baseline: one aggregate over the
    # just-written codes table stamps the trained row count AND the
    # incremental drift counters (oob is 0 by construction right after
    # a retrain — the grid is the corpus's own min/max — but it is
    # measured, not assumed)
    oob, comp, n_trained = _sq8_code_aggregate(
        spark.read.parquet(M.table_path(index_dir, "sq8"))
    )
    M.write_meta(index_dir, _SQ8_TRAINED_ROWS_KEY, int(n_trained))
    _stamp_sq8_counters(index_dir, oob, comp, n_trained)
    M.write_meta(index_dir, _SQ8_KEY, True)
    # a retrain moves the grid, so a materialized prefix arm re-derives
    # from the fresh codes (same dims; no-op when no arm is present)
    pdims = M.read_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
    if pdims is not None:
        add_sq8_prefix_to_ann_index(spark, index_dir, int(pdims))


def add_sq8_prefix_to_ann_index(
    spark: SparkSession, index_dir: str, dims: int = S.MRL_DIMS
) -> None:
    """Materialize the PREFIX-CODES arm: ``sq8_prefix/`` holds the
    leading ``dims`` int8 codes per vector, partitioned exactly like
    ``sq8/`` — the deployment move the truncated readers' docstrings
    promise ("a deployment standardizing on a prefix width lands a
    prefix-codes table for the scan-side cut").

    Why a separate table: ``ann_index_sq8_topk(dims=...)`` slices the
    stored codes in the PROJECTION, which cuts Arrow bytes and distance
    FLOPs but not file IO — parquet still reads the whole codes column
    (measured at the 8M rehearsal: truncated-16 51.1 s vs flat 44.8 s,
    no IO win). With this arm present the probed scan reads ~``dims``
    bytes per vector from disk — the number that actually rules at
    100 TB — and results are BIT-IDENTICAL because the per-dim grid is
    independent (the prefix of the trained codes IS the codes of the
    prefix; pinned by test).

    Derived state over ``sq8/`` (one map-only slice pass, idempotent
    overwrite, layout-dispatched partitioning), so the lifecycle rides
    the existing verbs: appends land sliced rows alongside the full
    codes, compaction includes the table in the layout map, tombstones
    filter it through the same ``_live`` anti-join, and a grid retrain
    re-derives it automatically (:func:`add_sq8_to_ann_index`)."""
    _check_layout(index_dir)
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        raise ValueError(
            f"no SQ8 arm at {index_dir}: run add_sq8_to_ann_index first"
        )
    pcols = ["group", "cell"] if _is_2level(index_dir) else ["cell"]
    sq8 = spark.read.parquet(M.table_path(index_dir, "sq8"))
    (
        sq8.select(
            "vec_id", *pcols, F.slice("codes", 1, dims).alias("codes")
        )
        .repartition(*pcols)
        .write.mode("overwrite")
        .partitionBy(*pcols)
        .parquet(M.table_path(index_dir, "sq8_prefix"))
    )
    M.write_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, int(dims))


def _sq8_scan_table(index_dir: str, dims: int | None) -> tuple[str, bool]:
    """(table, slice_needed) for a code-space scan at width ``dims`` —
    the prefix arm serves any request at or under its materialized
    width; wider (or full-width) requests scan the full codes table."""
    if dims is None:
        return "sq8", False
    pdims = M.read_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
    if pdims is not None and dims <= int(pdims):
        return "sq8_prefix", dims < int(pdims)
    return "sq8", True


def ann_index_sq8_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    n_probe: int = S.N_PROBE,
    dims: int | None = None,
) -> DataFrame:
    """Two-stage SQ8 search: partition-pruned scan of the probed cells'
    int8 codes (~64 B/vector — 4x less IO than raw), exact-integer
    code-space L2 against the broadcast query codes, ``shortlist``
    candidates per query (ties to lower vec_id), then exact cosine ONLY
    on those rows. Output contract matches ann_index_ivf_topk:
    (q_id, vec_id, sim, rank).

    ``dims`` composes the PRECISION ladder with the DIMENSION ladder:
    the code-space shortlist runs on only the leading ``dims`` of the
    stored codes (the per-dim grid is independent, so the prefix of the
    trained grid IS the trained grid of the prefix) — ~``dims`` bytes
    per scored vector through the Arrow kernel, 16 B at dims=16 vs
    SQ8's 64 B vs raw's 256 B. When the store carries a materialized
    prefix arm at width ≥ dims (:func:`add_sq8_prefix_to_ann_index`)
    the scan reads ``sq8_prefix/`` and the byte cut applies to file IO
    too; otherwise the slice is JVM-side projection over the full
    codes column. Results are bit-identical either way (per-dim grid
    independence; pinned by test). The rerank stays exact
    full-dimension cosine."""
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        raise ValueError(
            f"no SQ8 arm at {index_dir}: run add_sq8_to_ann_index first"
        )
    shortlist = 4 * k if shortlist is None else shortlist
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    vmin, scale = _read_sq_stats(spark, index_dir)
    q_mat = np.vstack(
        [_sq8_encode_np(vec, vmin, scale) for _, vec in queries]
    )
    if dims is not None:
        q_mat = q_mat[:, :dims]
    # probe rows carry the query's position in the closure matrix so the
    # join can index the per-row distance array
    q_pos = {int(q): i for i, (q, _) in enumerate(queries)}
    probes_df = spark.createDataFrame(
        [(q, q_pos[q], c) for q, c in probes],
        "q_id long, q_idx int, cell int",
    )

    scan_table, needs_slice = _sq8_scan_table(index_dir, dims)
    sq8 = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, scan_table)).where(
            _cell_predicate(probes)
        ),
    )
    code_col = (
        F.slice("codes", 1, dims) if needs_slice else F.col("codes")
    )
    scored = (
        sq8.withColumn("dists", _sq8_dists_udf(q_mat)(code_col))
        .join(F.broadcast(probes_df), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.element_at("dists", F.col("q_idx") + 1).alias("sq_dist"),
        )
    )
    short = S.topk_per_key(
        scored, "q_id", [F.col("sq_dist"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")

    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(
        _cell_predicate(probes)
    )
    reranked = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


# --------------------------------------------------------------------------
# Binary (1-bit sign) arm — the bottom rung of the probed-bytes ladder:
# ~dims/8 bytes per vector (8 B at DIM=64, under PQ's 2 B only the LUT
# codes beat it, but binary's Hamming shortlist needs no codebook LUT
# at probe time) with the SHORTLIST STAGE entirely JVM-side. Hamming
# over packed 64-bit words is xor + bit_count + sum — integer
# bit-arithmetic Catalyst folds into whole-stage codegen — so unlike
# every other rung there is NO Arrow transfer and NO Python kernel on
# the scored path; the only Python in the arm is the build/append-time
# encoder. The rerank stays exact full-dimension cosine, same contract
# as the SQ8/PQ rungs.
#
# Threshold convention: per-dim MIDRANGE (vmin + vmax) / 2 over the
# live corpus, NOT the mean — min and max are exact under any
# summation order, so the DuckDB oracle reproduces every bit exactly
# (a mean threshold differs in the last ulp between the two engines'
# summation orders, and a boundary component would flip a bit and
# break parity). bit[d] = x[d] > thresh[d] (strict, so a degenerate
# dimension encodes 0), packed little-endian: bit (d mod 64) of word
# (d div 64); bit 63 lands in the long's sign bit — the VALUE may be
# negative, readers only xor/popcount the bit pattern, and the
# packed-vs-unpacked Hamming identity is pinned by test.

_BINARY_KEY = "__binary__"
_BINARY_DIMS_KEY = "__binary_dims__"
# Row count the thresholds trained on — the growth half of the retrain
# rule (like _SQ8_TRAINED_ROWS_KEY).
_BINARY_TRAINED_ROWS_KEY = "__binary_trained_rows__"
_BINARY_TRAINED_ONES_KEY = "__binary_trained_ones_frac__"
# Incremental bit-balance accounting (manifest counters, same
# discipline as the SQ8 drift counters): total set bits / physical
# rows of the binary table, stamped at (re)train, accumulated per
# append, recomputed exactly at compaction. Appended vectors encode
# against the immutable thresholds, so a drifting append distribution
# shows up as the corpus bit-balance walking away from the trained
# balance — search stays EXACT (a bit is a bit; nothing goes out of
# range the way SQ8 codes do) but the shortlist's discrimination
# degrades as the balance skews, which is why the audit exists.
_BINARY_ONES_KEY = "__binary_ones__"
_BINARY_ROWS_KEY = "__binary_rows__"
_BIN_THRESH: dict[str, np.ndarray] = {}


def _read_bin_thresh(spark: SparkSession, index_dir: str) -> np.ndarray:
    """Per-dim midrange thresholds from the stored ``bin_stats/`` table
    — metadata-sized, immutable once trained, cached per index_dir like
    the centroid/codebook/SQ-grid quantizers."""
    cached = _BIN_THRESH.get(index_dir)
    if cached is not None:
        return cached
    rows = spark.read.parquet(M.table_path(index_dir, "bin_stats")).collect()
    rows.sort(key=lambda r: r.dim)
    thresh = np.array([r.thresh for r in rows], dtype=np.float64)
    _BIN_THRESH[index_dir] = thresh
    return thresh


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, dims) bool → (n, ceil(dims/64)) int64: little-endian packing
    (dim d → bit d mod 64 of word d div 64), trailing pad bits zero.
    The int64 VIEW keeps the uint64 bit pattern (bit 63 = sign bit);
    readers only xor/popcount, so the sign is never interpreted."""
    n, dims = bits.shape
    n_words = (dims + 63) // 64
    padded = np.zeros((n, n_words * 64), dtype=bool)
    padded[:, :dims] = bits
    weights = np.left_shift(
        np.uint64(1), np.arange(64, dtype=np.uint64)
    )
    words = (padded.reshape(n, n_words, 64) * weights).sum(
        axis=2, dtype=np.uint64
    )
    return words.view(np.int64)


def _binary_encode_udf(thresh: np.ndarray):
    """Vectorized sign-bit encoder over the ``embedding`` column —
    Arrow-batched numpy kernel, same convention as the SQ8/PQ encoders.
    Build/append-time only: the probe path never runs Python."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def encode(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        return pd.Series(list(_pack_bits(x > thresh[None, :])))

    return encode


def _binary_encode_np(vec, thresh: np.ndarray) -> list[int]:
    """Driver-side twin of :func:`_binary_encode_udf` for query
    vectors — same thresholds, same strict >, same packing."""
    x = np.asarray(vec, dtype=np.float64)
    return [int(w) for w in _pack_bits((x > thresh)[None, :])[0]]


def _hamming_col(words, q_words):
    """Hamming distance between two packed-word array columns — pure
    Catalyst integer bit-arithmetic (xor → bit_count → sum), zero
    Python, zero Arrow: the whole shortlist scoring stage stays inside
    whole-stage codegen."""
    return F.aggregate(
        F.zip_with(
            words, q_words, lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _binary_ones_aggregate(words_df: DataFrame) -> tuple[int, int]:
    """(set_bits, n_rows) over a binary table or batch — one
    map-side-combined aggregate; pad bits are zero so only real
    components count. Maintenance/append-time only."""
    ones = F.aggregate(
        "words", F.lit(0), lambda acc, w: acc + F.bit_count(w)
    )
    row = words_df.agg(
        F.sum(ones).alias("ones"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return int(row.ones or 0), int(row.n)


def _stamp_binary_counters(index_dir: str, ones: int, n: int) -> None:
    M.write_meta(index_dir, _BINARY_ONES_KEY, int(ones))
    M.write_meta(index_dir, _BINARY_ROWS_KEY, int(n))


def _accumulate_binary_counters(
    index_dir: str, words_df: DataFrame
) -> None:
    """Append-time half of the bit-balance accounting: fold the new
    batch's (ones, rows) into the manifest counters — one O(new)
    aggregate per append, so the balance audit stays O(metadata)."""
    if M.read_meta(index_dir, _BINARY_ROWS_KEY, None) is None:
        return
    ones, n = _binary_ones_aggregate(words_df)
    _stamp_binary_counters(
        index_dir,
        M.read_meta(index_dir, _BINARY_ONES_KEY, 0) + ones,
        M.read_meta(index_dir, _BINARY_ROWS_KEY, 0) + n,
    )


def add_binary_to_ann_index(spark: SparkSession, index_dir: str) -> None:
    """Derive the binary arm from the stored ``raw/`` partitions: one
    per-dim min/max aggregate trains the midrange thresholds
    (``bin_stats/``), one map-only encode pass lands ``binary/``
    (vec_id, words array<long>) under the layout's own pruning key —
    ``cell`` single-level, ``(group, cell)`` two-level — so probed
    reads stay partition-pruned on either layout. Idempotent
    (overwrite); re-run to retrain after a rebuild.

    RETRAIN RULE: the thresholds are immutable once trained (appends
    encode against them, so old and new words stay comparable), and —
    unlike the SQ8 grid — a drifting append distribution can NEVER
    make the arm inexact: a bit is a bit, the Hamming shortlist and
    the exact rerank remain correct. What drift costs is
    DISCRIMINATION: off-center thresholds skew the corpus bit balance
    and Hamming distances bunch up. :func:`ann_index_stats` reports
    ``binary_ones_frac`` (set-bit fraction, from the O(metadata)
    counters) next to the trained balance; when it walks more than
    ~5 points from the trained value, or the corpus more than doubles
    past the thresholds' training set, :func:`compact_ann_index`
    re-runs this verb automatically (same no-knob contract as the SQ8
    drift retrain)."""
    _check_layout(index_dir)
    _BIN_THRESH.pop(index_dir, None)
    pcols = ["group", "cell"] if _is_2level(index_dir) else ["cell"]
    raw = _live(
        spark, index_dir, spark.read.parquet(M.table_path(index_dir, "raw"))
    )
    (
        raw.select(F.posexplode("embedding").alias("dim", "xf"))
        .select("dim", F.col("xf").cast("double").alias("x"))
        .groupBy("dim")
        .agg(((F.min("x") + F.max("x")) / F.lit(2.0)).alias("thresh"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(M.table_path(index_dir, "bin_stats"))
    )
    thresh = _read_bin_thresh(spark, index_dir)
    (
        raw.select(
            "vec_id",
            *pcols,
            _binary_encode_udf(thresh)(F.col("embedding")).alias("words"),
        )
        .repartition(*pcols)
        .write.mode("overwrite")
        .partitionBy(*pcols)
        .parquet(M.table_path(index_dir, "binary"))
    )
    ones, n_trained = _binary_ones_aggregate(
        spark.read.parquet(M.table_path(index_dir, "binary"))
    )
    n_bits = n_trained * len(thresh)
    M.write_meta(index_dir, _BINARY_DIMS_KEY, int(len(thresh)))
    M.write_meta(index_dir, _BINARY_TRAINED_ROWS_KEY, int(n_trained))
    M.write_meta(
        index_dir,
        _BINARY_TRAINED_ONES_KEY,
        float(ones) / float(n_bits) if n_bits else 0.0,
    )
    _stamp_binary_counters(index_dir, ones, n_trained)
    M.write_meta(index_dir, _BINARY_KEY, True)


def _binary_scored(
    spark: SparkSession,
    index_dir: str,
    probe_rows: list[tuple],
    probe_schema: str,
    join_keys: list[str],
    predicate,
) -> DataFrame:
    """Shared Hamming-shortlist stage for both layouts: pruned scan of
    ``binary/``, broadcast probe join (each probe row carries its
    query's packed words, so no second join attaches them), and the
    codegen Hamming column. Returns (q_id, vec_id, ham)."""
    probes_df = spark.createDataFrame(probe_rows, probe_schema)
    words = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "binary")).where(
            predicate
        ),
    )
    return (
        words.join(F.broadcast(probes_df), join_keys)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _hamming_col("words", "q_words").alias("ham"),
        )
    )


def ann_index_binary_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """Two-stage binary search: partition-pruned scan of the probed
    cells' packed sign bits (~dims/8 B per vector — 8 B at DIM=64, 8x
    under SQ8, 32x under raw), Hamming shortlist against the broadcast
    query words ENTIRELY in whole-stage codegen (ties to lower
    vec_id), exact cosine rerank on the shortlist only. Output
    contract matches ann_index_ivf_topk: (q_id, vec_id, sim, rank)."""
    if not M.read_meta(index_dir, _BINARY_KEY, False):
        raise ValueError(
            f"no binary arm at {index_dir}: run add_binary_to_ann_index"
            " first"
        )
    shortlist = 4 * k if shortlist is None else shortlist
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    thresh = _read_bin_thresh(spark, index_dir)
    q_words = {
        int(q): _binary_encode_np(vec, thresh) for q, vec in queries
    }
    scored = _binary_scored(
        spark,
        index_dir,
        [(q, c, q_words[q]) for q, c in probes],
        "q_id long, cell int, q_words array<long>",
        ["cell"],
        _cell_predicate(probes),
    )
    short = S.topk_per_key(
        scored, "q_id", [F.col("ham"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")

    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(
        _cell_predicate(probes)
    )
    reranked = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def _cascade_stage23(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    scored_bin: DataFrame,
    predicate,
    k: int,
    shortlist: int,
    coarse_shortlist: int,
) -> DataFrame:
    """Stages 2+3 of the three-stage cascade, shared by both layouts:
    the binary Hamming survivors (stage 1, ``scored_bin``) are cut to
    ``coarse_shortlist`` per query, code-space SQ8 L2 re-scores ONLY
    those survivors (broadcast semi-join onto the pruned codes scan —
    the integer distance work shrinks from the probed population to
    |queries| x coarse_shortlist pairs, and the per-pair L2 is a
    ``zip_with`` square-sum that stays in whole-stage codegen, so the
    cascade's first TWO stages run with no Python at all), and the
    exact cosine rerank reads only the final ``shortlist`` rows."""
    short1 = S.topk_per_key(
        scored_bin, "q_id", [F.col("ham"), F.col("vec_id")], coarse_shortlist
    ).select("q_id", "vec_id")
    vmin, scale = _read_sq_stats(spark, index_dir)
    q_codes_df = spark.createDataFrame(
        [
            (int(q), [int(c) for c in _sq8_encode_np(vec, vmin, scale)])
            for q, vec in queries
        ],
        "q_id long, q_codes array<int>",
    )
    sq8 = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "sq8")).where(predicate),
    )
    # (a-b)^2 summed as int: bounded by dims * 255^2 (~4.2M at dims=64,
    # overflow-safe far past any real embedding width)
    sq_dist = F.aggregate(
        F.zip_with("codes", "q_codes", lambda a, b: (a - b) * (a - b)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sq_scored = (
        sq8.join(F.broadcast(short1), "vec_id")
        .join(F.broadcast(q_codes_df), "q_id")
        .select("q_id", "vec_id", sq_dist.alias("sq_dist"))
    )
    # sq_scored is already bounded (≤ queries × coarse_shortlist rows),
    # so the mid-cascade cut needs only the single window
    short2 = S.topk_bounded(
        sq_scored, "q_id", [F.col("sq_dist"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")
    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(predicate)
    reranked = (
        raw.join(F.broadcast(short2), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def ann_index_cascade_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    coarse_shortlist: int | None = None,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """The probed-bytes ladder COMPOSED as a three-stage cascade:
    binary Hamming over the packed sign bits (~dims/8 B per scanned
    vector) covers the whole probed population and keeps
    ``coarse_shortlist`` candidates; exact-integer SQ8 code-space L2
    re-scores only those survivors down to ``shortlist``; exact cosine
    reranks only those to the final k. The deep-but-cheap first stage
    absorbs the 1-bit rung's precision loss (its honest 8M recall at a
    4K shortlist is 0.82; with the cascade's deeper coarse cut the SQ8
    stage re-ranks with 8x the precision before anything exact runs),
    and the first TWO stages are pure whole-stage codegen — the only
    Python in the plan is the final |q| x shortlist cosine kernel.
    Requires both derived arms. Output contract matches
    ann_index_ivf_topk: (q_id, vec_id, sim, rank)."""
    if not M.read_meta(index_dir, _BINARY_KEY, False):
        raise ValueError(
            f"no binary arm at {index_dir}: run add_binary_to_ann_index"
            " first"
        )
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        raise ValueError(
            f"no SQ8 arm at {index_dir}: run add_sq8_to_ann_index first"
        )
    shortlist = 4 * k if shortlist is None else shortlist
    coarse_shortlist = (
        4 * shortlist if coarse_shortlist is None else coarse_shortlist
    )
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    thresh = _read_bin_thresh(spark, index_dir)
    q_words = {
        int(q): _binary_encode_np(vec, thresh) for q, vec in queries
    }
    scored = _binary_scored(
        spark,
        index_dir,
        [(q, c, q_words[q]) for q, c in probes],
        "q_id long, cell int, q_words array<long>",
        ["cell"],
        _cell_predicate(probes),
    )
    return _cascade_stage23(
        spark,
        index_dir,
        queries,
        scored,
        _cell_predicate(probes),
        k,
        shortlist,
        coarse_shortlist,
    )


def ann_index_2level_cascade_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    coarse_shortlist: int | None = None,
    n_probe_groups: int | None = None,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """:func:`ann_index_cascade_topk` on the sharded-quantizer layout —
    the three-stage binary → SQ8 → exact cascade over the
    (group, cell)-pruned scans, so the composed ladder exists on BOTH
    layouts like each of its rungs."""
    if not M.read_meta(index_dir, _BINARY_KEY, False):
        raise ValueError(
            f"no binary arm at {index_dir}: run add_binary_to_ann_index"
            " first"
        )
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        raise ValueError(
            f"no SQ8 arm at {index_dir}: run add_sq8_to_ann_index first"
        )
    shortlist = 4 * k if shortlist is None else shortlist
    coarse_shortlist = (
        4 * shortlist if coarse_shortlist is None else coarse_shortlist
    )
    if n_probe_groups is None:
        n_probe_groups = N_PROBE_GROUPS
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    thresh = _read_bin_thresh(spark, index_dir)
    q_words = {
        int(q): _binary_encode_np(vec, thresh) for q, vec in queries
    }
    g_pred = F.col("group").isin(sorted({g for _, g, _ in probes}))
    c_pred = F.col("cell").isin(sorted({c for _, _, c in probes}))
    scored = _binary_scored(
        spark,
        index_dir,
        [(q, g, c, q_words[q]) for q, g, c in probes],
        "q_id long, group long, cell long, q_words array<long>",
        ["group", "cell"],
        g_pred & c_pred,
    )
    return _cascade_stage23(
        spark,
        index_dir,
        queries,
        scored,
        g_pred & c_pred,
        k,
        shortlist,
        coarse_shortlist,
    )


# --------------------------------------------------------------------------
# Index maintenance: compaction + layout audit.

# The three partitioned artifact tables and their partition columns.
_PARTITIONED_TABLES = {
    "vectors": "cell",
    "raw": "cell",
    "lsh_buckets": "table_id",
}

# The two-level (sharded-quantizer) layout's partitioned tables: corpus
# tables keyed by the composed (group, cell); the fine quantizer shard
# table by group. No lsh_buckets arm in this layout.
_PARTITIONED_TABLES_2L = {
    "vectors": ("group", "cell"),
    "raw": ("group", "cell"),
    "fine": ("group",),
}


def _table_map(index_dir: str) -> dict:
    """The partitioned-table map for whichever layout (and optional
    derived arms) live at ``index_dir`` — what compaction and the
    layout audit iterate. The SQ8 arm joins the single-level map when
    its manifest flag is set."""
    if _is_2level(index_dir):
        tables = dict(_PARTITIONED_TABLES_2L)
        if M.read_meta(index_dir, _SQ8_KEY, False):
            tables["sq8"] = ("group", "cell")
            if M.read_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None) is not None:
                tables["sq8_prefix"] = ("group", "cell")
        if M.read_meta(index_dir, _BINARY_KEY, False):
            tables["binary"] = ("group", "cell")
        return tables
    tables = dict(_PARTITIONED_TABLES)
    if M.read_meta(index_dir, _SQ8_KEY, False):
        tables["sq8"] = "cell"
        if M.read_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None) is not None:
            tables["sq8_prefix"] = "cell"
    if M.read_meta(index_dir, _BINARY_KEY, False):
        tables["binary"] = "cell"
    return tables


def _is_2level(index_dir: str) -> bool:
    """Which layout lives at ``index_dir`` — the two schemes' table sets
    are disjoint markers (2-level has ``coarse/``, single-level has
    ``centroids/``), so maintenance verbs can dispatch without a flag.
    (Local-FS probe, like ann_index_exists.)"""
    import os

    return os.path.isdir(M.table_path(index_dir, "coarse"))


_data_files = M.data_files


# The documented SQ8 retrain rule (add_sq8_to_ann_index docstring) as
# thresholds the maintenance pass acts on: retrain when more than ~1%
# of code components sit outside the byte range, or when the corpus
# has more than doubled past what the grid trained on.
SQ8_RETRAIN_OOB_FRAC = 0.01
SQ8_RETRAIN_GROWTH = 1.0

# The binary retrain rule (add_binary_to_ann_index docstring):
# re-derive the thresholds when the corpus bit balance has walked more
# than 5 points from the trained balance, or the corpus has more than
# doubled past what the thresholds trained on. Search is exact either
# way (a bit is a bit) — the rule protects shortlist DISCRIMINATION.
BINARY_RETRAIN_BALANCE_DELTA = 0.05
BINARY_RETRAIN_GROWTH = 1.0


def _binary_drift_numbers(
    spark: SparkSession, index_dir: str, exact: bool = False
) -> tuple[float, int, int | None]:
    """(ones_frac, n_rows, rows_past_train) for the binary arm —
    O(metadata) off the manifest counters; ``exact=True`` (and the
    fallback for an unstamped store) recomputes from the table. Same
    contract as :func:`_sq8_drift_numbers`."""
    dims = int(M.read_meta(index_dir, _BINARY_DIMS_KEY, 0) or 0)
    trained = M.read_meta(index_dir, _BINARY_TRAINED_ROWS_KEY, None)
    if not exact:
        ones = M.read_meta(index_dir, _BINARY_ONES_KEY, None)
        n_rows = M.read_meta(index_dir, _BINARY_ROWS_KEY, None)
        if ones is not None and n_rows is not None:
            bits = int(n_rows) * dims
            frac = float(ones) / float(bits) if bits else 0.0
            past = (
                int(n_rows) - int(trained) if trained is not None else None
            )
            return frac, int(n_rows), past
    ones_n, n_rows = _binary_ones_aggregate(
        spark.read.parquet(M.table_path(index_dir, "binary"))
    )
    bits = n_rows * dims
    frac = float(ones_n) / float(bits) if bits else 0.0
    past = int(n_rows) - int(trained) if trained is not None else None
    return frac, int(n_rows), past


def _binary_drift_retrain_due(
    spark: SparkSession, index_dir: str
) -> dict | None:
    """The binary-arm drift check :func:`compact_ann_index` runs —
    O(metadata), returning the evidence dict when the documented rule
    fires, else None."""
    if not M.read_meta(index_dir, _BINARY_KEY, False):
        return None
    frac, _n_rows, past = _binary_drift_numbers(spark, index_dir)
    trained_frac = M.read_meta(index_dir, _BINARY_TRAINED_ONES_KEY, None)
    trained = M.read_meta(index_dir, _BINARY_TRAINED_ROWS_KEY, None)
    walked = (
        trained_frac is not None
        and abs(frac - float(trained_frac)) > BINARY_RETRAIN_BALANCE_DELTA
    )
    grown = (
        past is not None
        and trained is not None
        and int(trained) > 0
        and past > BINARY_RETRAIN_GROWTH * int(trained)
    )
    if walked or grown:
        return {
            "ones_frac": frac,
            "trained_ones_frac": trained_frac,
            "rows_past_train": past,
            "trained_rows": trained,
        }
    return None


def _sq8_drift_retrain_due(
    spark: SparkSession, index_dir: str
) -> dict | None:
    """The drift check :func:`compact_ann_index` runs before its
    rewrite — O(metadata) (manifest counters), returning the evidence
    dict when the documented retrain rule fires, else None."""
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        return None
    frac, _n_rows, past = _sq8_drift_numbers(spark, index_dir)
    trained = M.read_meta(index_dir, _SQ8_TRAINED_ROWS_KEY, None)
    grown = (
        past is not None
        and trained is not None
        and int(trained) > 0
        and past > SQ8_RETRAIN_GROWTH * int(trained)
    )
    if frac > SQ8_RETRAIN_OOB_FRAC or grown:
        return {
            "oob_frac": frac,
            "rows_past_grid": past,
            "trained_rows": trained,
        }
    return None


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    tables: tuple[str, ...] | None = None,
    sq8_drift_check: bool = True,
) -> dict:
    """Rewrite each partitioned artifact table so every partition holds
    one file-set again, and return per-table file counts before/after.

    ``append_to_ann_index`` lands one file-set per cell per batch —
    correct, but N hourly upserts give N small files per hot cell, and
    a partition-pruned search then pays N footer reads + N row-group
    seeks per probed cell: the small-files degradation a real user hits
    first at 100 TB. Compaction is the standard maintenance pass: read
    the table, cluster by its partition column (all rows of a cell land
    in one task ⇒ exactly one file per cell), write it to a NEW
    generation directory, and publish with the atomic manifest flip
    (operators/index_maintenance.py module docstring): readers resolve
    paths through the manifest, so at any instant they see the OLD
    complete table or the NEW complete one — never a half-swapped dir —
    and the superseded generation is retained one cycle for readers
    already scanning it; a crash mid-write leaves the manifest (and
    readers) on the old generation. Row content is
    untouched (pinned bit-identical by tests/test_ann_index.py), so the
    immutable-quantizer invariant and every reader are unaffected.

    Pending tombstones (see :func:`delete_from_ann_index`) are applied
    PHYSICALLY here — the rewrite anti-joins each table against them,
    and once every partitioned table has been rewritten the tombstone
    side table is cleared: readers stop paying the logical filter, and
    the deleted rows' storage is actually reclaimed. Partial-table
    compactions keep the tombstones (the anti-join is idempotent, so a
    survivor table stays correct either way).

    Works on BOTH layouts: the single-level (cell / table_id) tables and
    the two-level (group, cell) tables — dispatch is by the on-disk
    marker (:func:`_is_2level`); ``tables=None`` compacts every
    partitioned table of whichever layout is present.

    DRIFT-TRIGGERED SQ8 RETRAIN (``sq8_drift_check``, default on): the
    engine's no-knob principle applied to the grid-drift audit — an
    operator should not have to read ``sq8_oob_code_frac`` and call
    :func:`add_sq8_to_ann_index` by hand. The check runs O(metadata)
    off the manifest counters before the rewrite; when the store
    carries the arm and the documented rule fires (oob_frac > 1% or
    the corpus has more than doubled past the grid), the idempotent
    retrain verb re-runs AFTER the rewrite — the grid re-derives from
    the just-compacted (tombstone-applied) ``raw/``, every vector
    re-encodes, a present prefix arm re-lands, and the drift counters
    reset. The rare retrain pays one extra rewrite of the small codes
    table; the common no-drift compaction instead restamps the
    counters exactly from the table it rewrote anyway. The returned
    stats carry the evidence under ``"sq8_retrain"`` and the manifest
    records it (``__sq8_last_retrain__``). A binary arm gets the same
    treatment under the same flag: its bit-balance/growth rule
    (:func:`add_binary_to_ann_index`) is checked O(metadata), a due
    retrain re-derives the thresholds and words after the rewrite
    (``"binary_retrain"`` / ``__binary_last_retrain__``), and a
    no-drift compaction restamps the balance counters exactly."""
    _check_layout(index_dir)
    table_map = _table_map(index_dir)
    todo = tables or tuple(table_map)
    retrain = (
        _sq8_drift_retrain_due(spark, index_dir)
        if sq8_drift_check and "sq8" in todo
        else None
    )
    bin_retrain = (
        _binary_drift_retrain_due(spark, index_dir)
        if sq8_drift_check and "binary" in todo
        else None
    )
    stats = M.compact_index(
        spark, index_dir, table_map, todo, "vec_id"
    )
    if retrain:
        add_sq8_to_ann_index(spark, index_dir)
        M.write_meta(index_dir, "__sq8_last_retrain__", retrain)
        stats["sq8_retrain"] = retrain
    elif "sq8" in todo and M.read_meta(index_dir, _SQ8_KEY, False):
        # the rewrite applied tombstones physically: restamp the drift
        # counters exactly from the compacted table (one aggregate over
        # data the compaction just rewrote anyway)
        oob, comp, n = _sq8_code_aggregate(
            spark.read.parquet(M.table_path(index_dir, "sq8"))
        )
        _stamp_sq8_counters(index_dir, oob, comp, n)
    if bin_retrain:
        add_binary_to_ann_index(spark, index_dir)
        M.write_meta(index_dir, "__binary_last_retrain__", bin_retrain)
        stats["binary_retrain"] = bin_retrain
    elif "binary" in todo and M.read_meta(index_dir, _BINARY_KEY, False):
        ones, n = _binary_ones_aggregate(
            spark.read.parquet(M.table_path(index_dir, "binary"))
        )
        _stamp_binary_counters(index_dir, ones, n)
    return stats


def ann_index_stats(
    spark: SparkSession, index_dir: str, exact_drift: bool = False
) -> DataFrame:
    """Layout audit over the partitioned artifact tables: one row per
    table with rows/partition skew and files/partition — the numbers
    that tell an operator WHEN to run :func:`compact_ann_index` (rising
    ``max_part_files``) and whether the partitioning is balanced
    (``max_part_rows`` vs ``avg_part_rows``). Rows-only by design: the
    physical file layout is Spark-side state with no SQL-expressible
    DuckDB twin. Layout-dispatched like :func:`compact_ann_index`.

    When the SQ8 arm is present its row additionally carries the GRID
    DRIFT audit (null on every other table): ``sq8_oob_code_frac`` =
    fraction of code components outside 0..255 (appends encode against
    the immutable grid unclipped — exactness is preserved, but OOB
    codes mean the append distribution has walked past the trained
    range) and ``sq8_rows_past_grid`` = NET row growth since the grid
    trained (negative after compacted deletes shrink the corpus below
    what the grid saw — read as max(0, value)). The drift numbers come
    from the O(metadata) manifest counters (see
    :func:`_sq8_drift_numbers`); ``exact_drift=True`` recomputes them
    with the full-table aggregate for audits. The retrain rule lives
    on :func:`add_sq8_to_ann_index` and fires automatically from
    :func:`compact_ann_index`.

    A binary arm likewise carries its bit-balance audit on its own row
    (``binary_ones_frac`` = set-bit fraction of the corpus words,
    ``binary_rows_past_train`` = net growth since the thresholds
    trained), from the same O(metadata) counter discipline; the
    retrain rule lives on :func:`add_binary_to_ann_index`."""
    _check_layout(index_dir)
    stats = M.index_stats(spark, index_dir, _table_map(index_dir))
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        stats = stats.withColumn(
            "sq8_oob_code_frac", F.lit(None).cast("double")
        ).withColumn("sq8_rows_past_grid", F.lit(None).cast("long"))
    else:
        frac, _n_rows, past = _sq8_drift_numbers(
            spark, index_dir, exact=exact_drift
        )
        stats = stats.withColumn(
            "sq8_oob_code_frac",
            F.when(F.col("table") == "sq8", F.lit(frac)).cast("double"),
        ).withColumn(
            "sq8_rows_past_grid",
            F.when(F.col("table") == "sq8", F.lit(past)).cast("long"),
        )
    if not M.read_meta(index_dir, _BINARY_KEY, False):
        return stats.withColumn(
            "binary_ones_frac", F.lit(None).cast("double")
        ).withColumn("binary_rows_past_train", F.lit(None).cast("long"))
    bfrac, _bn, bpast = _binary_drift_numbers(
        spark, index_dir, exact=exact_drift
    )
    return stats.withColumn(
        "binary_ones_frac",
        F.when(F.col("table") == "binary", F.lit(bfrac)).cast("double"),
    ).withColumn(
        "binary_rows_past_train",
        F.when(F.col("table") == "binary", F.lit(bpast)).cast("long"),
    )


def _sq8_drift_numbers(
    spark: SparkSession, index_dir: str, exact: bool = False
) -> tuple[float, int, int | None]:
    """(oob_frac, n_rows, rows_past_grid) — O(metadata) by default: the
    manifest counters stamped at retrain, accumulated at append, and
    recomputed at compaction carry the exact physical-table numbers, so
    a monitoring call reads three keys instead of rescanning a
    corpus-sized codes table (the r12 regression: the stats query
    doubled in cost and scaled with the corpus). ``exact=True`` — and
    the fallback for a store whose counters were never stamped — runs
    the one-aggregate scan; the two paths agree exactly because every
    counter transition is measured from the same codes (pinned by
    test). ``rows_past_grid`` is the NET row growth since the grid
    trained — deletes applied physically by a later compaction shrink
    it and can make it negative (the corpus is smaller than the grid
    ever saw: no drift pressure); the retrain rule reads it as
    max(0, value)."""
    trained = M.read_meta(index_dir, _SQ8_TRAINED_ROWS_KEY, None)
    if not exact:
        oob = M.read_meta(index_dir, _SQ8_OOB_KEY, None)
        comp = M.read_meta(index_dir, _SQ8_COMP_KEY, None)
        n_rows = M.read_meta(index_dir, _SQ8_ROWS_KEY, None)
        if oob is not None and comp is not None and n_rows is not None:
            frac = float(oob) / float(comp) if comp else 0.0
            past = (
                int(n_rows) - int(trained) if trained is not None else None
            )
            return frac, int(n_rows), past
    oob_n, comp_n, n_rows = _sq8_code_aggregate(
        spark.read.parquet(M.table_path(index_dir, "sq8"))
    )
    frac = float(oob_n) / float(comp_n) if comp_n else 0.0
    past = int(n_rows) - int(trained) if trained is not None else None
    return frac, int(n_rows), past


def sq8_drift_stats(
    spark: SparkSession, index_dir: str, exact: bool = False
) -> DataFrame:
    """The drift audit ALONE (the registered per-round query's shape:
    ann_index_stats would re-aggregate every artifact table just to
    keep one row) — O(metadata) from the manifest counters by default,
    ``exact=True`` for the full-scan audit. Raises if the store has no
    SQ8 arm, like the sq8 readers."""
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        raise ValueError(
            f"no SQ8 arm at {index_dir}: run add_sq8_to_ann_index first"
        )
    frac, n_rows, past = _sq8_drift_numbers(spark, index_dir, exact=exact)
    return spark.createDataFrame(
        [("sq8", n_rows, frac, past)],
        "table string, rows bigint, sq8_oob_code_frac double, "
        "sq8_rows_past_grid bigint",
    )


# --------------------------------------------------------------------------
# Two-level IVF (IMI-style quantizer shard) — the layout past the
# AUTO_MAX_CELLS wall that auto_n_centroids' docstring defers to.
#
# Layout (all under ``index_dir``; disjoint from the single-level tables,
# so the two schemes can't be confused for one another):
#
# - ``coarse/``  (group, g_emb) — the LIVE coarse groups (groups that own
#   at least one fine cell), tiny.
# - ``fine/``    (cell, c_emb) **partitioned by group** — the fine
#   centroids, sharded by their nearest coarse group. A reader fetches
#   only the probed groups' shards: probe-side cost is
#   n_groups + n_probe_groups * (n_cells / n_groups) centroid cosines,
#   never n_cells.
# - ``raw/``     (vec_id, embedding) **partitioned by (group, cell)** —
#   the corpus under the COMPOSED assignment (nearest live group, then
#   nearest fine cell within it). Search prunes on group at the top
#   directory level and cell below it.
# - ``codebook/`` (subspace, dim, cell, ic) — the PQ codebook, same
#   layout and convention as the single-level table (corpus rows with
#   vec_id < PQ_K, integer domain), so ``_load_codebook`` and the
#   flattened ADC LUT serve both families unchanged.
# - ``vectors/`` (vec_id, codes array<int>) **partitioned by (group,
#   cell)** — the PQ-encoded corpus, packed: the billion-vector arm. The layout
#   exists precisely for corpora past ~270M vectors, where a probed-cell
#   scan of raw floats (256 B/vector at DIM=64 float32) costs ~100x the
#   IO of 2-byte PQ codes; ``ann_index_2level_ivfpq_topk`` reads ONLY
#   this table plus the metadata-sized quantizers.
#
# Assignment, probe selection, and scoring all use the same rounded-6
# cosine + (sim desc, id asc) tie-break as the single-level family, so
# the DuckDB twin (_ANN_2LEVEL_SQL in plans/llm_ops.py) reproduces every
# step bit-identically.


def _group_of_cells(c_mat: np.ndarray, g_mat: np.ndarray) -> np.ndarray:
    """cell -> nearest coarse group (rounded cosine, ties to lower
    group id) — the gmap that shards the fine quantizer. Driver-side:
    n_cells x n_groups cosines over the two metadata-sized quantizer
    matrices (33 MB of centroids at the 65k-cell shape) — feasible to
    ~1M cells, which is exactly where auto_quantizer_shape clamps
    (AUTO_MAX_CELLS_2L); past that this pass must distribute."""
    c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))
    g_norm = np.sqrt(np.einsum("ij,ij->i", g_mat, g_mat))
    sims = np.round((c_mat @ g_mat.T) / (c_norm[:, None] * g_norm[None, :]), 6)
    return np.argmax(sims, axis=1).astype("int64")


def nearest_cell_2level_udf(
    g_ids: np.ndarray,
    g_mat: np.ndarray,
    fine_by_group: dict[int, tuple[np.ndarray, np.ndarray]],
):
    """Pandas UDF for the composed two-level assignment: nearest LIVE
    coarse group, then nearest fine cell within that group — returns the
    fine ``cell`` id (the group is a function of the cell via the gmap;
    the build re-attaches it with a broadcast join against the
    metadata-sized fine table). Each vector's fine argmax touches only
    its group's ~n_cells/n_groups centroids (the two-level build win:
    corpus x (G + C/G) cosines, not corpus x C). Same rounded-6 /
    first-maximum conventions as nearest_cell_udf."""
    g = g_mat.astype(np.float64)
    g_norm = np.sqrt(np.einsum("ij,ij->i", g, g))
    groups = [
        (int(gid), ids, m.astype(np.float64), np.sqrt(np.einsum("ij,ij->i", m, m)))
        for gid, (ids, m) in sorted(fine_by_group.items())
    ]
    assert [gid for gid, *_ in groups] == [int(x) for x in g_ids]

    @F.pandas_udf(T.LongType())
    def nearest(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        x = np.vstack(col.to_numpy()).astype(np.float64)
        x_norm = np.sqrt(np.einsum("ij,ij->i", x, x))
        gsims = np.round((x @ g.T) / (x_norm[:, None] * g_norm[None, :]), 6)
        gsel = np.argmax(gsims, axis=1)  # index into the LIVE group list
        out_c = np.empty(len(x), dtype="int64")
        for pos, (_gid, cell_ids, m, m_norm) in enumerate(groups):
            mask = gsel == pos
            if not mask.any():
                continue
            xs = x[mask]
            sims = np.round(
                (xs @ m.T) / (x_norm[mask][:, None] * m_norm[None, :]), 6
            )
            out_c[mask] = cell_ids[np.argmax(sims, axis=1)]
        return pd.Series(out_c)

    return nearest


def _assign_sqdist_in_group(key, left: pd.DataFrame, right: pd.DataFrame):
    """Cogroup kernel: one group's corpus rows × that group's fine
    shard — ONE rounded-squared-distance matrix per cogroup, first
    minimum over cells sorted ascending (exactly the (dist asc, cell
    asc) convention of similarity._assign_cells). Returns IDS ONLY
    (vec_id, group, cell) — the _assign_cells_in_group payload
    doctrine: carrying embeddings back out of the cogroup doubles the
    Arrow payload, so the caller re-attaches them JVM-side."""
    if left.empty or right.empty:
        return pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "group": pd.Series(dtype="int64"),
                "cell": pd.Series(dtype="int64"),
            }
        )
    order = np.argsort(right["cell"].to_numpy(), kind="stable")
    cells = right["cell"].to_numpy()[order]
    c = np.vstack(right["c_emb"].to_numpy()[order]).astype(np.float64)
    x = np.vstack(left["embedding"].to_numpy()).astype(np.float64)
    d = x[:, None, :] - c[None, :, :]
    dists = np.round(np.einsum("nkd,nkd->nk", d, d), 6)
    sel = np.argmin(dists, axis=1)
    return pd.DataFrame(
        {
            "vec_id": left["vec_id"].to_numpy(),
            "group": np.full(len(left), int(key[0]), dtype="int64"),
            "cell": cells[sel],
        }
    )


def _assign_cells_grouped(members: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment RESTRICTED to each row's group — the
    per-group Lloyd's step of the two-level refinement, COGROUPED on
    ``group`` so each task sees one group's rows × that group's
    ~n_cells/n_groups centroids and emits one assignment row per
    vector. The previous equi-join + per-vector-window formulation
    materialized ~corpus × cells_per_group scored rows per round
    (measured ~35 GB of spill at 8M in the full-assignment regime);
    the cogroup keeps the same arithmetic (rounded squared distance,
    cell-id tie-break — :func:`_assign_sqdist_in_group`) at corpus
    volume. ``members``: (vec_id, embedding, group); ``cents``:
    (group, cell, c_emb). Returns (vec_id, embedding, group, cell) —
    embeddings re-attached with one JVM-side join keyed on vec_id."""
    ids = (
        members.select("vec_id", "embedding", "group")
        .groupBy("group")
        .cogroup(cents.select("group", "cell", "c_emb").groupBy("group"))
        .applyInPandas(
            _assign_sqdist_in_group, "vec_id long, group long, cell long"
        )
    )
    return ids.join(
        members.select("vec_id", "embedding"), "vec_id"
    ).select("vec_id", "embedding", "group", "cell")


def _refined_quantizers_2level(
    spark: SparkSession,
    emb: DataFrame,
    n_groups: int,
    n_cells: int,
    refine_iters: int,
    train_fraction: float | None = None,
):
    """Train BOTH two-level quantizer levels with Lloyd's k-means — the
    production refinement the prefix convention defers to, composable
    with either build path:

    - **coarse**: global ``similarity.kmeans_centroids`` with
      k = n_groups (exactly build_ann_index's ``refine_iters`` path) —
      the trained group table is metadata-sized and collected, the same
      contract the distributed build already has for the coarse level.
    - **fine**: per-group Lloyd's, fully distributed — corpus rows are
      assigned to their (cosine-)nearest refined group ONCE, each
      group's fine shard initializes from its first n_cells/n_groups
      member ids, and every round is a group-equi-join assignment
      (:func:`_assign_cells_grouped`) + the kmeans_centroids recompute
      aggregate. The fine quantizer never reaches the driver here.

    Cell ids are the INIT member's vec_id (globally unique since a
    vector belongs to one group), so gmap falls out of the table with
    no matmul. Prefix centroids put cell boundaries wherever the first
    N corpus vectors happen to sit — on clustered real data that packs
    most of a skewed corpus into a few over-full cells (a probed-IO hot
    spot AND a recall hole, measured in tools/ann2level_rehearsal.py);
    Lloyd's rounds move centroids toward the data's actual modes so
    cell volume tracks density. Quantizer tables are written as
    DOUBLES: refined components are round(avg, 6) values that a float32
    cast would perturb, and the DuckDB twin computes in doubles — the
    prefix path keeps float (its values are exact in either type).
    Group membership for training uses the SAME rounded-cosine /
    lower-id convention as the final composed assignment, so training
    shards and search shards agree.

    ``train_fraction`` is the mini-batch k-means path kmeans_refine's
    docstring prescribes for corpus scale: BOTH levels' Lloyd's
    statistics (init, assignment rounds, centroid recomputes) run over
    a deterministic hash sample of that fraction (plus the vec_id <
    n_groups prefix the coarse init needs), while the FINAL corpus
    assignment — the standard build machinery downstream — still
    touches every row. The full-corpus assignment round materializes
    ~corpus x cells_per_group rows through a per-vector window, which
    at 8M spilled ~35 GB; the sampled rounds keep the identical plan at
    sample volume, and quantizers trained on a fixed-rate sample are
    statistically the same centroids (the 8M skew rehearsal's balance
    and recall numbers are measured THROUGH this path). None (the
    registered-fixture default) trains on everything, which is what the
    relational twin unrolls.

    Returns (live_groups, g_live_mat, fine_df) where fine_df is
    (cell, group, c_emb array<double>) — quantizer-sized, eagerly
    checkpointed so callers can consume it after members unpersist."""
    from pyspark.sql import Window

    train = emb
    if train_fraction is not None:
        train = emb.filter(
            (
                F.pmod(F.abs(F.hash("vec_id")), F.lit(10_000))
                < F.lit(int(train_fraction * 10_000))
            )
            | (F.col("vec_id") < n_groups)  # the coarse init prefix
        )
    g_rows = S.kmeans_centroids(train, n_groups, refine_iters + 1).collect()
    g_rows.sort(key=lambda r: r.cell)
    live = [int(r.cell) for r in g_rows]
    g_mat = np.array([r.c_emb for r in g_rows], dtype=np.float64)

    nearest = _nearest_group_udf(np.array(live, dtype="int64"), g_mat)
    members = train.select(
        "vec_id", "embedding", nearest(F.col("embedding")).alias("group")
    ).persist()
    try:
        k_g = max(1, n_cells // n_groups)
        w = Window.partitionBy("group").orderBy("vec_id")
        cents = (
            members.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_g)
            .select(
                "group",
                F.col("vec_id").alias("cell"),
                S.as_double(F.col("embedding")).alias("c_emb"),
            )
        )
        for _ in range(refine_iters):
            assigned = _assign_cells_grouped(members, cents)
            cents = (
                assigned.select(
                    "group",
                    "cell",
                    F.posexplode("embedding").alias("dim", "val"),
                )
                .groupBy("group", "cell", "dim")
                .agg(
                    F.round(F.avg(F.col("val").cast("double")), 6).alias("c")
                )
                .groupBy("group", "cell")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "c"))
                    ).alias("s")
                )
                .select(
                    "group",
                    "cell",
                    F.transform("s", lambda x: x["c"]).alias("c_emb"),
                )
            )
        # quantizer-sized; eager checkpoint so the fine table survives
        # the members unpersist without re-deriving the training rounds
        fine_df = cents.select("cell", "group", "c_emb").localCheckpoint(
            eager=True
        )
    finally:
        members.unpersist()
    return live, g_mat, fine_df


def _pq_encode_residual_cells_udf(
    rcb: np.ndarray, cell_ids: np.ndarray, icents: np.ndarray
):
    """Residual-PQ encoder for the TWO-LEVEL layout: the residual is
    taken against the row's FINE centroid, looked up by cell id
    (``cell_ids`` sorted ascending, ``icents`` the matching integer
    component rows). Same HALF_UP / first-minimum conventions as every
    other encoder."""
    m, _k, sub = rcb.shape
    ids = np.asarray(cell_ids, dtype="int64")
    assert list(ids) == sorted(ids)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(emb: pd.Series, cell: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        pos = np.searchsorted(ids, cell.to_numpy().astype("int64"))
        ir = S._half_up(x * S.PQ_INT_SCALE) - icents[pos]
        out = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            qs = ir[:, s * sub : (s + 1) * sub]
            d = ((qs[:, None, :] - rcb[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series([row.tolist() for row in out])

    return encode


def _write_residual_codebook(
    spark: SparkSession, index_dir: str, rcb: np.ndarray
) -> None:
    """Land a residual codebook in the standard codebook schema
    (positional cells 0..k-1 — coincides with the init vec_ids on a
    dense prefix, which is what the SQL twins assume)."""
    m, k, sub = rcb.shape
    rows = [
        (s, d, c, int(rcb[s, c, d]))
        for s in range(m)
        for c in range(k)
        for d in range(sub)
    ]
    spark.createDataFrame(
        rows, "subspace int, dim int, cell int, ic long"
    ).coalesce(1).write.mode("overwrite").parquet(
        M.table_path(index_dir, "codebook")
    )


def _residual_codebook_from_rows(
    head_rows, icent_by_cell: dict[int, np.ndarray]
) -> np.ndarray:
    """rcb[m][k][sub] from the first-PQ_K assigned rows (vec_id,
    embedding, cell) and a cell -> integer-centroid map — the
    deterministic-sample convention on RESIDUALS."""
    head = sorted(head_rows, key=lambda r: r.vec_id)
    rcb = np.zeros((S.PQ_M, len(head), S.PQ_SUB), dtype=np.int64)
    for k, r in enumerate(head):
        ir = (
            S._half_up(
                np.asarray(r.embedding, dtype=np.float64) * S.PQ_INT_SCALE
            )
            - icent_by_cell[int(r.cell)]
        )
        for s in range(S.PQ_M):
            rcb[s, k] = ir[s * S.PQ_SUB : (s + 1) * S.PQ_SUB]
    return rcb


def _write_coarse_refined(
    spark: SparkSession, index_dir: str, live: list[int], g_mat: np.ndarray
) -> None:
    """Land the refined coarse table (group, g_emb array<double> — see
    _refined_quantizers_2level on why doubles)."""
    coarse_df = spark.createDataFrame(
        [(g, [float(x) for x in g_mat[i]]) for i, g in enumerate(live)],
        T.StructType(
            [
                T.StructField("group", T.LongType()),
                T.StructField("g_emb", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    coarse_df.coalesce(1).write.mode("overwrite").parquet(
        M.table_path(index_dir, "coarse")
    )


def build_ann_index_2level(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    n_groups: int | None = N_GROUPS_2L,
    n_cells: int | None = N_CELLS_2L,
    refine_iters: int = 0,
    train_fraction: float | None = None,
    residual: bool | str = "auto",
) -> None:
    """Build the sharded-quantizer index: coarse groups over fine cells.

    Quantizers default to deterministic prefixes of the corpus (coarse
    = first ``n_groups`` vectors, fine = first ``n_cells``), the same
    oracle-reproducible convention as ivf_cells; ``refine_iters > 0``
    trains BOTH levels with Lloyd's k-means instead
    (:func:`_refined_quantizers_2level` — the production refinement
    build_ann_index already has), allocating n_cells/n_groups fine
    cells per live group; the layout and readers never care what
    produced the centroid tables. ``n_groups=None`` sizes both levels
    with :func:`auto_quantizer_shape` (one count job); shapes the rule
    maps to single-level still build fine here (n_groups=1 is just one
    coarse shard). Corpus assignment is ONE map-only pass
    (nearest_cell_2level_udf — no join, no shuffle; the only exchange is
    the partitionBy write), feeding BOTH partitioned layouts: ``raw/``
    (the exact-rerank arm) and ``vectors/`` (PQ codes — the arm a
    billion-vector probe actually scans; codebook convention identical
    to :func:`build_ann_index`, so quantizer immutability and code
    comparability carry over verbatim)."""
    if n_groups is None or n_cells is None:
        auto_g, auto_c = auto_quantizer_shape(emb.count())
        n_groups = auto_g if n_groups is None else n_groups
        n_cells = auto_c if n_cells is None else n_cells
    _COARSE.pop(index_dir, None)
    _FINE.pop(index_dir, None)
    _CODEBOOKS.pop(index_dir, None)
    _SQ_STATS.pop(index_dir, None)
    _stamp_layout(index_dir)
    # the residual flag is stamped by _land_2level_corpus AFTER the
    # assignment exists (residual="auto" decides from it)
    # a rebuild orphans any derived SQ8 arm (grid trained on the old
    # corpus) — drop the flag so readers fail loudly until re-added
    M.write_meta(index_dir, _SQ8_KEY, False)
    M.write_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
    # ... and any derived binary arm (thresholds trained on the old
    # corpus) — same fail-loudly contract
    _BIN_THRESH.pop(index_dir, None)
    M.write_meta(index_dir, _BINARY_KEY, False)

    if refine_iters > 0:
        trained, g_mat, fine_df = _refined_quantizers_2level(
            spark, emb, n_groups, n_cells, refine_iters, train_fraction
        )
        # coarse stores ALL trained groups: query probes rank over the
        # full trained set (the twin's g1), including a group that won
        # no cosine members (it then simply has no fine shard to scan).
        _write_coarse_refined(spark, index_dir, trained, g_mat)
        (
            fine_df.repartition("group")
            .write.mode("overwrite")
            .partitionBy("group")
            .parquet(M.table_path(index_dir, "fine"))
        )
        # driver build contract: the fine quantizer is collectible
        # (<= n_cells rows — the same feasibility clamp as the prefix
        # path's pool collect)
        fine_rows = fine_df.collect()
        fine_rows.sort(key=lambda r: r.cell)
        # corpus assignment ranks over the CELL-OWNING groups only — a
        # memberless group never wins a corpus argmax by definition, so
        # dropping it changes no winner and keeps the UDF's shard map
        # total
        owning = sorted({int(r.group) for r in fine_rows})
        fine_by_group: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for g in owning:
            rows = [r for r in fine_rows if int(r.group) == g]
            fine_by_group[g] = (
                np.array([int(r.cell) for r in rows], dtype="int64"),
                np.array([r.c_emb for r in rows], dtype=np.float64),
            )
        nearest = nearest_cell_2level_udf(
            np.array(owning, dtype="int64"),
            g_mat[np.array([trained.index(g) for g in owning])],
            fine_by_group,
        )
        gmap_df = spark.createDataFrame(
            [(int(r.cell), int(r.group)) for r in fine_rows],
            "cell long, group long",
        )
        assigned = (
            emb.select(
                "vec_id",
                "embedding",
                nearest(F.col("embedding")).alias("cell"),
            )
            .join(F.broadcast(gmap_df), "cell")
            .select("vec_id", "embedding", "group", "cell")
        )
        _land_2level_corpus(
            spark,
            index_dir,
            emb,
            assigned,
            fine_cells=(
                np.array([int(r.cell) for r in fine_rows], dtype="int64"),
                np.array([r.c_emb for r in fine_rows], dtype=np.float64),
            ),
            residual=residual,
        )
        return

    cent_rows = (
        emb.filter(F.col("vec_id") < max(n_groups, n_cells))
        .select("vec_id", "embedding")
        .collect()
    )
    cent_rows.sort(key=lambda r: r.vec_id)
    mat = np.array([r.embedding for r in cent_rows], dtype=np.float64)
    # corpora whose low ids are sparse (a half-built fixture, a slice)
    # may yield fewer quantizer rows than requested — clamp, as the
    # single-level filter(vec_id < n) implicitly does
    n_groups = min(n_groups, len(mat))
    n_cells = min(n_cells, len(mat))
    g_mat_all = mat[:n_groups]
    c_mat = mat[:n_cells]
    gmap = _group_of_cells(c_mat, g_mat_all)
    live = sorted({int(g) for g in gmap})

    coarse_df = spark.createDataFrame(
        [(g, [float(x) for x in g_mat_all[g]]) for g in live],
        T.StructType(
            [
                T.StructField("group", T.LongType()),
                T.StructField("g_emb", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    coarse_df.coalesce(1).write.mode("overwrite").parquet(
        M.table_path(index_dir, "coarse")
    )
    fine_df = spark.createDataFrame(
        [
            (int(c), int(gmap[c]), [float(x) for x in c_mat[c]])
            for c in range(n_cells)
        ],
        T.StructType(
            [
                T.StructField("cell", T.LongType()),
                T.StructField("group", T.LongType()),
                T.StructField("c_emb", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    (
        fine_df.repartition("group")
        .write.mode("overwrite")
        .partitionBy("group")
        .parquet(M.table_path(index_dir, "fine"))
    )

    fine_by_group: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for g in live:
        ids = np.nonzero(gmap == g)[0].astype("int64")
        fine_by_group[g] = (ids, c_mat[ids])
    g_live_mat = g_mat_all[np.array(live)]
    nearest = nearest_cell_2level_udf(
        np.array(live, dtype="int64"), g_live_mat, fine_by_group
    )
    gmap_df = spark.createDataFrame(
        [(int(c), int(gmap[c])) for c in range(n_cells)], "cell long, group long"
    )

    # one composed-assignment pass feeds both partitioned layouts
    assigned = (
        emb.select("vec_id", "embedding", nearest(F.col("embedding")).alias("cell"))
        .join(F.broadcast(gmap_df), "cell")
        .select("vec_id", "embedding", "group", "cell")
    )
    _land_2level_corpus(
        spark,
        index_dir,
        emb,
        assigned,
        fine_cells=(np.arange(n_cells, dtype="int64"), c_mat),
        residual=residual,
    )


def _land_2level_corpus(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    assigned: DataFrame,
    fine_cells: tuple[np.ndarray, np.ndarray] | None = None,
    residual: bool | str = False,
    stamp_residual: bool = True,
) -> None:
    """Land the corpus-scale tables shared by the driver-side and
    distributed 2-level builds: the PQ ``codebook/`` (single-level
    convention verbatim — corpus rows with vec_id < PQ_K, integer
    domain, so ``_load_codebook`` and the flattened ADC LUT work on a
    2-level dir with zero changes), then ``raw/`` and packed
    ``vectors/`` from ONE persisted pass over ``assigned``
    (vec_id, embedding, group, cell).

    ``residual`` resolves here, against the persisted assignment
    (:func:`_resolve_residual_auto` — "auto" measures the intra-cell /
    global variance ratio, explicit bools pass through; either way the
    manifest gets the flag + audit record). When residual wins,
    ``fine_cells`` = (sorted fine cell ids, their FLOAT centroid rows)
    supplies the per-cell centroids: the PQ arm encodes each row's
    RESIDUAL against its fine centroid (the 2-level FAISS IndexIVFPQ
    composition), the codebook becomes the first PQ_K vectors'
    residuals, and the encoder looks its centroid up by cell. Requires
    the fine quantizer collectible — the driver builds' contract; the
    distributed build encodes inside its cogroup instead (and passes
    ``stamp_residual=False`` with its already-resolved-and-stamped
    choice, so nothing here re-writes the manifest record)."""
    assigned = assigned.persist()
    try:
        if stamp_residual:
            use_residual = _resolve_residual_auto(
                index_dir,
                residual,
                assigned,
                fine_cells[0] if fine_cells is not None else None,
                fine_cells[1] if fine_cells is not None else None,
            )
        else:
            assert residual in (True, False), "pass a resolved bool"
            use_residual = bool(residual)
        if use_residual:
            assert fine_cells is not None, "residual needs fine_cells"
            cell_ids = np.asarray(fine_cells[0], dtype="int64")
            icents = _int_centroids(
                np.asarray(fine_cells[1], dtype=np.float64)
            )
            icent_by_cell = {
                int(c): icents[i] for i, c in enumerate(cell_ids)
            }
            head = assigned.filter(F.col("vec_id") < S.PQ_K).collect()
            rcb = _residual_codebook_from_rows(head, icent_by_cell)
            _write_residual_codebook(spark, index_dir, rcb)
            encode = _pq_encode_residual_cells_udf(
                _load_codebook(spark, index_dir), cell_ids, icents
            )(F.col("embedding"), F.col("cell"))
        else:
            codebook = (
                S.pq_long_form(emb)
                .filter(F.col("vec_id") < S.PQ_K)
                .select(
                    "subspace",
                    "dim",
                    F.col("vec_id").cast("int").alias("cell"),
                    F.col("iv").alias("ic"),
                )
            )
            codebook.coalesce(1).write.mode("overwrite").parquet(
                M.table_path(index_dir, "codebook")
            )
            encode = S.pq_encode_udf(_load_codebook(spark, index_dir))(
                F.col("embedding")
            )
        (
            assigned.repartition("group", "cell")
            .write.mode("overwrite")
            .partitionBy("group", "cell")
            .parquet(M.table_path(index_dir, "raw"))
        )
        # encode DIRECTLY on the assigned rows (map-only, same kernel as
        # pq_codes_fast, packed: one codes-array row per vector) — a
        # codes-by-id join here would shuffle corpus-sized tables
        # against the assignment; fused, the only exchange is the
        # partitionBy write itself
        (
            assigned.select("vec_id", "group", "cell", encode.alias("codes"))
            .repartition("group", "cell")
            .write.mode("overwrite")
            .partitionBy("group", "cell")
            .parquet(M.table_path(index_dir, "vectors"))
        )
    finally:
        assigned.unpersist()


def append_to_ann_index_2level(
    spark: SparkSession, emb_new: DataFrame, index_dir: str
) -> None:
    """Incremental append for the sharded-quantizer layout — the same
    immutable-quantizer invariant as :func:`append_to_ann_index`: new
    vectors take the composed assignment against the STORED coarse/fine
    tables (both metadata-sized) and their rows append into the
    (group, cell) partitions; nothing existing is rewritten, so append
    is O(new). Equivalence with a from-scratch build over the union
    corpus is pinned by tests (same quantizers => identical
    assignments and search results). Deletes need no 2-level twin:
    :func:`delete_from_ann_index` writes the layout-agnostic tombstone
    side table and the 2-level reader anti-joins it like every other
    reader."""
    _check_layout(index_dir)
    groups, g_mat = _read_coarse(spark, index_dir)
    fine = spark.read.parquet(M.table_path(index_dir, "fine")).collect()
    fine.sort(key=lambda r: r.cell)
    gmap_pairs = [(int(r.cell), int(r.group)) for r in fine]
    fine_by_group: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for g in groups:
        rows = [r for r in fine if int(r.group) == g]
        fine_by_group[g] = (
            np.array([int(r.cell) for r in rows], dtype="int64"),
            np.array([r.c_emb for r in rows], dtype=np.float64),
        )
    nearest = nearest_cell_2level_udf(
        np.array(groups, dtype="int64"), g_mat, fine_by_group
    )
    gmap_df = spark.createDataFrame(gmap_pairs, "cell long, group long")
    assigned = (
        emb_new.select(
            "vec_id", "embedding", nearest(F.col("embedding")).alias("cell")
        )
        .join(F.broadcast(gmap_df), "cell")
        .select("vec_id", "embedding", "group", "cell")
        .persist()
    )
    try:
        (
            assigned.repartition("group", "cell")
            .write.mode("append")
            .partitionBy("group", "cell")
            .parquet(M.table_path(index_dir, "raw"))
        )
        # PQ-encode against the STORED codebook (immutable-quantizer
        # invariant: old and new codes stay comparable under one LUT),
        # fused onto the assigned rows — map-only, packed, no join.
        # Residual indexes dispatch the fine-centroid residual encoder
        # from the same collected fine table the assignment used.
        if M.read_meta(index_dir, _RESIDUAL_KEY, False):
            enc = _pq_encode_residual_cells_udf(
                _load_codebook(spark, index_dir),
                np.array([int(r.cell) for r in fine], dtype="int64"),
                _int_centroids(
                    np.array([r.c_emb for r in fine], dtype=np.float64)
                ),
            )(F.col("embedding"), F.col("cell"))
        else:
            enc = S.pq_encode_udf(_load_codebook(spark, index_dir))(
                F.col("embedding")
            )
        (
            assigned.select("vec_id", "group", "cell", enc.alias("codes"))
            .repartition("group", "cell")
            .write.mode("append")
            .partitionBy("group", "cell")
            .parquet(M.table_path(index_dir, "vectors"))
        )
        if M.read_meta(index_dir, _SQ8_KEY, False):
            # SQ8 arm present: stored-grid encode + append, same
            # immutable-quantizer invariant as the single-level path
            vmin, scale = _read_sq_stats(spark, index_dir)
            sq8_new = assigned.select(
                "vec_id",
                "group",
                "cell",
                _sq8_encode_udf(vmin, scale)(F.col("embedding")).alias(
                    "codes"
                ),
            )
            (
                sq8_new.repartition("group", "cell")
                .write.mode("append")
                .partitionBy("group", "cell")
                .parquet(M.table_path(index_dir, "sq8"))
            )
            _accumulate_sq8_counters(index_dir, sq8_new)
            pdims = M.read_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
            if pdims is not None:
                (
                    sq8_new.select(
                        "vec_id",
                        "group",
                        "cell",
                        F.slice("codes", 1, int(pdims)).alias("codes"),
                    )
                    .repartition("group", "cell")
                    .write.mode("append")
                    .partitionBy("group", "cell")
                    .parquet(M.table_path(index_dir, "sq8_prefix"))
                )
        if M.read_meta(index_dir, _BINARY_KEY, False):
            # binary arm present: stored-threshold encode + append,
            # same immutable-quantizer invariant as the single-level
            bin_new = assigned.select(
                "vec_id",
                "group",
                "cell",
                _binary_encode_udf(_read_bin_thresh(spark, index_dir))(
                    F.col("embedding")
                ).alias("words"),
            )
            (
                bin_new.repartition("group", "cell")
                .write.mode("append")
                .partitionBy("group", "cell")
                .parquet(M.table_path(index_dir, "binary"))
            )
            _accumulate_binary_counters(index_dir, bin_new)
    finally:
        assigned.unpersist()


_COARSE: dict[str, tuple] = {}
# Per-(index_dir, group) fine-centroid shards — quantizer metadata,
# immutable once built (appends/retrains never touch ``fine/``; a
# compaction rewrite preserves its content), cached like _COARSE /
# _CENTROIDS so repeated probes skip the per-evaluation shard collect.
_FINE: dict[str, dict[int, list]] = {}


def _fine_shards(
    spark: SparkSession, index_dir: str, groups: list[int]
) -> dict[int, list]:
    """(cell, c_emb) rows of the requested groups' fine shards, from
    the per-process cache; only never-seen groups hit the (partition-
    pruned) ``fine/`` table."""
    cache = _FINE.setdefault(index_dir, {})
    missing = sorted(g for g in groups if g not in cache)
    if missing:
        rows = (
            spark.read.parquet(M.table_path(index_dir, "fine"))
            .where(F.col("group").isin(missing))
            .collect()
        )
        for g in missing:
            cache[g] = []
        for r in rows:
            cache[int(r.group)].append(
                (int(r.cell), np.asarray(r.c_emb, dtype=np.float64))
            )
        for g in missing:
            cache[g].sort(key=lambda ce: ce[0])
    return {g: cache.get(g, []) for g in groups}


def _read_coarse(spark: SparkSession, index_dir: str):
    cached = _COARSE.get(index_dir)
    if cached is not None:
        return cached
    _check_layout(index_dir)  # every two-level reader passes here
    rows = spark.read.parquet(M.table_path(index_dir, "coarse")).collect()
    rows.sort(key=lambda r: r.group)
    groups = [int(r.group) for r in rows]
    mat = np.array([r.g_emb for r in rows], dtype=np.float64)
    _COARSE[index_dir] = (groups, mat)
    return groups, mat


def _probe_cells_2level(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
) -> list[tuple[int, int, int]]:
    """(q_id, group, cell) probe triples for the sharded quantizer:
    coarse-probe the live groups (driver, n_groups cosines per query),
    fetch ONLY the probed groups' fine-centroid shards (partition-pruned
    ``fine/`` read), then rank each query's candidate cells within its
    own probed groups — n_groups + n_probe_groups*(n_cells/n_groups)
    cosines per query, never n_cells. Shared by the IVF-Flat and IVF-PQ
    readers so both arms probe identically (same rounded-6 cosine +
    (sim desc, cell asc) tie-break as the single-level _probe_cells)."""
    groups, g_mat = _read_coarse(spark, index_dir)
    q_groups: dict[int, list[int]] = {}
    for q_id, vec in queries:
        sims = _rounded_cosines(np.asarray(vec, dtype=np.float64), g_mat)
        ranked = sorted(zip(groups, sims), key=lambda gs: (-gs[1], gs[0]))
        q_groups[q_id] = [g for g, _ in ranked[:n_probe_groups]]
    probed_groups = sorted({g for gs in q_groups.values() for g in gs})

    by_group = _fine_shards(spark, index_dir, probed_groups)
    probes = []  # (q_id, group, cell)
    for q_id, vec in queries:
        cand = [
            (g, c, emb)
            for g in q_groups[q_id]
            for c, emb in by_group.get(g, [])
        ]
        if not cand:
            continue
        mat = np.array([emb for _, _, emb in cand], dtype=np.float64)
        sims = _rounded_cosines(np.asarray(vec, dtype=np.float64), mat)
        ranked = sorted(
            zip((g for g, _, _ in cand), (c for _, c, _ in cand), sims),
            key=lambda gcs: (-gcs[2], gcs[1]),
        )
        probes.extend((q_id, g, c) for g, c, _ in ranked[:n_probe])
    return probes


def ann_index_2level_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """Two-level IVF search from the artifact: coarse-probe the live
    groups (driver, n_groups cosines), fetch ONLY the probed groups'
    fine-centroid shards (partition-pruned ``fine/`` read), rank each
    query's candidate cells within its own probed groups, then exact
    cosine inside the probed (group, cell) raw partitions. Output
    contract matches similarity.ivf_topk: (q_id, vec_id, sim, rank).
    Per query the quantizer work is n_groups + n_probe_groups *
    n_cells/n_groups cosines — never n_cells — which is what lets the
    cell count keep the constant-volume rule uncapped."""
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    probes_df = spark.createDataFrame(probes, "q_id long, group long, cell long")
    cells = sorted({c for _, _, c in probes})
    raw = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "raw")).where(
            F.col("group").isin(sorted({g for _, g, _ in probes}))
            & F.col("cell").isin(cells)
        ),
    )
    scored = (
        raw.join(F.broadcast(probes_df), ["group", "cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            S.cosine_batch(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_per_key(
        scored, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def ann_index_2level_truncated_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    dims: int = S.MRL_DIMS,
    shortlist: int = S.MRL_SHORTLIST,
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """Adaptive retrieval on the sharded-quantizer layout — the same
    composition :func:`ann_index_truncated_topk` makes on the
    single-level artifact, so the dimension ladder exists on BOTH
    layouts like every other arm (flat/PQ/residual/SQ8): two-level
    probe prunes the (group, cell) partitions read, the matryoshka
    slice prunes the shortlist arithmetic to dims/DIM, and the exact
    full-dimension rerank re-scores only ≤ queries × shortlist
    survivors from the same pruned partitions. ``sim`` is the exact
    full-dim cosine; shortlist ≥ probed volume reproduces the flat
    2-level reader bit-for-bit (pinned in tests). Zero-prefix rows are
    dropped from the shortlist stage on both sides, exactly like
    :func:`ann_index_truncated_topk` (NaN-pollution guard)."""
    queries = _nonzero_prefix_queries(queries, dims)
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    probes_df = spark.createDataFrame(
        probes, "q_id long, group long, cell long"
    )
    qdf = _queries_df(spark, queries)
    q_sliced = qdf.select("q_id", F.slice("q_emb", 1, dims).alias("q_emb"))
    raw = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "raw")).where(
            F.col("group").isin(sorted({g for _, g, _ in probes}))
            & F.col("cell").isin(sorted({c for _, _, c in probes}))
        ),
    )
    tscored = (
        raw.join(F.broadcast(probes_df), ["group", "cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .filter(_nonzero_prefix_col(dims))
        .join(F.broadcast(q_sliced), "q_id")
        .select(
            "q_id",
            "vec_id",
            S.cosine_batch(
                F.col("q_emb"), F.slice("embedding", 1, dims)
            ).alias("tsim"),
        )
    )
    short = S.topk_per_key(
        tscored, "q_id", [F.col("tsim").desc(), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")
    rescored = (
        raw.select("vec_id", "embedding")
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qdf), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        rescored, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def _adc_lut_flat_residual_2level(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    probes: list[tuple[int, int, int]],
) -> DataFrame:
    """(q_id, group, cell, d_flat) — the residual LUT for the 2-level
    PQ arm: each probed (query, group, cell) triple scores the query's
    residual AGAINST THAT FINE CENTROID over the residual codebook.
    The fine components come from a partition-pruned ``fine/`` read of
    just the probed groups (the probe pass reads the same shards)."""
    ic = _load_codebook(spark, index_dir)
    n_sub, n_cells, sub_dim = ic.shape
    probed_groups = sorted({g for _, g, _ in probes})
    probed_cells = {c for _, _, c in probes}
    by_group = _fine_shards(spark, index_dir, probed_groups)
    icent_by_cell = {
        c: _int_centroids(emb[None, :])[0]
        for g in probed_groups
        for c, emb in by_group[g]
        if c in probed_cells
    }
    qvec = {q_id: vec for q_id, vec in queries}
    rows = []
    for q_id, g, cell in probes:
        iq = (
            S._half_up(
                np.asarray(qvec[q_id], dtype=np.float64) * S.PQ_INT_SCALE
            )
            - icent_by_cell[cell]
        )
        flat: list[int] = []
        for s in range(n_sub):
            qs = iq[s * sub_dim : (s + 1) * sub_dim]
            d = ((ic[s] - qs) ** 2).sum(axis=1)
            flat.extend(int(d[c]) for c in range(n_cells))
        rows.append((int(q_id), int(g), int(cell), flat))
    return spark.createDataFrame(
        rows, "q_id long, group long, cell long, d_flat array<long>"
    )


def ann_index_2level_ivfpq_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """IVF-PQ search over the sharded-quantizer layout — the
    billion-vector arm the two-level index exists for: probe selection
    is the shared two-level term (n_groups + n_probe_groups *
    n_cells/n_groups cosines per query), and the corpus is touched ONLY
    through the (group, cell)-pruned ``vectors/`` PQ codes — log2(PQ_K)
    bits per subspace per vector instead of full raw floats, the ~100x
    probed-IO cut at scale. Scoring is the exact single-level ADC math
    (broadcast integer LUT from the shared ``codebook/`` table, sum of
    per-subspace squared distances, vec_id tie-break), so the output
    contract matches :func:`ann_index_ivfpq_topk`: (q_id, vec_id,
    adc_dist, rank)."""
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    probes_df = spark.createDataFrame(probes, "q_id long, group long, cell long")
    residual = M.read_meta(index_dir, _RESIDUAL_KEY, False)
    lut_df = (
        _adc_lut_flat_residual_2level(spark, index_dir, queries, probes)
        if residual
        else _adc_lut_flat(spark, index_dir, queries)
    )

    vectors = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "vectors")).where(
            F.col("group").isin(sorted({g for _, g, _ in probes}))
            & F.col("cell").isin(sorted({c for _, _, c in probes}))
        ),
    )
    scored = (
        vectors.join(F.broadcast(probes_df), ["group", "cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(
            F.broadcast(lut_df),
            ["q_id", "group", "cell"] if residual else ["q_id"],
        )
        .select("q_id", "vec_id", _adc_dist_col(
            _load_codebook(spark, index_dir).shape[1]
        ).alias("adc_dist"))
    )
    return S.topk_per_key(
        scored, "q_id", [F.col("adc_dist"), F.col("vec_id")], k
    )


# --------------------------------------------------------------------------
# Two-stage search: ADC shortlist + exact rerank — the standard
# production composition (a PQ scan alone trades recall for IO; the
# rerank buys exactness back for shortlist x 256 B of targeted raw
# reads). Both layouts share the shape: probe -> integer-ADC-score the
# probed cells' CODES -> keep the top `shortlist` per query -> fetch
# ONLY those vectors' raw embeddings (broadcast semijoin against the
# already-pruned raw partitions) -> exact rounded cosine -> top-k.
# With shortlist >= the probed population the result equals the
# IVF-Flat reader exactly (test-pinned), which is the semantics anchor.


def ann_index_ivfpq_rerank_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """ADC-shortlist + exact-rerank over the single-level artifact:
    scan codes for the probed cells (partition-pruned, 2 bytes/vector),
    rank by the broadcast integer LUT, keep ``shortlist`` candidates
    per query (ties to lower vec_id — the ivfpq contract), then exact
    cosine ONLY on those candidates' raw rows. Output contract matches
    ann_index_ivf_topk: (q_id, vec_id, sim, rank)."""
    shortlist = 4 * k if shortlist is None else shortlist
    cells, mat = _read_centroids(spark, index_dir)
    probes = _probe_cells(queries, cells, mat, n_probe)
    probes_df = spark.createDataFrame(probes, _PROBE_SCHEMA)
    residual = M.read_meta(index_dir, _RESIDUAL_KEY, False)
    lut_df = (
        _adc_lut_flat_residual(spark, index_dir, queries, probes)
        if residual
        else _adc_lut_flat(spark, index_dir, queries)
    )

    vectors = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "vectors")).where(
            _cell_predicate(probes)
        ),
    )
    scored = (
        vectors.join(F.broadcast(probes_df), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(
            F.broadcast(lut_df),
            ["q_id", "cell"] if residual else ["q_id"],
        )
        .select("q_id", "vec_id", _adc_dist_col(
            _load_codebook(spark, index_dir).shape[1]
        ).alias("adc_dist"))
    )
    short = S.topk_per_key(
        scored, "q_id", [F.col("adc_dist"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")

    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(
        _cell_predicate(probes)
    )
    reranked = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def ann_index_2level_ivfpq_rerank_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """The two-stage search over the sharded-quantizer layout — at
    billion-vector scale this is THE search: probed-cell IO is 2-byte
    codes (the 2-level PQ arm), plus ``shortlist`` targeted raw rows
    per query for the exact rerank. Output contract matches
    ann_index_2level_topk: (q_id, vec_id, sim, rank)."""
    shortlist = 4 * k if shortlist is None else shortlist
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    probes_df = spark.createDataFrame(probes, "q_id long, group long, cell long")
    residual = M.read_meta(index_dir, _RESIDUAL_KEY, False)
    lut_df = (
        _adc_lut_flat_residual_2level(spark, index_dir, queries, probes)
        if residual
        else _adc_lut_flat(spark, index_dir, queries)
    )
    g_pred = F.col("group").isin(sorted({g for _, g, _ in probes}))
    c_pred = F.col("cell").isin(sorted({c for _, _, c in probes}))

    vectors = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, "vectors")).where(
            g_pred & c_pred
        ),
    )
    scored = (
        vectors.join(F.broadcast(probes_df), ["group", "cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(
            F.broadcast(lut_df),
            ["q_id", "group", "cell"] if residual else ["q_id"],
        )
        .select("q_id", "vec_id", _adc_dist_col(
            _load_codebook(spark, index_dir).shape[1]
        ).alias("adc_dist"))
    )
    short = S.topk_per_key(
        scored, "q_id", [F.col("adc_dist"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")

    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(
        g_pred & c_pred
    )
    reranked = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def ann_index_2level_sq8_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
    dims: int | None = None,
) -> DataFrame:
    """SQ8 two-stage search over the sharded-quantizer layout: the
    (group, cell)-pruned scan reads the int8 codes (~64 B/vector — 4x
    under raw, 32x over the 2-byte PQ arm but at ~3.5x the delivered
    shortlist recall on the fixture), shortlist by exact-integer
    code-space L2 against the closure-held query-code matrix, exact
    cosine rerank on the shortlist's raw rows. Output contract matches
    ann_index_2level_topk: (q_id, vec_id, sim, rank). ``dims`` slices
    the code-space stage to the leading codes exactly like the
    single-level reader (the ladders compose on both layouts), and a
    materialized prefix arm at width ≥ dims is scanned when present —
    same scan-side byte cut, same bit-identity."""
    if not M.read_meta(index_dir, _SQ8_KEY, False):
        raise ValueError(
            f"no SQ8 arm at {index_dir}: run add_sq8_to_ann_index first"
        )
    shortlist = 4 * k if shortlist is None else shortlist
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    vmin, scale = _read_sq_stats(spark, index_dir)
    q_mat = np.vstack(
        [_sq8_encode_np(vec, vmin, scale) for _, vec in queries]
    )
    if dims is not None:
        q_mat = q_mat[:, :dims]
    q_pos = {int(q): i for i, (q, _) in enumerate(queries)}
    probes_df = spark.createDataFrame(
        [(q, q_pos[q], g, c) for q, g, c in probes],
        "q_id long, q_idx int, group long, cell long",
    )
    g_pred = F.col("group").isin(sorted({g for _, g, _ in probes}))
    c_pred = F.col("cell").isin(sorted({c for _, _, c in probes}))

    scan_table, needs_slice = _sq8_scan_table(index_dir, dims)
    sq8 = _live(
        spark,
        index_dir,
        spark.read.parquet(M.table_path(index_dir, scan_table)).where(
            g_pred & c_pred
        ),
    )
    code_col = (
        F.slice("codes", 1, dims) if needs_slice else F.col("codes")
    )
    scored = (
        sq8.withColumn("dists", _sq8_dists_udf(q_mat)(code_col))
        .join(F.broadcast(probes_df), ["group", "cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.element_at("dists", F.col("q_idx") + 1).alias("sq_dist"),
        )
    )
    short = S.topk_per_key(
        scored, "q_id", [F.col("sq_dist"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")

    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(
        g_pred & c_pred
    )
    reranked = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


def ann_index_2level_binary_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[Query],
    k: int = 5,
    shortlist: int | None = None,
    n_probe_groups: int = N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
) -> DataFrame:
    """Binary two-stage search over the sharded-quantizer layout: the
    (group, cell)-pruned scan reads the packed sign bits (~dims/8 B
    per vector), the Hamming shortlist runs entirely in whole-stage
    codegen against the broadcast query words, and the exact cosine
    rerank reads only the shortlist's raw rows. Output contract
    matches ann_index_2level_topk: (q_id, vec_id, sim, rank)."""
    if not M.read_meta(index_dir, _BINARY_KEY, False):
        raise ValueError(
            f"no binary arm at {index_dir}: run add_binary_to_ann_index"
            " first"
        )
    shortlist = 4 * k if shortlist is None else shortlist
    probes = _probe_cells_2level(
        spark, index_dir, queries, n_probe_groups, n_probe
    )
    thresh = _read_bin_thresh(spark, index_dir)
    q_words = {
        int(q): _binary_encode_np(vec, thresh) for q, vec in queries
    }
    g_pred = F.col("group").isin(sorted({g for _, g, _ in probes}))
    c_pred = F.col("cell").isin(sorted({c for _, _, c in probes}))
    scored = _binary_scored(
        spark,
        index_dir,
        [(q, g, c, q_words[q]) for q, g, c in probes],
        "q_id long, group long, cell long, q_words array<long>",
        ["group", "cell"],
        g_pred & c_pred,
    )
    short = S.topk_per_key(
        scored, "q_id", [F.col("ham"), F.col("vec_id")], shortlist
    ).select("q_id", "vec_id")

    raw = spark.read.parquet(M.table_path(index_dir, "raw")).where(
        g_pred & c_pred
    )
    reranked = (
        raw.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(_queries_df(spark, queries)), "q_id")
        .select(
            "q_id",
            "vec_id",
            # bounded rerank (≤ queries × shortlist rows): JVM cosine +
            # single-window top-k — no Arrow boundary, one less exchange
            S.cosine_rounded(F.col("q_emb"), F.col("embedding")).alias("sim"),
        )
    )
    return S.topk_bounded(
        reranked, "q_id", [F.col("sim").desc(), F.col("vec_id")], k
    )


# --------------------------------------------------------------------------
# Distributed 2-level build — the path past the AUTO_MAX_CELLS_2L clamp.
# The driver-side build (build_ann_index_2level) collects the quantizer
# pool and broadcasts every fine centroid into the assignment UDF: fine
# to ~1M cells, a wall at the 16.7M-cell shapes the (group, cell) layout
# itself supports. This build keeps the fine quantizer DISTRIBUTED end
# to end — only the ``n_groups`` coarse rows (<= AUTO_MAX_CELLS ~ 2 MB)
# ever reach the driver or an executor closure:
#
# - gmap (cell -> group) is a map-side pandas UDF over the fine pool
#   with the coarse matrix broadcast — n_cells x n_groups cosines as a
#   distributed pass instead of a driver matmul;
# - corpus assignment is two stages: nearest LIVE group (map-side, tiny
#   broadcast), then nearest cell WITHIN the group via a cogrouped
#   per-group matmul against the fine shard table — each group's
#   centroids stream through the cogroup (n_cells/n_groups rows), never
#   a full-quantizer broadcast. One extra corpus shuffle (by group) is
#   the price; for a one-time build at the scales that need it, the
#   right trade.
#
# Same rounded-6 cosine / first-maximum / positional-pool conventions as
# the driver build, so the artifacts are search-identical (test-pinned,
# and the registered query's oracle is the SAME _ANN_2LEVEL_SQL).


def _nearest_group_udf(g_ids: np.ndarray, g_mat: np.ndarray):
    """Map-side nearest-group assignment (rounded cosine, ties to the
    lower group id via first-maximum over ids sorted ascending) — the
    coarse stage of the composed assignment, alone."""
    ids = np.asarray(g_ids, dtype="int64")
    assert list(ids) == sorted(ids)
    g = g_mat.astype(np.float64)
    g_norm = np.sqrt(np.einsum("ij,ij->i", g, g))

    @F.pandas_udf(T.LongType())
    def nearest(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        x = np.vstack(col.to_numpy()).astype(np.float64)
        x_norm = np.sqrt(np.einsum("ij,ij->i", x, x))
        sims = np.round((x @ g.T) / (x_norm[:, None] * g_norm[None, :]), 6)
        return pd.Series(ids[np.argmax(sims, axis=1)])

    return nearest


_ASSIGNED_SCHEMA = "vec_id long, group long, cell long"
_ASSIGNED_CODES_SCHEMA = (
    "vec_id long, group long, cell long, codes array<int>"
)


def _assign_encode_in_group(rcb: np.ndarray):
    """Cogroup kernel factory for the distributed RESIDUAL build: one
    group's corpus rows x its fine shard — the same rounded-cosine
    argmax as _assign_cells_in_group, PLUS the residual-PQ encode
    against the selected cell's centroid (whose components the shard
    carries — the fine quantizer never leaves the executors). Returns
    (vec_id, group, cell, codes)."""
    m, _k, sub = rcb.shape

    def kern(key, left: pd.DataFrame, right: pd.DataFrame):
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "group": pd.Series(dtype="int64"),
                    "cell": pd.Series(dtype="int64"),
                    "codes": pd.Series(dtype=object),
                }
            )
        order = np.argsort(right["cell"].to_numpy(), kind="stable")
        cells = right["cell"].to_numpy()[order]
        c = np.vstack(right["c_emb"].to_numpy()[order]).astype(np.float64)
        x = np.vstack(left["embedding"].to_numpy()).astype(np.float64)
        xn = np.sqrt(np.einsum("ij,ij->i", x, x))
        cn = np.sqrt(np.einsum("ij,ij->i", c, c))
        sims = np.round((x @ c.T) / (xn[:, None] * cn[None, :]), 6)
        sel = np.argmax(sims, axis=1)
        icent = S._half_up(c * S.PQ_INT_SCALE)
        ir = S._half_up(x * S.PQ_INT_SCALE) - icent[sel]
        codes = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            qs = ir[:, s * sub : (s + 1) * sub]
            d = ((qs[:, None, :] - rcb[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d, axis=1)
        return pd.DataFrame(
            {
                "vec_id": left["vec_id"].to_numpy(),
                "group": np.full(len(left), int(key[0]), dtype="int64"),
                "cell": cells[sel],
                "codes": [row.tolist() for row in codes],
            }
        )

    return kern


def _assign_cells_in_group(key, left: pd.DataFrame, right: pd.DataFrame):
    """Cogroup kernel: one group's corpus rows x that group's fine
    shard — ONE rounded-cosine matmul, first-maximum over cells sorted
    ascending (the nearest_cell_2level_udf tie-break). Returns IDS ONLY
    (vec_id, group, cell): carrying the embedding back out of the
    cogroup doubled the Arrow payload (full float arrays serialized
    both ways), measured as the dominant cost of the distributed build
    at 8M — the caller re-attaches embeddings from the corpus with one
    JVM-side join keyed by vec_id instead."""
    if left.empty or right.empty:
        return pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "group": pd.Series(dtype="int64"),
                "cell": pd.Series(dtype="int64"),
            }
        )
    order = np.argsort(right["cell"].to_numpy(), kind="stable")
    cells = right["cell"].to_numpy()[order]
    c = np.vstack(right["c_emb"].to_numpy()[order]).astype(np.float64)
    x = np.vstack(left["embedding"].to_numpy()).astype(np.float64)
    xn = np.sqrt(np.einsum("ij,ij->i", x, x))
    cn = np.sqrt(np.einsum("ij,ij->i", c, c))
    sims = np.round((x @ c.T) / (xn[:, None] * cn[None, :]), 6)
    sel = np.argmax(sims, axis=1)
    return pd.DataFrame(
        {
            "vec_id": left["vec_id"].to_numpy(),
            "group": np.full(len(left), int(key[0]), dtype="int64"),
            "cell": cells[sel],
        }
    )


def build_ann_index_2level_distributed(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    n_groups: int | None = N_GROUPS_2L,
    n_cells: int | None = N_CELLS_2L,
    refine_iters: int = 0,
    train_fraction: float | None = None,
    residual: bool | str = "auto",
) -> None:
    """:func:`build_ann_index_2level` with the fine quantizer kept
    distributed (module comment above) — artifacts are search-identical
    to the driver-side build; use this past ~1M fine cells, where the
    driver-side pool collect and full-quantizer UDF closure stop being
    feasible. ``residual="auto"`` (the default, same contract as the
    driver builds) measures the variance-ratio diagnostic WITHOUT
    collecting the fine quantizer: a deterministic corpus sample takes
    the same cogrouped assignment and joins its fine centroid back
    JVM-side (:func:`_distributed_variance_ratio`). The pool-position window runs over quantizer-scale rows
    only (<= n_cells), never the corpus. ``refine_iters > 0`` trains
    both quantizer levels with Lloyd's k-means
    (:func:`_refined_quantizers_2level` — the fine level's training is
    itself distributed: group-equi-join assignment rounds, never a
    driver-side quantizer), then lands the corpus through the same
    cogrouped assignment tail as the prefix path."""
    from pyspark.sql import Window

    if n_groups is None or n_cells is None:
        auto_g, auto_c = auto_quantizer_shape(emb.count())
        n_groups = auto_g if n_groups is None else n_groups
        n_cells = auto_c if n_cells is None else n_cells
    _COARSE.pop(index_dir, None)
    _FINE.pop(index_dir, None)
    _CODEBOOKS.pop(index_dir, None)
    _SQ_STATS.pop(index_dir, None)
    _stamp_layout(index_dir)
    # the residual flag is stamped by _assign_and_land_2level_distributed
    # AFTER the assignment machinery exists (residual="auto" decides
    # from a sampled assignment)
    # a rebuild orphans any derived SQ8 arm (grid trained on the old
    # corpus) — drop the flag so readers fail loudly until re-added
    M.write_meta(index_dir, _SQ8_KEY, False)
    M.write_meta(index_dir, _SQ8_PREFIX_DIMS_KEY, None)
    # ... and any derived binary arm (thresholds trained on the old
    # corpus) — same fail-loudly contract
    _BIN_THRESH.pop(index_dir, None)
    M.write_meta(index_dir, _BINARY_KEY, False)

    if refine_iters > 0:
        trained, g_mat, fine_df = _refined_quantizers_2level(
            spark, emb, n_groups, n_cells, refine_iters, train_fraction
        )
        # coarse stores ALL trained groups (probe parity with the twin);
        # assignment ranks over the cell-owning subset — a memberless
        # group never wins a corpus argmax, so winners are unchanged
        # (same reasoning as the driver build's refined branch)
        _write_coarse_refined(spark, index_dir, trained, g_mat)
        (
            fine_df.repartition("group")
            .write.mode("overwrite")
            .partitionBy("group")
            .parquet(M.table_path(index_dir, "fine"))
        )
        owning = sorted(
            int(r.group)
            for r in fine_df.select("group").distinct().collect()
        )
        _assign_and_land_2level_distributed(
            spark,
            emb,
            index_dir,
            owning,
            g_mat[np.array([trained.index(g) for g in owning])],
            residual,
        )
        return

    pool = (
        emb.filter(F.col("vec_id") < max(n_groups, n_cells))
        .select("vec_id", "embedding")
        .withColumn(
            "pos", F.row_number().over(Window.orderBy("vec_id")) - 1
        )
        .persist()
    )
    try:
        pool_n = pool.count()
        # sparse-prefix clamp — the driver build's len(mat) semantics
        n_groups = min(n_groups, pool_n)
        n_cells = min(n_cells, pool_n)

        g_rows = pool.filter(F.col("pos") < n_groups).collect()  # tiny
        g_rows.sort(key=lambda r: r.pos)
        g_mat_all = np.array([r.embedding for r in g_rows], dtype=np.float64)

        # distributed gmap: every fine centroid -> nearest group over
        # ALL groups (the _group_of_cells matmul as a map-side pass)
        nearest_any = _nearest_group_udf(
            np.arange(n_groups, dtype="int64"), g_mat_all
        )
        fine = (
            pool.filter(F.col("pos") < n_cells)
            .select(
                F.col("pos").alias("cell"),
                nearest_any(F.col("embedding")).alias("group"),
                F.col("embedding").cast("array<float>").alias("c_emb"),
            )
            .persist()
        )
        live = sorted(
            int(r.group) for r in fine.select("group").distinct().collect()
        )
        coarse_df = spark.createDataFrame(
            [(g, [float(x) for x in g_mat_all[g]]) for g in live],
            T.StructType(
                [
                    T.StructField("group", T.LongType()),
                    T.StructField("g_emb", T.ArrayType(T.FloatType())),
                ]
            ),
        )
        coarse_df.coalesce(1).write.mode("overwrite").parquet(
            M.table_path(index_dir, "coarse")
        )
        (
            fine.select("cell", "group", "c_emb")
            .repartition("group")
            .write.mode("overwrite")
            .partitionBy("group")
            .parquet(M.table_path(index_dir, "fine"))
        )
        fine.unpersist()
        _assign_and_land_2level_distributed(
            spark, emb, index_dir, live, g_mat_all[np.array(live)], residual
        )
    finally:
        pool.unpersist()


def _distributed_variance_ratio(
    spark: SparkSession, with_group: DataFrame, fine_shards: DataFrame
) -> float:
    """The residual="auto" diagnostic for the DISTRIBUTED build — the
    same intra-cell / global variance ratio as
    :func:`_assignment_variance_ratio`, computed without ever
    collecting the fine quantizer: a deterministic hash sample of the
    corpus takes the same cogrouped per-group assignment, re-attaches
    its embedding and its fine centroid JVM-side (sample-sized joins;
    the centroid join key is the metadata-sized fine table), and emits
    one metadata-sized partial per partition."""
    sample = with_group.filter(
        (F.pmod(F.abs(F.hash("vec_id")), F.lit(_VAR_SAMPLE_MOD)) == 0)
        | (F.col("vec_id") < _VAR_SAMPLE_PREFIX)
    )
    s_ids = (
        sample.groupBy("group")
        .cogroup(fine_shards.groupBy("group"))
        .applyInPandas(_assign_cells_in_group, _ASSIGNED_SCHEMA)
    )
    joined = (
        s_ids.join(sample.select("vec_id", "embedding"), "vec_id")
        .join(
            fine_shards.select("group", "cell", "c_emb"),
            ["group", "cell"],
        )
        .select("embedding", "c_emb")
    )

    def xc(pdf):
        x = np.vstack(pdf["embedding"].map(np.asarray).to_numpy()).astype(
            np.float64
        )
        c = np.vstack(pdf["c_emb"].map(np.asarray).to_numpy()).astype(
            np.float64
        )
        return x, c

    return _ratio_from_partials(_variance_partials(joined, xc))


def _assign_and_land_2level_distributed(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    live: list[int],
    g_live_mat: np.ndarray,
    residual: bool | str = False,
) -> None:
    """The distributed builds' shared corpus-assignment tail: nearest
    LIVE group map-side (tiny broadcast), nearest cell WITHIN the group
    via the cogrouped per-group matmul against the just-written fine
    shards, then land raw/ + vectors/. The cogroup emits IDS ONLY
    (vec_id, group, cell) — embeddings re-attach from the corpus with
    one JVM-side shuffle join keyed by vec_id, which is cheaper than
    Arrow-serializing every float array back OUT of the Python worker
    (the r10 rehearsal measured the two-way Arrow payload as the
    distributed build's dominant term). ``residual`` resolves here
    ("auto" via the sampled distributed diagnostic) and the choice is
    stamped in the manifest like the driver builds'."""
    nearest_live = _nearest_group_udf(
        np.array(live, dtype="int64"), g_live_mat
    )
    with_group = emb.select(
        "vec_id",
        "embedding",
        nearest_live(F.col("embedding")).alias("group"),
    )
    # the partition column reads back as int — cast to long so the
    # cogroup keys match with_group's UDF-typed long (mismatched key
    # types silently cogroup as disjoint keys and drop rows)
    fine_shards = spark.read.parquet(
        M.table_path(index_dir, "fine")
    ).select(
        F.col("group").cast("long").alias("group"),
        F.col("cell").cast("long").alias("cell"),
        "c_emb",
    )
    if residual == "auto":
        ratio = _distributed_variance_ratio(spark, with_group, fine_shards)
        residual = ratio < RESIDUAL_AUTO_RATIO
        M.write_meta(
            index_dir,
            _RESIDUAL_MODE_KEY,
            {
                "mode": "auto",
                "variance_ratio": round(float(ratio), 4),
                "chosen_residual": bool(residual),
            },
        )
    else:
        residual = bool(residual)
        M.write_meta(
            index_dir,
            _RESIDUAL_MODE_KEY,
            {
                "mode": "explicit",
                "variance_ratio": None,
                "chosen_residual": residual,
            },
        )
    M.write_meta(index_dir, _RESIDUAL_KEY, bool(residual))
    if residual:
        # the residual arm, fully distributed: the codebook derives
        # from the PQ_K prefix pushed through the SAME two-stage
        # assignment (metadata-sized collects only), then ONE cogroup
        # assigns AND residual-encodes every row — each group's fine
        # shard supplies the centroid components in-kernel, so the
        # quantizer still never leaves the executors.
        from collections import namedtuple

        prefix = emb.filter(F.col("vec_id") < S.PQ_K)
        pref_group = prefix.select(
            "vec_id",
            "embedding",
            nearest_live(F.col("embedding")).alias("group"),
        )
        pref_ids = (
            pref_group.groupBy("group")
            .cogroup(fine_shards.groupBy("group"))
            .applyInPandas(_assign_cells_in_group, _ASSIGNED_SCHEMA)
            .collect()
        )
        pref_emb = {
            int(r.vec_id): list(r.embedding) for r in prefix.collect()
        }
        probed = sorted({int(r.group) for r in pref_ids})
        frows = fine_shards.where(F.col("group").isin(probed)).collect()
        icent_by_cell = {
            int(r.cell): _int_centroids(
                np.asarray(r.c_emb, dtype=np.float64)[None, :]
            )[0]
            for r in frows
        }
        Head = namedtuple("Head", "vec_id embedding cell")
        head = [
            Head(int(r.vec_id), pref_emb[int(r.vec_id)], int(r.cell))
            for r in pref_ids
        ]
        rcb = _residual_codebook_from_rows(head, icent_by_cell)
        _write_residual_codebook(spark, index_dir, rcb)
        assigned_codes = (
            with_group.groupBy("group")
            .cogroup(fine_shards.groupBy("group"))
            .applyInPandas(
                _assign_encode_in_group(rcb), _ASSIGNED_CODES_SCHEMA
            )
            .persist()
        )
        try:
            (
                assigned_codes.repartition("group", "cell")
                .write.mode("overwrite")
                .partitionBy("group", "cell")
                .parquet(M.table_path(index_dir, "vectors"))
            )
            (
                assigned_codes.select("vec_id", "group", "cell")
                .join(emb.select("vec_id", "embedding"), "vec_id")
                .select("vec_id", "embedding", "group", "cell")
                .repartition("group", "cell")
                .write.mode("overwrite")
                .partitionBy("group", "cell")
                .parquet(M.table_path(index_dir, "raw"))
            )
        finally:
            assigned_codes.unpersist()
        return

    assigned_ids = (
        with_group.groupBy("group")
        .cogroup(fine_shards.groupBy("group"))
        .applyInPandas(_assign_cells_in_group, _ASSIGNED_SCHEMA)
    )
    assigned = assigned_ids.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select("vec_id", "embedding", "group", "cell")
    # choice already resolved and stamped above — the landing must not
    # re-write the manifest record (a failure mid-landing would
    # otherwise leave a wrong mode="explicit" stamp)
    _land_2level_corpus(
        spark, index_dir, emb, assigned, residual=False, stamp_residual=False
    )
