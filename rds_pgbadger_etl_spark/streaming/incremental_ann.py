"""Incremental ANN ingestion: flag each arriving micro-batch of
embeddings against everything indexed before it, then admit the batch
into the persisted ANN index — the ANN sibling of
streaming/incremental_dedup.py, on the same one-artifact principle:
the index a stream builds is the exact artifact the batch verbs service
(``ann_index_*_topk`` search, ``delete_from_ann_index``,
``compact_ann_index``, ``ann_index_stats``), and a corpus bootstrapped
with ``build_ann_index`` can be continued by a stream with no
migration.

Per micro-batch (foreachBatch):

- FIRST batch bootstraps the index (``build_ann_index`` — the coarse
  quantizer and PQ codebook train on it and are immutable afterwards:
  the IVF-PQ invariant that keeps append O(new) and all codes
  comparable), emitting no flags (nothing indexed yet);
- later batches are flagged against the STORE — per new vector, probe
  the ``n_probe`` nearest cells (batch × centroids, centroid side
  broadcast — metadata-sized), scan ONLY those cells of the
  cell-partitioned ``raw`` table (partition-pruned, tombstone-filtered),
  then score via the cogrouped per-cell matmul
  (similarity.knn_join_cells — each side's rows shuffle once, dense
  linear algebra inside the cell) and keep the top-k per new vector —
  then admitted via ``append_to_ann_index`` (encoded against the
  stored quantizers, appended into the cell partitions, nothing
  rewritten);
- exactly-once per batch via the streaming checkpoint.

Scale: flagging is O(batch × probed-cell volume) FLOPs — the same
pruning ratio as a search (~n_probe/n_centroids of the corpus per
batch), never batch × corpus — executed as one matmul per cell, with
shuffle bytes O(batch + probed cells), not O(batch × cell volume). At
a fixed quantizer this cost still grows with the corpus (cells fatten);
production holds it constant by scaling n_centroids ~ √corpus, which
changes only the stored centroid table. State grows in the index's
partitioned layout, compacted on the operator's schedule.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rds_pgbadger_etl_spark.operators import ann_index as AI
from rds_pgbadger_etl_spark.operators import index_maintenance as M
from rds_pgbadger_etl_spark.operators import similarity as S

_FLAG_SCHEMA = "vec_id long, neighbor_id long, cosine double, rank int"

# Probe-selection metadata of a flag verb — the distinct probed cell
# set (single-level) / (group, cell) pair set (two-level) — is a pure
# function of (quantizer tables, batch, probe widths): cached per that
# fingerprint so a repeated flag of the same batch against an unchanged
# store (the registered batch verbs re-evaluated; re-run analyst
# flagging) skips its driver-side distinct+collect job — the
# dedup_index._LOOKUP_META discipline applied to the ANN probe. The
# key embeds the quantizer tables' data-file lists (a rebuild/retrain
# rewrites them → new names → the entry self-invalidates; appends
# never touch quantizers, so entries correctly survive them) plus the
# batch plan's semanticHash AND leaf input files (a re-read of a
# mutated external path must miss — semanticHash covers only the
# logical plan). Only metadata lists are cached, never rows; bounded
# per store like _LOOKUP_META.
_PROBE_META: dict[tuple, list] = {}
_PROBE_META_PER_DIR = 8

# Plan-capture hook for the flag verbs: they return an EAGER
# localCheckpoint (mutation-safety — see flag_against_index), so a
# post-hoc .explain() shows only the checkpoint stub (Scan ExistingRDD).
# Profiling tools set this to a callable(df) and receive the REAL
# pre-checkpoint DataFrame right before materialization — the round-13
# flag-verb plan dumps were stubs for exactly this reason.
PRE_CHECKPOINT_PLAN_HOOK = None


def _batch_plan_files(df: DataFrame) -> tuple:
    try:
        return tuple(sorted(df.inputFiles()))
    except Exception:  # unlistable plan: never collide, never cache-hit
        return ("__unlistable__", object())


def _quantizer_fingerprint(index_dir: str, tables: tuple[str, ...]) -> tuple:
    snap = M.manifest_snapshot(index_dir)
    return tuple(
        (t, tuple(sorted(M.data_files(M.table_path_in(snap, index_dir, t)))))
        for t in tables
    )


def _remember_probe_meta(key: tuple, value: list) -> None:
    _PROBE_META[key] = value
    stale = [k for k in _PROBE_META if k[0] == key[0]]
    for k in stale[: -_PROBE_META_PER_DIR]:
        _PROBE_META.pop(k, None)


def _probe_cells_udf(cell_ids: list[int], cent_mat: np.ndarray, n_probe: int):
    """Map-only probe selection for the batch flag verbs: per Arrow
    batch, ONE matmul against the closure-held quantizer and a per-row
    (sim desc, cell asc) cut to the ``n_probe`` nearest cells — the
    nearest_cell_udf convention (the documented dense-numeric-kernel
    exception), generalized to top-n. Replaces the previous broadcast
    crossJoin + per-query window: same round-6 cosine, same tie-break,
    but the batch never shuffles and no window stage runs — probe
    selection becomes a projection over the stream."""
    ids = np.asarray(cell_ids, dtype=np.int64)
    c = cent_mat.astype(np.float64)
    cn = np.sqrt(np.einsum("ij,ij->i", c, c))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def topn(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(col.to_numpy()).astype(np.float64)
        xn = np.sqrt(np.einsum("ij,ij->i", x, x))
        sims = np.round((x @ c.T) / (xn[:, None] * cn[None, :]), 6)
        out = []
        for row in sims:
            order = np.lexsort((ids, -row))[:n_probe]
            out.append([int(ids[i]) for i in order])
        return pd.Series(out)

    return topn


def _probe_pairs_udf_2level(
    group_ids: list[int],
    g_mat: np.ndarray,
    fine_by_group: dict[int, list],
    n_probe_groups: int,
    n_probe: int,
):
    """Two-level twin of :func:`_probe_cells_udf`: per row, rank the
    coarse groups ((gsim desc, group asc), keep ``n_probe_groups``),
    then rank the candidate cells of exactly those groups
    ((sim desc, cell asc), keep ``n_probe``) — the same two-stage
    selection the previous crossJoin + two-window formulation computed,
    now one map-only kernel. The closure holds the same data the old
    plan BROADCAST (coarse table + fine shards), so the memory envelope
    is unchanged; past broadcast-sized fine quantizers the distributed
    build/assign path is the tool either way."""
    gids = np.asarray(group_ids, dtype=np.int64)
    g = g_mat.astype(np.float64)
    gn = np.sqrt(np.einsum("ij,ij->i", g, g))
    fine = {
        int(grp): (
            np.asarray([c for c, _ in rows], dtype=np.int64),
            np.asarray([e for _, e in rows], dtype=np.float64),
        )
        for grp, rows in fine_by_group.items()
        if rows
    }
    for grp, (cids, mat) in fine.items():
        fine[grp] = (cids, mat, np.sqrt(np.einsum("ij,ij->i", mat, mat)))

    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("group", T.LongType()),
                T.StructField("cell", T.LongType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def pairs(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(col.to_numpy()).astype(np.float64)
        xn = np.sqrt(np.einsum("ij,ij->i", x, x))
        gsims = np.round((x @ g.T) / (xn[:, None] * gn[None, :]), 6)
        out = []
        for i in range(len(x)):
            order = np.lexsort((gids, -gsims[i]))[:n_probe_groups]
            top_groups = [int(gids[j]) for j in order]
            cand_g: list[np.ndarray] = []
            cand_c: list[np.ndarray] = []
            sims: list[np.ndarray] = []
            for grp in top_groups:
                entry = fine.get(grp)
                if entry is None:
                    continue
                cids, mat, mn = entry
                s = np.round((mat @ x[i]) / (mn * xn[i]), 6)
                cand_g.append(np.full(len(cids), grp, dtype=np.int64))
                cand_c.append(cids)
                sims.append(s)
            if not sims:
                out.append([])
                continue
            cg = np.concatenate(cand_g)
            cc = np.concatenate(cand_c)
            ss = np.concatenate(sims)
            sel = np.lexsort((cc, -ss))[:n_probe]
            out.append(
                [{"group": int(cg[j]), "cell": int(cc[j])} for j in sel]
            )
        return pd.Series(out)

    return pairs


def ann_index_exists(index_dir: str) -> bool:
    """Whether the index has been bootstrapped (its centroid table is on
    disk) — the first-batch probe. (Local-FS check; an object-store
    deployment would swap in the Hadoop FileSystem API.)"""
    return os.path.isdir(M.table_path(index_dir, "centroids"))


def flag_against_index(
    spark: SparkSession,
    emb_batch: DataFrame,
    index_dir: str,
    k: int = 3,
    n_probe: int = S.N_PROBE,
    threshold: float | None = None,
) -> DataFrame:
    """(vec_id, neighbor_id, cosine, rank): the top-``k`` already-indexed
    neighbors of each new vector, searched the IVF way — semantic
    near-dup flagging at ingest (also the batch kNN-join entry point:
    plans/llm_ops.ann_knn_join runs corpus-slice query sets through it).
    Probing is MAP-ONLY — one matmul per Arrow batch against the cached
    metadata-sized quantizer (the nearest_cell_udf convention), so the
    batch never shuffles for probe selection; scoring cogroups the
    batch with a partition-pruned,
    tombstone-filtered scan of the probed cells only
    (similarity.knn_join_cells). Returns an eagerly local-checkpointed
    DataFrame:
    lineage is truncated, so the result (and any plan derived from it)
    is safe against subsequent index mutation — the append that follows
    in the ingestion cycle cannot leak into the flags."""
    cell_ids, cent_mat = AI._read_centroids(spark, index_dir)
    q = emb_batch.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # map-only probe selection (one matmul per Arrow batch against the
    # cached metadata-sized quantizer): the batch never shuffles and no
    # window stage runs — same (sim desc, cell asc) top-n as before
    topn = _probe_cells_udf(cell_ids, cent_mat, n_probe)
    probes = q.select(
        "q_id",
        "q_emb",
        F.explode(topn(F.col("q_emb"))).alias("cell"),
    )
    probes = probes.persist()
    try:
        meta_key = (
            os.path.normpath(index_dir),
            "cells",
            _quantizer_fingerprint(index_dir, ("centroids",)),
            emb_batch.semanticHash(),
            _batch_plan_files(emb_batch),
            n_probe,
        )
        cells = _PROBE_META.get(meta_key)
        if cells is None:
            # metadata-sized by construction: ≤ n_centroids distinct values
            cells = sorted(
                r.cell for r in probes.select("cell").distinct().collect()
            )
            _remember_probe_meta(meta_key, cells)
        raw = AI._live(
            spark,
            index_dir,
            spark.read.parquet(M.table_path(index_dir, "raw")).where(
                F.col("cell").isin(cells)
            ),
        )
        # cogrouped per-cell matmul (knn_join_cells): each side's rows
        # move once; a row-pair join + per-pair cosine UDF would push
        # batch × probed-cell-volume rows through Arrow instead
        local = S.knn_join_cells(
            probes, raw.select("vec_id", "embedding", "cell"), k
        )
        top = S.topk_per_key(
            local.withColumnRenamed("vec_id", "neighbor_id"),
            "q_id",
            [F.col("cosine").desc(), F.col("neighbor_id")],
            k,
        ).select(
            F.col("q_id").alias("vec_id"),
            "neighbor_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
        if threshold is not None:
            top = top.filter(F.col("cosine") >= threshold)
        # eager localCheckpoint, not persist: the caller appends the
        # batch into the index right after this, and any plan DERIVED
        # from a merely-persisted result (a select, the batch_id
        # withColumn before the sink write) re-resolves the store's
        # file listing and silently recomputes against the mutated
        # store. Checkpointing truncates the lineage so derived plans
        # can only read the flagged snapshot.
        if PRE_CHECKPOINT_PLAN_HOOK is not None:
            PRE_CHECKPOINT_PLAN_HOOK(top)
        return top.localCheckpoint(eager=True)
    finally:
        probes.unpersist()


def flag_against_index_2level(
    spark: SparkSession,
    emb_batch: DataFrame,
    index_dir: str,
    k: int = 3,
    n_probe_groups: int = AI.N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
    threshold: float | None = None,
) -> DataFrame:
    """:func:`flag_against_index` for the two-level (sharded-quantizer)
    layout — the streaming/batch flag verb that keeps working past the
    4096-cell cap. Probe selection is MAP-ONLY, never collecting the
    batch: one Arrow kernel holds the coarse matrix plus the fine
    shards (the same data the previous two-broadcast-stage plan
    shipped) and emits each vector's top coarse groups -> top
    ``n_probe`` cells directly, so the batch neither shuffles nor
    passes a window for probing. Per-vector quantizer work is
    n_groups + n_probe_groups*(n_cells/n_groups) cosines — the same
    term the driver-side reader saves. Scoring is the identical
    cogrouped per-cell matmul over the (group, cell)-pruned,
    tombstone-filtered raw scan; the result is eagerly
    local-checkpointed (mutation-safe, like the single-level verb)."""
    group_ids, g_mat = AI._read_coarse(spark, index_dir)
    fine_by_group = AI._fine_shards(spark, index_dir, group_ids)
    q = emb_batch.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # map-only two-stage probe selection (cached coarse + fine shards in
    # the kernel closure — the same data the previous plan broadcast):
    # the batch never shuffles and no window stage runs; same
    # (gsim desc, group asc) / (sim desc, cell asc) top-n as before
    pairs_udf = _probe_pairs_udf_2level(
        group_ids, g_mat, fine_by_group, n_probe_groups, n_probe
    )
    probes = q.select(
        "q_id",
        "q_emb",
        F.explode(pairs_udf(F.col("q_emb"))).alias("pc"),
    ).select(
        "q_id",
        "q_emb",
        F.col("pc.group").alias("group"),
        F.col("pc.cell").alias("cell"),
    )
    probes = probes.persist()
    try:
        meta_key = (
            os.path.normpath(index_dir),
            "pairs",
            _quantizer_fingerprint(index_dir, ("coarse", "fine")),
            emb_batch.semanticHash(),
            _batch_plan_files(emb_batch),
            n_probe_groups,
            n_probe,
        )
        pairs = _PROBE_META.get(meta_key)
        if pairs is None:
            pairs = sorted(
                (r.group, r.cell)
                for r in probes.select("group", "cell").distinct().collect()
            )
            _remember_probe_meta(meta_key, pairs)
        raw = AI._live(
            spark,
            index_dir,
            spark.read.parquet(M.table_path(index_dir, "raw")).where(
                F.col("group").isin(sorted({g for g, _ in pairs}))
                & F.col("cell").isin(sorted({c for _, c in pairs}))
            ),
        )
        local = S.knn_join_cells(
            probes.select("q_id", "q_emb", "cell"),
            raw.select("vec_id", "embedding", "cell"),
            k,
        )
        top = S.topk_per_key(
            local.withColumnRenamed("vec_id", "neighbor_id"),
            "q_id",
            [F.col("cosine").desc(), F.col("neighbor_id")],
            k,
        ).select(
            F.col("q_id").alias("vec_id"),
            "neighbor_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
        if threshold is not None:
            top = top.filter(F.col("cosine") >= threshold)
        if PRE_CHECKPOINT_PLAN_HOOK is not None:
            PRE_CHECKPOINT_PLAN_HOOK(top)
        return top.localCheckpoint(eager=True)
    finally:
        probes.unpersist()


def run_incremental_ann(
    emb_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    flags_out_dir: str,
    k: int = 3,
    n_probe: int = S.N_PROBE,
    threshold: float | None = None,
    n_centroids: int | None = S.N_CENTROIDS,
    sq8: bool = False,
    residual: bool | str = False,
    sq8_prefix_dims: int | None = None,
    binary: bool = False,
) -> None:
    """The ingestion pipeline: per micro-batch, flag each new embedding's
    nearest already-indexed neighbors, write the flags, then admit the
    batch into the index (bootstrap-build on the first batch). Runs with
    availableNow; exactly-once per batch via the streaming checkpoint.

    ``n_centroids`` sizes the bootstrap build only (the quantizer is
    immutable afterwards). NOTE the bootstrap sees just the FIRST
    micro-batch, so ``None`` (auto) would size for the batch, not the
    eventual corpus — a stream expecting to grow should pass
    ``ann_index.auto_n_centroids(expected_corpus_size)`` explicitly.

    ``residual`` passes to the bootstrap build. The STREAMING default is
    explicit ``False`` — NOT the batch builds' ``"auto"`` — for the same
    first-batch reason as ``n_centroids``: the variance-ratio diagnostic
    would measure one unrepresentative micro-batch and stamp the
    encoding immutably (a batch at or below the centroid count measures
    ratio 0 and would lock residual encoding for a corpus where raw
    wins). A stream whose corpus is known-clustered passes ``True``;
    ``"auto"`` is accepted but decides from the first batch — use it
    only when that batch is representative.

    ``sq8=True`` derives the SQ8 arm right after the bootstrap build —
    its per-dim grid trains on the first batch and is immutable like
    the other quantizers (unclipped codes keep later out-of-range
    components exact); subsequent appends maintain the arm off the
    stored manifest flag, so streaming into a pre-built SQ8 store needs
    no flag here at all. Resuming with ``sq8=True`` over an existing
    store that LACKS the arm derives it once (idempotent) rather than
    silently ignoring the request.

    ``sq8_prefix_dims`` materializes the prefix-codes arm
    (add_sq8_prefix_to_ann_index) right after the SQ8 derive — the
    scan-side truncated-search arm on a streaming-born store; appends
    maintain it per batch off the manifest key like the SQ8 arm
    itself, and a resume over a store lacking it derives it once
    (same no-silent-drop contract as ``sq8``). Requires ``sq8``.

    ``binary=True`` derives the 1-bit Hamming arm the same way — its
    midrange thresholds train on the first batch (immutable; a
    drifting stream shows up in the bit-balance audit, never as an
    inexact search), appends maintain the words table off the manifest
    flag, and a resume over a store lacking the arm derives it once."""
    if sq8_prefix_dims is not None and not sq8:
        raise ValueError("sq8_prefix_dims requires sq8=True")

    def _ensure_arms(spark) -> None:
        """Derive any requested-but-absent derived arm (bootstrap and
        resume share the contract: a request is never silently
        dropped; both verbs are idempotent)."""
        if sq8 and not M.read_meta(index_dir, AI._SQ8_KEY, False):
            AI.add_sq8_to_ann_index(spark, index_dir)
        if (
            sq8_prefix_dims is not None
            and M.read_meta(index_dir, AI._SQ8_PREFIX_DIMS_KEY, None)
            is None
        ):
            AI.add_sq8_prefix_to_ann_index(
                spark, index_dir, sq8_prefix_dims
            )
        if binary and not M.read_meta(index_dir, AI._BINARY_KEY, False):
            AI.add_binary_to_ann_index(spark, index_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if ann_index_exists(index_dir):
            flags = flag_against_index(
                spark, batch, index_dir, k, n_probe, threshold
            )  # checkpointed — safe across the append below
            flags.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(flags_out_dir)
            AI.append_to_ann_index(spark, batch, index_dir)
            _ensure_arms(spark)
        else:
            spark.createDataFrame([], _FLAG_SCHEMA).withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(flags_out_dir)
            AI.build_ann_index(
                spark,
                batch,
                index_dir,
                n_centroids=n_centroids,
                residual=residual,
            )
            _ensure_arms(spark)

    q = (
        emb_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ann_index_2level_exists(index_dir: str) -> bool:
    """Whether the two-level index has been bootstrapped (its coarse
    quantizer table is on disk) — the first-batch probe for the sharded
    layout."""
    return os.path.isdir(M.table_path(index_dir, "coarse"))


def run_incremental_ann_2level(
    emb_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    flags_out_dir: str,
    k: int = 3,
    n_probe_groups: int = AI.N_PROBE_GROUPS,
    n_probe: int = S.N_PROBE,
    threshold: float | None = None,
    n_groups: int | None = AI.N_GROUPS_2L,
    n_cells: int | None = AI.N_CELLS_2L,
    residual: bool | str = False,
    sq8: bool = False,
    sq8_prefix_dims: int | None = None,
    binary: bool = False,
) -> None:
    """:func:`run_incremental_ann` for the two-level (sharded-quantizer)
    layout — the exactly-once ingestion path past the 4096-cell cap:
    per micro-batch, flag each new embedding against everything indexed
    before it (:func:`flag_against_index_2level` — distributed two-stage
    broadcast probe, cogrouped per-cell matmul, eagerly checkpointed so
    the append below can't leak into the flags), write the flags, then
    admit the batch (``append_to_ann_index_2level`` — composed
    assignment + PQ encode against the STORED quantizers, appended into
    the (group, cell) partitions, nothing rewritten). First batch
    bootstraps with ``build_ann_index_2level`` and emits no flags;
    ``residual`` selects the residual-PQ arm for that bootstrap — a
    store that already exists keeps whatever encoding it was built
    with (appends dispatch off the stored manifest flag), so streaming
    into a pre-built residual store needs no flag here at all. The
    streaming default is explicit ``False``, not the batch builds'
    ``"auto"`` — the diagnostic would measure one unrepresentative
    first micro-batch (see :func:`run_incremental_ann`).

    ``n_groups``/``n_cells`` size the bootstrap build only (quantizers
    are immutable afterwards); as with the single-level driver, a stream
    expecting to grow should pass ``auto_quantizer_shape(expected_corpus
    _size)`` explicitly rather than ``None`` (which would size for the
    first batch). ``sq8``/``sq8_prefix_dims`` carry the same derived-arm
    contract as the single-level driver: derived at bootstrap,
    maintained per batch off the manifest keys, derived-once on a
    resume that requests an absent arm; ``binary`` likewise."""
    if sq8_prefix_dims is not None and not sq8:
        raise ValueError("sq8_prefix_dims requires sq8=True")

    def _ensure_arms(spark) -> None:
        if sq8 and not M.read_meta(index_dir, AI._SQ8_KEY, False):
            AI.add_sq8_to_ann_index(spark, index_dir)
        if (
            sq8_prefix_dims is not None
            and M.read_meta(index_dir, AI._SQ8_PREFIX_DIMS_KEY, None)
            is None
        ):
            AI.add_sq8_prefix_to_ann_index(
                spark, index_dir, sq8_prefix_dims
            )
        if binary and not M.read_meta(index_dir, AI._BINARY_KEY, False):
            AI.add_binary_to_ann_index(spark, index_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if ann_index_2level_exists(index_dir):
            flags = flag_against_index_2level(
                spark, batch, index_dir, k, n_probe_groups, n_probe, threshold
            )  # checkpointed — safe across the append below
            flags.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(flags_out_dir)
            AI.append_to_ann_index_2level(spark, batch, index_dir)
            # same resume contract as the single-level driver: a
            # requested-but-absent arm is derived, never dropped
            _ensure_arms(spark)
        else:
            spark.createDataFrame([], _FLAG_SCHEMA).withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(flags_out_dir)
            AI.build_ann_index_2level(
                spark,
                batch,
                index_dir,
                n_groups=n_groups,
                n_cells=n_cells,
                residual=residual,
            )
            _ensure_arms(spark)

    q = (
        emb_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
