"""Oracle twin of the streaming aggregations (SURVEY P13/P6).

``F.window(ts, '1 hour')`` in batch mode builds the exact plan shape the
streaming query uses (same tumbling-window expression, no state store);
epoch-aligned 1-hour tumbling windows coincide with ``date_trunc('hour')``
so DuckDB can verify the bucketing. The watermark/append semantics are
exercised in tests/test_streaming.py against the live streaming runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.agg import exact_sum, oracle_exact_sum
from rds_pgbadger_etl_spark.sources.tables import load_table


def _run_stream_cached(spark, sf_dir, key, launch):
    """Run an availableNow stream ONCE per (session, sf_dir) and share
    the persisted result across repeated plan evaluations (ADVICE r4:
    the per-invocation mkdtemp + uuid memory table re-ran the whole
    stream — with its per-key state store — every time the callable was
    evaluated). ``launch(name, ckpt)`` must run the stream to
    termination into memory-sink table ``name`` with checkpoint ``ckpt``
    and return the result DataFrame; the checkpoint directory is removed
    once the stream has terminated."""
    import shutil
    import tempfile
    import uuid

    from rds_pgbadger_etl_spark.plans._shared import shared_df

    def build() -> DataFrame:
        name = f"{key}_{uuid.uuid4().hex[:8]}"
        ckpt = tempfile.mkdtemp(prefix=f"ckpt_{key}_")
        try:
            return launch(name, ckpt)
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    return shared_df(spark, f"stream_{key}", sf_dir, build)


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_STREAM_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS bucket, event_type,
       count(*) AS n_events,
       {oracle_exact_sum('value')} AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window (30-min gap) in batch mode; oracle rebuilds the
    same sessions with a lag/cumsum window (q11's technique) and derives
    each session's [start, end] span."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


_STREAM_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT min(ts) AS session_start, user_id, count(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL stateful streaming query (applyInPandasWithState,
    availableNow trigger, memory sink) and returns each user's final
    state row — the oracle checks the cross-trigger accumulation against
    a batch group-by. Totals accumulate as exact integer cents, so the
    comparison is bit-exact, not tolerance-based."""
    from rds_pgbadger_etl_spark.streaming.ingest import (
        read_event_stream,
        run_available_now,
        running_user_totals,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        run_available_now(
            running_user_totals(read_event_stream(spark, sf_dir)),
            ckpt,
            name,
            output_mode="update",
            state_partitions=8,
        )
        return spark.sql(
            f"""SELECT user_id, n_events, total_value, max_value FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC) AS rn
                  FROM {name}) WHERE rn = 1"""
        )

    return _run_stream_cached(spark, sf_dir, "running_totals", launch)


_STREAM_RUNNING_SQL = """
SELECT user_id, count(*) AS n_events,
       cast(sum(cast(round(value * 100) AS bigint)) AS double) / 100
         AS total_value,
       max(value) AS max_value
FROM events GROUP BY user_id
"""


def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL streaming dedup (dropDuplicatesWithinWatermark,
    availableNow, memory sink) against a deliberately DOUBLED stream —
    the same source unioned with itself, i.e. an at-least-once upstream
    delivering everything twice — and aggregates the survivors. The
    oracle counts each event once, so the hash only matches if the
    dedup state dropped every duplicate."""
    from rds_pgbadger_etl_spark.streaming.ingest import (
        dedup_events,
        read_event_stream,
        run_available_now,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        doubled = read_event_stream(spark, sf_dir).unionByName(
            read_event_stream(spark, sf_dir)
        )
        agg = (
            dedup_events(doubled)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "sum_cents"
                ),
            )
        )
        run_available_now(
            agg, ckpt, name, output_mode="complete", state_partitions=8
        )
        return spark.table(name)

    return _run_stream_cached(spark, sf_dir, "dedup_counts", launch)


_STREAM_DEDUP_SQL = """
SELECT event_type, count(*) AS n_events,
       cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS sum_cents
FROM events GROUP BY event_type
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs a REAL stream-stream interval join (two watermarked file
    streams, availableNow, memory sink): error events joined to same-user
    purchases within 10 minutes after. The oracle is the equivalent batch
    self-join, so the hash only matches if the streaming join emitted
    exactly the batch-join pairs — no drops from state expiry (inner
    joins emit on arrival; the 1-hour watermark only bounds state), no
    duplicates from the doubled state stores."""
    from rds_pgbadger_etl_spark.streaming.ingest import (
        error_purchase_interval_join,
        read_event_stream,
        run_available_now,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        errors = read_event_stream(spark, sf_dir).filter(
            F.col("event_type") == "error"
        )
        purchases = read_event_stream(spark, sf_dir).filter(
            F.col("event_type") == "purchase"
        )
        joined = error_purchase_interval_join(errors, purchases).select(
            "user_id", "err_id", "p_id"
        )
        run_available_now(joined, ckpt, name, state_partitions=8)
        return spark.table(name)

    return _run_stream_cached(spark, sf_dir, "interval_join", launch)


_STREAM_INTERVAL_JOIN_SQL = """
SELECT e.user_id AS user_id, e.event_id AS err_id, p.event_id AS p_id
FROM events e
JOIN events p
  ON p.user_id = e.user_id
 AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
"""


def stream_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment join: the event stream joined to
    the static nation dimension (25 rows — broadcast, re-resolved per
    micro-batch, no state store involved: stream-static inner joins are
    stateless by construction) and aggregated per nation. The oracle is
    the equivalent batch join+aggregate. This is the third streaming
    join shape next to stream-stream (stream_interval_join) and
    stateful-agg (stream_running_totals): dimension enrichment costs no
    watermark and no state."""
    from rds_pgbadger_etl_spark.streaming.ingest import (
        read_event_stream,
        run_available_now,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        ev = read_event_stream(spark, sf_dir)
        nation = load_table(spark, sf_dir, "nation")
        enriched = ev.withColumn("nkey", F.col("user_id") % 25).join(
            F.broadcast(nation), F.col("nkey") == F.col("n_nationkey")
        )
        agg = enriched.groupBy("n_name").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_cents"
            ),
        )
        run_available_now(
            agg, ckpt, name, output_mode="complete", state_partitions=8
        )
        return spark.table(name)

    return _run_stream_cached(spark, sf_dir, "enrich", launch)


_STREAM_ENRICH_SQL = """
SELECT n.n_name, count(*) AS n_events,
       cast(sum(cast(round(e.value * 100) AS bigint)) AS bigint) AS sum_cents
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name
"""


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) event-time windows: 2-hour windows every
    hour, so each event lands in exactly two windows — the smoothing
    shape tumbling windows can't express. Spark's window() generates
    the window set per row BEFORE the aggregate (a 2× row expansion,
    then a normal hash aggregate); the oracle unions the two bucket
    assignments explicitly. Same expression works under readStream with
    a watermark — windows close 2h+watermark after their start."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


_SLIDING_SQL = """
WITH assigned AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS win_start, event_type
  FROM events
)
SELECT win_start, event_type, count(*) AS n_events
FROM assigned GROUP BY win_start, event_type
"""


def stream_state_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the user_state_profiles stateful operator (availableNow,
    memory sink) and returns each user's final profile row. The operator
    resolves ``api="auto"``: transformWithStateInPandas when its
    optional protobuf dependency is importable, else the
    applyInPandasWithState fallback — both share one state fold
    (streaming/ingest.py:_fold_profile), so the checked semantics are
    identical either way. The oracle is a batch group-by with exact
    integer microsecond spans, so the cross-trigger state accumulation
    is hash-checked bit-exactly."""
    from rds_pgbadger_etl_spark.streaming.ingest import (
        read_event_stream,
        run_available_now,
        user_state_profiles,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        run_available_now(
            user_state_profiles(read_event_stream(spark, sf_dir)),
            ckpt,
            name,
            output_mode="update",
            state_partitions=8,
        )
        return spark.sql(
            f"""SELECT user_id, n_events, n_error, span_us FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC) AS rn
                  FROM {name}) WHERE rn = 1"""
        )

    return _run_stream_cached(spark, sf_dir, "state_profiles", launch)


_STREAM_STATE_PROFILES_SQL = """
SELECT user_id, count(*) AS n_events,
       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS bigint)
         AS n_error,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
FROM events GROUP BY user_id
"""


def stream_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streamed sketch build — the ingest-time half of
    sketch_rollup_daily: a per-hour Datasketches HLL of user_id
    maintained IN THE STATE STORE across micro-batches (availableNow,
    complete mode, memory sink), so at scale the stream materializes the
    hourly sketch table continuously and any later window question is
    sketch merges, never an events re-scan. The oracle's exact per-hour
    distincts hash-match because hourly cardinality at oracle scale sits
    in the HLL coupon-exact range; the batch/stream agreement itself is
    the point — the same sketch state accumulates correctly under
    micro-batch replay as in one batch pass."""
    from rds_pgbadger_etl_spark.streaming.ingest import (
        read_event_stream,
        run_available_now,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        agg = (
            read_event_stream(spark, sf_dir)
            .groupBy(F.window("ts", "1 hour"))
            .agg(
                F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                F.col("window.start").alias("bucket"),
                F.hll_sketch_estimate("sk").alias("est_users"),
                "n_events",
            )
        )
        run_available_now(
            agg, ckpt, name, output_mode="complete", state_partitions=8
        )
        return spark.table(name)

    return _run_stream_cached(spark, sf_dir, "sketch_users", launch)


_STREAM_SKETCH_SQL = """
SELECT date_trunc('hour', ts) AS bucket,
       count(DISTINCT user_id) AS est_users,
       count(*) AS n_events
FROM events GROUP BY date_trunc('hour', ts)
"""


def stream_embed_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streamed inference — the batch-inference operator
    (operators/inference.embed_documents, Arrow-batched mapInPandas with
    the deterministic stub encoder) running INSIDE the micro-batch
    pipeline: inference-at-ingest, the pattern that embeds documents as
    they arrive instead of in a later batch sweep. availableNow, append
    to a memory sink (stateless operators end-to-end, so exactly-once
    rows). The oracle is the same md5-projection computed by DuckDB over
    the batch table — hash equality proves the STREAMING execution of
    the encoder produces the batch answer. A ~1% event slice keeps the
    oracle compare bounded; props may be NULL → both engines encode ''.
    """
    from rds_pgbadger_etl_spark.operators.inference import embed_documents
    from rds_pgbadger_etl_spark.streaming.ingest import (
        read_event_stream,
        run_available_now,
    )

    def launch(name: str, ckpt: str) -> DataFrame:
        stream = read_event_stream(spark, sf_dir).filter(
            F.col("event_id") % 97 == 0
        )
        emb = embed_documents(
            stream.select(
                F.col("event_id").alias("doc_id"),
                F.coalesce("props", F.lit("")).alias("text"),
            )
        )
        out = emb.select(
            F.col("doc_id").alias("event_id"),
            F.posexplode("embedding").alias("dim", "_f"),
        ).select(
            "event_id", "dim", F.col("_f").cast("double").alias("val")
        )
        run_available_now(out, ckpt, name, output_mode="append")
        return spark.table(name)

    return _run_stream_cached(spark, sf_dir, "embed_props", launch)


_STREAM_EMBED_SQL = """
SELECT event_id, cast(j AS int) AS dim,
       CAST(CAST(((CAST('0x' || substr(md5(md5(coalesce(props, ''))
                                       || ':' || j), 1, 8)
                   AS bigint) % 2000001) - 1000000) / 1000000.0
            AS real) AS double) AS val
FROM events, generate_series(0, 15) t(j)
WHERE event_id % 97 = 0
"""


def stream_ann_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL incremental ANN ingestion (streaming/incremental_ann.py):
    the embeddings corpus arrives as three micro-batches (vec_id
    thirds); the first bootstraps the persisted index (build — the
    quantizers train on it), each later batch is flagged with its top-3
    already-indexed neighbors (IVF probe of the store's cell-partitioned
    raw table) then appended. Returns every cross-batch flag. The
    oracle is the IVF search math in SQL with the batch-role constraint
    (neighbors strictly from EARLIER batches) — hash equality proves
    the stream-built artifact and the foreachBatch flag/append cycle
    produce exactly the batch semantics."""
    import shutil
    import tempfile

    from rds_pgbadger_etl_spark.plans._shared import shared_df
    from rds_pgbadger_etl_spark.streaming.incremental_ann import (
        run_incremental_ann,
    )

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        root = tempfile.mkdtemp(prefix="stream_ann_")
        src, store, ckpt, flags = (
            f"{root}/{d}" for d in ("src", "store", "ckpt", "flags")
        )
        try:
            for b in range(3):
                lo, hi = b * n // 3, (b + 1) * n // 3
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ).write.mode("append").parquet(src)
                run_incremental_ann(
                    spark.readStream.schema(emb.schema).parquet(src),
                    store,
                    ckpt,
                    flags,
                    k=3,
                )
            out = (
                spark.read.parquet(flags)
                .filter(F.col("vec_id").isNotNull())
                .select("vec_id", "neighbor_id", "cosine", "rank")
            )
            out = out.cache()
            out.count()  # materialize before the temp dirs go away
            return out
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    return shared_df(spark, "ann_flags", sf_dir, build)


# Same centroid bootstrap (vec_id < N_CENTROIDS — batch 0 by
# construction), same rounded-cosine assignment/probe/tie conventions as
# _ANN_IVF_SQL, plus the ingestion-order role: a flag's neighbor comes
# from a strictly earlier batch. Batch boundaries use the same integer
# arithmetic as the Spark side (b*n//3).
def _stream_ann_sql() -> str:
    from rds_pgbadger_etl_spark.operators import similarity as S
    from rds_pgbadger_etl_spark.plans.llm_ops import _cos_sql

    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS emb
  FROM embeddings
),
nn AS (SELECT count(*) AS n FROM embeddings),
bt AS (
  SELECT e.vec_id, e.emb,
         CASE WHEN e.vec_id < n // 3 THEN 0
              WHEN e.vec_id < (2 * n) // 3 THEN 1
              ELSE 2 END AS batch
  FROM e, nn
),
c AS (SELECT vec_id AS cell, emb AS c_emb FROM e
      WHERE vec_id < {S.N_CENTROIDS}),
asgn AS (
  SELECT vec_id, emb, cell, batch FROM (
    SELECT b.vec_id, b.emb, b.batch, c.cell,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY {_cos_sql('b.emb', 'c.c_emb')} DESC,
                                       c.cell) AS rn
    FROM bt b, c) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, emb AS q_emb, batch AS q_batch FROM bt
      WHERE batch >= 1),
probes AS (
  SELECT q_id, q_emb, q_batch, cell FROM (
    SELECT q.q_id, q.q_emb, q.q_batch, c.cell,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {_cos_sql('q.q_emb', 'c.c_emb')} DESC,
                                       c.cell) AS rn
    FROM q, c) WHERE rn <= {S.N_PROBE}
),
sims AS (
  SELECT p.q_id, a.vec_id AS neighbor_id,
         {_cos_sql('p.q_emb', 'a.emb')} AS cosine
  FROM probes p
  JOIN asgn a ON a.cell = p.cell AND a.batch < p.q_batch
)
SELECT q_id AS vec_id, neighbor_id, cosine, cast(rnk AS int) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM sims
) WHERE rnk <= 3
"""


_STREAM_ANN_SQL = _stream_ann_sql()


def stream_ann_2level_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL incremental ANN ingestion over the TWO-LEVEL
    (sharded-quantizer) store (run_incremental_ann_2level): the corpus
    arrives as three micro-batches; the first bootstraps the 2-level
    index (coarse/fine quantizers + PQ codebook train on it), each later
    batch is flagged with its top-3 already-indexed neighbors (two-stage
    broadcast probe + cogrouped per-cell matmul over the (group,
    cell)-pruned store) then appended against the STORED quantizers.
    The oracle is the composed-assignment 2-level search math in SQL
    with the batch-role constraint (neighbors strictly from EARLIER
    batches) — hash equality proves the stream-built sharded artifact
    and the foreachBatch cycle produce exactly the batch semantics."""
    import shutil
    import tempfile

    from rds_pgbadger_etl_spark.plans._shared import shared_df
    from rds_pgbadger_etl_spark.streaming.incremental_ann import (
        run_incremental_ann_2level,
    )

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        root = tempfile.mkdtemp(prefix="stream_ann2l_")
        src, store, ckpt, flags = (
            f"{root}/{d}" for d in ("src", "store", "ckpt", "flags")
        )
        try:
            for b in range(3):
                lo, hi = b * n // 3, (b + 1) * n // 3
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ).write.mode("append").parquet(src)
                run_incremental_ann_2level(
                    spark.readStream.schema(emb.schema).parquet(src),
                    store,
                    ckpt,
                    flags,
                    k=3,
                )
            out = (
                spark.read.parquet(flags)
                .filter(F.col("vec_id").isNotNull())
                .select("vec_id", "neighbor_id", "cosine", "rank")
            )
            out = out.cache()
            out.count()  # materialize before the temp dirs go away
            return out
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    return shared_df(spark, "ann_2level_flags", sf_dir, build)


# The 2-level quantizers bootstrap on batch 0 (vec_id < max(G, C) —
# batch 0 by construction), the composed assignment / probe selection
# follow _ANN_2LEVEL_SQL's conventions, and the ingestion-order role
# says a flag's neighbor comes from a strictly earlier batch.
def _stream_ann_2level_sql() -> str:
    from rds_pgbadger_etl_spark.operators import ann_index as AI
    from rds_pgbadger_etl_spark.operators import similarity as S
    from rds_pgbadger_etl_spark.plans.llm_ops import _cos_sql

    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS emb
  FROM embeddings
),
nn AS (SELECT count(*) AS n FROM embeddings),
bt AS (
  SELECT e.vec_id, e.emb,
         CASE WHEN e.vec_id < n // 3 THEN 0
              WHEN e.vec_id < (2 * n) // 3 THEN 1
              ELSE 2 END AS batch
  FROM e, nn
),
c AS (SELECT vec_id AS cell, emb AS c_emb FROM e
      WHERE vec_id < {AI.N_CELLS_2L}),
g AS (SELECT vec_id AS grp, emb AS g_emb FROM e
      WHERE vec_id < {AI.N_GROUPS_2L}),
gmap AS (
  SELECT cell, grp, c_emb FROM (
    SELECT c.cell, g.grp, c.c_emb,
           row_number() OVER (PARTITION BY c.cell
                              ORDER BY {_cos_sql('c.c_emb', 'g.g_emb')} DESC, g.grp)
             AS rn
    FROM c, g) WHERE rn = 1
),
gl AS (SELECT g.grp, g.g_emb FROM g
       WHERE g.grp IN (SELECT DISTINCT grp FROM gmap)),
asgng AS (
  SELECT vec_id, emb, grp, batch FROM (
    SELECT b.vec_id, b.emb, b.batch, gl.grp,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY {_cos_sql('b.emb', 'gl.g_emb')} DESC, gl.grp)
             AS rn
    FROM bt b, gl) WHERE rn = 1
),
asgn AS (
  SELECT vec_id, emb, cell, batch FROM (
    SELECT a.vec_id, a.emb, a.batch, m.cell,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {_cos_sql('a.emb', 'm.c_emb')} DESC, m.cell)
             AS rn
    FROM asgng a JOIN gmap m ON m.grp = a.grp) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, emb AS q_emb, batch AS q_batch FROM bt
      WHERE batch >= 1),
qg AS (
  SELECT q_id, grp FROM (
    SELECT q.q_id, gl.grp,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {_cos_sql('q.q_emb', 'gl.g_emb')} DESC, gl.grp)
             AS rn
    FROM q, gl) WHERE rn <= {AI.N_PROBE_GROUPS}
),
probes AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, m.cell,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {_cos_sql('q.q_emb', 'm.c_emb')} DESC, m.cell)
             AS rn
    FROM q JOIN qg ON qg.q_id = q.q_id
           JOIN gmap m ON m.grp = qg.grp) WHERE rn <= {S.N_PROBE}
),
sims AS (
  SELECT p.q_id, a.vec_id AS neighbor_id,
         {_cos_sql('q.q_emb', 'a.emb')} AS cosine
  FROM probes p
  JOIN asgn a ON a.cell = p.cell
  JOIN q ON q.q_id = p.q_id
  WHERE a.batch < q.q_batch
)
SELECT q_id AS vec_id, neighbor_id, cosine, cast(rnk AS int) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM sims
) WHERE rnk <= 3
"""


_STREAM_ANN_2LEVEL_SQL = _stream_ann_2level_sql()


def stream_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL incremental near-dup ingestion
    (streaming/incremental_dedup.py over the persisted signature store):
    the documents corpus arrives as three micro-batches (doc_id
    thirds); each batch is flagged against every PREVIOUSLY accepted
    doc (store lookup: pfx-pruned band probe + bucket-pruned exact
    verify) and then appended into the store. Returns every cross-batch
    flag. Oracle = the shingle/band/Jaccard math in SQL with the
    ingestion-order role (dup_of strictly from an earlier batch) —
    hash equality proves the store built by the stream answers exactly
    the batch semantics, flag-by-flag."""
    import shutil
    import tempfile

    from rds_pgbadger_etl_spark.plans._shared import shared_df
    from rds_pgbadger_etl_spark.streaming.incremental_dedup import (
        run_incremental_dedup,
    )

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        n = docs.count()
        root = tempfile.mkdtemp(prefix="stream_dedup_")
        src, store, ckpt, flags = (
            f"{root}/{d}" for d in ("src", "store", "ckpt", "flags")
        )
        try:
            # one availableNow run drains the three thirds as three
            # micro-batches via maxFilesPerTrigger=1 over mtime-ordered
            # single-file writes — identical batch contents and store
            # mutation order to the three-run formulation at one stream
            # startup + one checkpoint (the funnel's r9 cut, applied
            # here; same LOCAL-FS mtime-stamp assumption, see
            # stream_curation_funnel).
            import glob
            import os
            import time as _time

            t0 = _time.time()
            stamped: set[str] = set()
            for b in range(3):
                lo, hi = b * n // 3, (b + 1) * n // 3
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).coalesce(1).write.mode("append").parquet(src)
                for f in glob.glob(f"{src}/part-*"):
                    if f not in stamped:
                        os.utime(f, (t0 + 60 * b, t0 + 60 * b))
                        stamped.add(f)
            run_incremental_dedup(
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                store,
                ckpt,
                flags,
                threshold=0.5,
            )
            out = (
                spark.read.parquet(flags)
                .filter(F.col("doc_id").isNotNull())
                .select("doc_id", "dup_of", "jaccard")
            )
            out = out.cache()
            out.count()  # materialize before the temp dirs go away
            return out
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    return shared_df(spark, "dedup_flags", sf_dir, build)


# The dedup-store lookup math (same md5 shingle/sig/band family as
# plans/llm_ops._DEDUP_INDEX_SQL) with the batch role: a flag's dup_of
# comes from a strictly earlier third of the corpus.
def _stream_dedup_sql() -> str:
    from rds_pgbadger_etl_spark.plans.llm_ops import (
        _SH_SQL,
        _SIG_COLS_SQL,
    )

    return f"""
WITH sh0 AS ({_SH_SQL}),
nn AS (SELECT count(*) AS n FROM documents),
bt AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id < n // 3 THEN 0
              WHEN d.doc_id < (2 * n) // 3 THEN 1
              ELSE 2 END AS batch
  FROM documents d, nn
),
sigs AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh0 GROUP BY doc_id),
bands AS (
  SELECT DISTINCT doc_id, band FROM (
    SELECT doc_id,
           unnest([md5(cast(sig1 AS varchar) || ':' || cast(sig2 AS varchar)),
                   md5(cast(sig3 AS varchar) || ':' || cast(sig4 AS varchar))])
             AS band
    FROM sigs)
),
cand AS (
  SELECT DISTINCT l.doc_id AS old_id, r.doc_id AS new_id
  FROM bands l
  JOIN bands r ON l.band = r.band
  JOIN bt bl ON bl.doc_id = l.doc_id
  JOIN bt br ON br.doc_id = r.doc_id
  WHERE bl.batch < br.batch
),
s AS (SELECT DISTINCT doc_id, shingle FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (
  SELECT c.old_id, c.new_id, count(*) AS inter
  FROM cand c
  JOIN s sa ON sa.doc_id = c.old_id
  JOIN s sb ON sb.doc_id = c.new_id AND sb.shingle = sa.shingle
  GROUP BY c.old_id, c.new_id
)
SELECT i.new_id AS doc_id, i.old_id AS dup_of,
       cast(i.inter AS double) / cast(na.n + nb.n - i.inter AS double)
         AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.old_id
JOIN sizes nb ON nb.doc_id = i.new_id
WHERE cast(i.inter AS double) / cast(na.n + nb.n - i.inter AS double) >= 0.5
"""


_STREAM_DEDUP_FLAGS_SQL = _stream_dedup_sql()


def stream_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining funnel as INCREMENTAL ingestion
    (streaming/incremental_curation.py): the corpus arrives as three
    micro-batches (doc_id thirds); each batch is gated through
    lang+quality → exact dedup (in-batch keeper + persisted hash store)
    → near dedup (the persisted dedup signature store, encode-once
    probe-then-append) → decontamination (broadcast static benchmark
    grams), with the accepted docs mutating both stores. Returns the
    per-batch 5-row funnels. Oracle = the batch funnel math with the
    ingestion-order role (near-dup's dup_of strictly from an earlier
    batch; exact keeper = global min per hash, which IS the sequential
    store semantics when batches arrive in id order) — hash equality
    proves the incremental path answers exactly the batch semantics,
    batch by batch."""
    import shutil
    import tempfile

    from rds_pgbadger_etl_spark.operators import curation as CO
    from rds_pgbadger_etl_spark.plans._shared import shared_df
    from rds_pgbadger_etl_spark.plans.curation import _BENCH_MAX_ID
    from rds_pgbadger_etl_spark.streaming.incremental_curation import (
        run_incremental_curation,
    )

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        n = docs.count()
        bench_grams = (
            CO.word_ngram_grams(
                docs.filter(F.col("doc_id") < _BENCH_MAX_ID),
                CO.DECON_NGRAM_N,
            )
            .select("gram")
            .distinct()
            .localCheckpoint(eager=True)
        )
        root = tempfile.mkdtemp(prefix="stream_funnel_")
        src, store, exact, ckpt, out = (
            f"{root}/{d}" for d in ("src", "store", "exact", "ckpt", "out")
        )
        try:
            # All three thirds land as ONE data file each with strictly
            # increasing mtimes, and a SINGLE availableNow run drains
            # them as three micro-batches via maxFilesPerTrigger=1 —
            # identical batch contents and store mutation order to the
            # r8 three-run formulation (the file source admits files in
            # (modificationTime, path) order), at one stream startup +
            # one checkpoint instead of three: the ~55 s cold build the
            # r8 verdict flagged drops to roughly a third.
            # LOCAL-FS ASSUMPTION: the ordering trick stamps mtimes with
            # os.utime over glob'd part files — valid on the pinned
            # local-filesystem bench root (PySpark 4.x local FS honors
            # both maxFilesPerTrigger under AvailableNow and the stamped
            # modificationTime); an object-store root has no utime and
            # would need per-batch source subdirectories instead.
            import glob
            import os
            import time

            t0 = time.time()
            stamped: set[str] = set()
            for b in range(3):
                lo, hi = b * n // 3, (b + 1) * n // 3
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).coalesce(1).write.mode("append").parquet(src)
                for f in glob.glob(f"{src}/part-*"):
                    if f not in stamped:
                        os.utime(f, (t0 + 60 * b, t0 + 60 * b))
                        stamped.add(f)
            # attach the batch-staged signature table: the corpus-wide
            # shingle profiles are a deterministic function of
            # (doc_id, text) — one staged encode pass (shared with any
            # other consumer in the process) replaces three per-batch
            # re-shingles inside the stream; flags and store contents
            # are bit-identical (curate_batch joins the batch's ids).
            run_incremental_curation(
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                store,
                exact,
                ckpt,
                out,
                bench_grams,
                _BENCH_MAX_ID,
                threshold=0.5,
                corpus_profiles=_corpus_profiles(spark, sf_dir),
            )
            res = spark.read.parquet(out).select(
                "batch_id", "stage", "n_docs", "n_tokens"
            )
            res = res.cache()
            res.count()  # materialize before the temp dirs go away
            return res
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    return shared_df(spark, "stream_funnel", sf_dir, build)


def _corpus_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide shingle-profile staging (the `_encode` output,
    materialized once per process) — the batch artifact the streaming
    funnel attaches to instead of re-shingling each micro-batch's text.
    Reads only the immutable documents table, so the persisted handle is
    safe across the stream's store mutations. Eagerly materialized: the
    first consumer would otherwise pay the encode INSIDE its first
    micro-batch, which is exactly the cold cost being cut."""
    from rds_pgbadger_etl_spark.operators.dedup_index import _encode
    from rds_pgbadger_etl_spark.plans._shared import shared_df

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        prof, _bands = _encode(docs, "doc_id", "text")
        prof.count()  # materialize the persist now (build-once contract)
        return prof

    return shared_df(spark, "corpus_profiles", sf_dir, build)


def _stream_funnel_sql() -> str:
    from rds_pgbadger_etl_spark.plans.curation import (
        _BENCH_MAX_ID,
        _DECON_CTES,
    )
    from rds_pgbadger_etl_spark.plans.llm_ops import (
        _QUALITY_SQL,
        _SH_SQL,
        _SIG_COLS_SQL,
        _TOKS_SQL,
    )

    stages = [
        ("0_raw", "true"),
        ("1_lang_quality", "pass1"),
        ("2_exact_dedup", "pass2"),
        ("3_near_dedup", "pass3"),
        ("4_decontaminated", "pass4"),
    ]
    unions = "\nUNION ALL\n".join(
        f"""SELECT batch, '{name}' AS stage,
       count(*) FILTER (WHERE {cond}) AS n_docs,
       cast(coalesce(sum(tok) FILTER (WHERE {cond}), 0) AS bigint)
         AS n_tokens
FROM flags GROUP BY batch"""
        for name, cond in stages
    )
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
bt AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id < n // 3 THEN 0
              WHEN d.doc_id < (2 * n) // 3 THEN 1
              ELSE 2 END AS batch
  FROM documents d, nn
),
base AS (
  SELECT doc_id, md5(text) AS h, {_TOKS_SQL} AS tok,
         (lang = 'en' AND {_QUALITY_SQL} >= 0.7) AS pass1
  FROM documents
),
p2 AS (
  SELECT b.*, bt.batch,
         b.pass1 AND b.doc_id = min(CASE WHEN b.pass1 THEN b.doc_id END)
                                OVER (PARTITION BY b.h) AS pass2
  FROM base b JOIN bt ON bt.doc_id = b.doc_id
),
sh0 AS ({_SH_SQL}),
sigs AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh0 GROUP BY doc_id),
bands AS (
  SELECT DISTINCT doc_id, band FROM (
    SELECT doc_id,
           unnest([md5(cast(sig1 AS varchar) || ':' || cast(sig2 AS varchar)),
                   md5(cast(sig3 AS varchar) || ':' || cast(sig4 AS varchar))])
             AS band
    FROM sigs)
),
cand AS (
  SELECT DISTINCT l.doc_id AS old_id, r.doc_id AS new_id
  FROM bands l
  JOIN bands r ON l.band = r.band
  JOIN p2 pl ON pl.doc_id = l.doc_id AND pl.pass2
  JOIN p2 pr ON pr.doc_id = r.doc_id AND pr.pass2
  WHERE pl.batch < pr.batch
),
s AS (SELECT DISTINCT doc_id, shingle FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (
  SELECT c.old_id, c.new_id, count(*) AS inter
  FROM cand c
  JOIN s sa ON sa.doc_id = c.old_id
  JOIN s sb ON sb.doc_id = c.new_id AND sb.shingle = sa.shingle
  GROUP BY c.old_id, c.new_id
),
dup AS (
  SELECT DISTINCT i.new_id AS doc_id
  FROM inter i
  JOIN sizes na ON na.doc_id = i.old_id
  JOIN sizes nb ON nb.doc_id = i.new_id
  WHERE cast(i.inter AS double) / cast(na.n + nb.n - i.inter AS double)
        >= 0.5
),
{_DECON_CTES},
flags AS (
  SELECT p2.batch, p2.tok, p2.pass1, p2.pass2,
         p2.pass2 AND du.doc_id IS NULL AS pass3,
         p2.pass2 AND du.doc_id IS NULL AND p2.doc_id >= {_BENCH_MAX_ID}
               AND co.doc_id IS NULL AS pass4
  FROM p2 LEFT JOIN dup du ON du.doc_id = p2.doc_id
          LEFT JOIN cont co ON co.doc_id = p2.doc_id
)
SELECT cast(batch AS int) AS batch_id, stage, n_docs, n_tokens
FROM ({unions})
"""


_STREAM_FUNNEL_SQL = _stream_funnel_sql()


QUERIES = {
    "stream_curation_funnel": (stream_curation_funnel, _STREAM_FUNNEL_SQL),
    "stream_ann_flags": (stream_ann_flags, _STREAM_ANN_SQL),
    "stream_ann_2level_flags": (stream_ann_2level_flags, _STREAM_ANN_2LEVEL_SQL),
    "stream_dedup_flags": (stream_dedup_flags, _STREAM_DEDUP_FLAGS_SQL),
    "stream_hourly_counts": (stream_hourly_counts, _STREAM_HOURLY_SQL),
    "stream_embed_props": (stream_embed_props, _STREAM_EMBED_SQL),
    "stream_sketch_users": (stream_sketch_users, _STREAM_SKETCH_SQL),
    "sliding_window_counts": (sliding_window_counts, _SLIDING_SQL),
    "stream_enrich_counts": (stream_enrich_counts, _STREAM_ENRICH_SQL),
    "stream_interval_join": (stream_interval_join, _STREAM_INTERVAL_JOIN_SQL),
    "stream_dedup_counts": (stream_dedup_counts, _STREAM_DEDUP_SQL),
    "stream_session_windows": (stream_session_windows, _STREAM_SESSION_SQL),
    "stream_running_totals": (stream_running_totals, _STREAM_RUNNING_SQL),
    "stream_state_profiles": (stream_state_profiles, _STREAM_STATE_PROFILES_SQL),
}
