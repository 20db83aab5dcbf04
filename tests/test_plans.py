"""Physical-plan regression tests (the 100 TB checklist, SURVEY.md §4).

Correctness tests prove the numbers; these prove the *plans* stay
scale-shaped: filters reach the parquet scan, scans are column-pruned,
small dimensions broadcast, top-K never global-sorts, and the dedup
aggregates stay in hash aggregation (not sort fallback).
"""

from __future__ import annotations

import __spark_entry__ as E


def _formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_filter_and_projection_pushed_to_scan(spark, sf_oracle):
    plan = _formatted_plan(
        spark, E.queries()["q02_filter_project"](spark, sf_oracle)
    )
    assert "GreaterThanOrEqual(l_shipdate" in plan  # predicate at the source
    # column pruning: only the referenced columns are read
    read = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_comment" not in read and "l_quantity" not in read


def test_star_join_broadcasts_all_dimensions(spark, sf_oracle):
    plan = _formatted_plan(
        spark, E.queries()["q06_star_join_revenue"](spark, sf_oracle)
    )
    assert plan.count("BroadcastHashJoin") >= 4  # orders/customer/nation/region
    assert "SortMergeJoin" not in plan  # fact table never shuffles for dims


def test_topk_uses_take_ordered_not_global_sort(spark, sf_oracle):
    plan = _formatted_plan(spark, E.queries()["q05_topk_orders"](spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark, sf_oracle):
    plan = _formatted_plan(spark, E.queries()["q15_semi_join"](spark, sf_oracle))
    assert "LeftSemi" in plan


def test_minhash_aggregate_is_hash_not_sort(spark, sf_oracle):
    plan = _formatted_plan(
        spark, E.queries()["dedup_minhash_sigs"](spark, sf_oracle)
    )
    # min over hex-to-bigint keeps the shingle aggregate in HashAggregate;
    # a string min would silently fall back to SortAggregate over the
    # whole exploded shingle stream (~10x slower).
    assert "SortAggregate" not in plan


def test_decontaminate_joins_broadcast(spark, sf_oracle):
    plan = _formatted_plan(spark, E.queries()["decontaminate"](spark, sf_oracle))
    # the benchmark gram set broadcasts (semi) and the corpus-side gram
    # stream never sort-merge-joins
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_pivot_is_single_linear_job(spark, sf_oracle):
    import re

    plan = _formatted_plan(spark, E.queries()["q24_pivot"](spark, sf_oracle))
    # explicit value list => no eager value-discovery job; the plan is
    # one linear pipeline: partial (bucket,type) aggregate, then the
    # pivotfirst rollup — two narrow exchanges of pre-aggregated rows
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 2
    assert "pivotfirst" in plan and "SortAggregate" not in plan


def test_pack_sequences_no_segment_sized_window(spark, sf_oracle):
    """pack_bins runs the distributed prefix sum (round 6,
    functions/agg.segmented_cumsum): every window in the plan involves
    ``_pid`` — either the partition-LOCAL cumsum (bounded sorts) or the
    metadata-sized per-segment offset pass over (segment × partition)
    partials — and the offsets come back via a broadcast join. The shape
    this replaces (one cumsum window partitioned by ``source`` alone,
    which this test previously pinned as 'single exchange + single
    window') put one source's entire stream in one sorted task: shuffle-
    count-optimal and straggler-bound. The prefix sum pays a few extra
    NARROW-row exchanges for bounded partitions everywhere."""
    import re

    plan = _formatted_plan(spark, E.queries()["pack_sequences"](spark, sf_oracle))
    specs = re.findall(
        r"windowspecdefinition\((.*?), specifiedwindowframe", plan
    )
    assert specs and all("_pid" in s for s in specs), specs
    assert "BroadcastHashJoin" in plan  # per-segment offsets broadcast back


def test_training_order_is_topk(spark, sf_oracle):
    plan = _formatted_plan(spark, E.queries()["training_order"](spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan


def test_pair_jaccard_broadcasts_candidate_pairs(spark, sf_oracle):
    plan = _formatted_plan(
        spark, E.queries()["dedup_near_pairs"](spark, sf_oracle)
    )
    # both verify joins are forced broadcasts of the (bounded) candidate
    # side — the heavy shingle-set profile is never shuffled
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_tfidf_vocabulary_join_not_hinted(spark, sf_oracle):
    df = E.queries()["text_tfidf_top_terms"](spark, sf_oracle)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly ONE broadcast hint (the 1-row corpus count); the vocabulary
    # join must stay hint-free so AQE decides by measured size — a forced
    # broadcast of a 100 TB-corpus vocabulary would OOM the driver
    assert analyzed.count("ResolvedHint") == 1


def test_data_profile_is_single_scan(spark, sf_oracle):
    import re

    plan = _formatted_plan(spark, E.queries()["data_profile"](spark, sf_oracle))
    # one scan of orders feeding the unpivot — profiling must never
    # become a scan per column — and the per-(col, value) distinct
    # collapse must be a HashAggregate (map-side combinable), not the
    # sort-based valueSet fallback of agg(countDistinct x N)
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))
    assert n_scans == 1
    assert "HashAggregate" in plan


def test_inverted_index_stays_hash_aggregated(spark, sf_oracle):
    plan = _formatted_plan(spark, E.queries()["inverted_index"](spark, sf_oracle))
    assert "SortAggregate" not in plan


def test_rolling_window_single_exchange(spark, sf_oracle):
    import re

    plan = _formatted_plan(
        spark, E.queries()["q26_rolling_window"](spark, sf_oracle)
    )
    # one shuffle on the partition key, one running-frame Window — the
    # RANGE frame must evaluate incrementally, never as a re-aggregation
    # join
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 1
    assert len(re.findall(r"^\(\d+\) Window", plan, re.MULTILINE)) == 1
    assert "Join" not in plan


def test_lateral_topn_decorrelates_to_window(spark, sf_oracle):
    plan = _formatted_plan(
        spark, E.queries()["q27_lateral_topn"](spark, sf_oracle)
    )
    # Catalyst must rewrite the correlated LATERAL into a window-rank +
    # join, not execute a subquery per outer row (no nested-loop over
    # the correlated subplan, no cartesian product)
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_no_cartesian_or_row_python_udf_anywhere(spark, sf_smoke):
    # fleet-wide anti-pattern sweep: no query may plan an unpinned
    # cartesian product or a row-at-a-time Python UDF (BatchEvalPython;
    # the sanctioned Pandas kernels compile to ArrowEvalPython)
    for name, fn in sorted(E.queries().items()):
        if name.startswith("stream_"):  # execute eagerly; covered elsewhere
            continue
        plan = _formatted_plan(spark, fn(spark, sf_smoke))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_tempfile_attribution_is_one_shuffle_no_join(
    spark, sf_oracle, monkeypatch
):
    import re

    from rds_pgbadger_etl_spark.plans import _shared

    # bypass the persist cache so the explain shows the full build plan:
    # Spark's CacheManager substitutes cached subtrees by canonicalized
    # plan match, so the module cache AND the session cache must go
    monkeypatch.setattr(
        _shared, "shared_df", lambda spark, name, sf_dir, build: build()
    )
    _shared._CACHE.clear()
    spark.catalog.clearCache()
    plan = _formatted_plan(
        spark, E.queries()["log_tempfile_queries"](spark, sf_oracle)
    )
    # temp-file → query attribution must be the union + per-pid window
    # (header-propagation pattern), never an as-of join: no Join operator
    # at all, and exactly one Window over the pid partition
    assert "Join" not in plan
    assert len(re.findall(r"^\(\d+\) Window", plan, re.MULTILINE)) == 1


def test_pq_encode_stays_hash_aggregated(spark, sf_oracle):
    # packed-bigint argmin keeps the encoder in codegen HashAggregate;
    # min(struct) would fall back to SortAggregate (see similarity.pq_codes)
    plan = _formatted_plan(spark, E.queries()["pq_code_histogram"](spark, sf_oracle))
    assert "SortAggregate" not in plan
    assert "BroadcastHashJoin" in plan  # centroids broadcast, never shuffled


def test_ivfpq_no_cartesian_and_broadcast_luts(spark, sf_oracle):
    plan = _formatted_plan(spark, E.queries()["ann_ivfpq_topk"](spark, sf_oracle))
    assert "CartesianProduct" not in plan
    # probes, LUT and centroid tables are all tiny -> broadcast side
    assert plan.count("BroadcastHashJoin") >= 3


def test_exact_overlap_blocks_before_selfjoin(spark, sf_oracle):
    import re

    plan = _formatted_plan(
        spark, E.queries()["exact_substring_overlap"](spark, sf_oracle)
    )
    assert "CartesianProduct" not in plan
    # The gram-blocking aggregate (count(distinct doc_id) per hash, the
    # df-cap filter's input) must sit BELOW the a<b self-join: formatted
    # explain numbers children before parents, so the blocking agg's node
    # id has to be smaller than the self-join's.
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    agg_ids = [
        int(re.match(r"\((\d+)\)", b).group(1))
        for b in blocks
        if "HashAggregate" in b.splitlines()[0]
        and "count(distinct doc_id" in b
    ]
    join_ids = [
        int(re.match(r"\((\d+)\)", b).group(1))
        for b in blocks
        if "Join" in b.splitlines()[0]
        and re.search(r"Join condition: \(a#\d+L? < b#\d+L?\)", b)
    ]
    assert agg_ids, "gram-blocking count(distinct doc_id) aggregate missing"
    assert join_ids, "a<b self-join missing from plan"
    assert min(agg_ids) < min(join_ids)


def test_semantic_dedup_blocks_on_cells(spark, sf_oracle):
    """SemDeDup's pair join must key on the cluster cell (bounded pair
    count per cell), and the only nested-loop join allowed is the tiny
    centroid broadcast inside the coarse quantizer."""
    plan = _formatted_plan(spark, E.queries()["semantic_dedup"](spark, sf_oracle))
    assert "CartesianProduct" not in plan
    import re

    # every shuffle-pair join must carry cell as a join key
    sm = [b for b in re.split(r"\n(?=\(\d+\) )", plan) if b.startswith("(") and "SortMergeJoin" in b.splitlines()[0]]
    hashj = [b for b in re.split(r"\n(?=\(\d+\) )", plan) if b.startswith("(") and "ShuffledHashJoin" in b.splitlines()[0]]
    for b in sm + hashj:
        keys = "".join(l for l in b.splitlines() if "keys" in l)
        assert "cell" in keys, f"pair join not blocked by cell: {keys}"


def test_quality_deciles_no_global_window(spark, sf_oracle):
    """The shipped quality_deciles plan must not contain a partition-less
    WindowExec (the r4 scale-killer: one task sorting the whole corpus).
    The rank window must be partitioned by the percentile-approx stratum;
    correctness vs the exact global ntile is covered by the oracle."""
    df = E.queries()["quality_deciles"](spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    wlines = [ln for ln in plan.splitlines() if "Window " in ln]
    assert wlines, "expected the per-stratum rank window"
    for ln in wlines:
        assert "stratum" in ln, f"partition-less window survived: {ln.strip()}"
    assert "ntile" not in plan


def test_training_order_window_is_partitioned(spark, sf_oracle):
    """training_order's 100-row position window must also carry a
    partition key (column-derived constant) so no plan in the tree emits
    the single-partition WindowExec warning."""
    df = E.queries()["training_order"](spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    wlines = [ln for ln in plan.splitlines() if "Window " in ln]
    assert wlines
    for ln in wlines:
        # partitioned WindowExec prints [exprs], [partitionSpec], [orderSpec]
        assert ln.count("], [") == 2, f"partition-less window: {ln.strip()}"


def test_runtime_bloom_filter_injected(spark, sf_oracle):
    """q47: when the urgent-orders dim is too big to broadcast and the
    fact scan is large (simulated by zeroing the application-side
    threshold), Spark's InjectRuntimeFilter must build a Bloom filter
    over the dim keys and apply might_contain on the lineitem scan
    BEFORE the shuffle — the 100 TB shuffle-pruning path. At real sf the
    default 10 GB threshold triggers this without any conf change."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = E.queries()["q47_runtime_filter_join"](spark, sf_oracle)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # the filter must sit on the fact (lineitem) side scan
        fact_scan = next(
            ln for ln in plan.splitlines()
            if "might_contain" in ln and "l_orderkey" in ln
        )
        assert fact_scan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)

    # broadcast restored: at oracle scale the dim should just broadcast
    plan = (
        E.queries()["q47_runtime_filter_join"](spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_sketch_rollup_merge_equals_direct(spark, sf_oracle):
    """The re-aggregatability contract behind sketch_rollup_daily: a
    daily estimate produced by MERGING hourly HLL sketches must equal the
    estimate from one sketch built directly over the whole day — at any
    cardinality, not just the coupon-exact range the driver oracle pins.
    (Same lgConfigK on both sides; Datasketches HLL union is lossless for
    equal-k sketches.)"""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.sources.tables import load_table

    merged = E.queries()["sketch_rollup_daily"](spark, sf_oracle)
    ev = load_table(spark, sf_oracle, "events")
    direct = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"))
        ).alias("direct_est"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    j = merged.join(direct, "day").collect()
    assert j, "empty rollup"
    for r in j:
        assert r.est_users == r.direct_est, (
            f"merge broke re-aggregatability on {r.day}: "
            f"{r.est_users} != {r.direct_est}"
        )
        # estimate quality: well inside HLL lgK=12 error at any scale
        assert abs(r.est_users - r.exact_users) <= max(
            2, 0.05 * r.exact_users
        )


def test_sketch_rollup_error_bounded_past_coupon_range(spark, sf_oracle):
    """sketch_rollup_error is the registered bound for the one expected
    divergence of the sf0.1 selfcheck sweep (SELFCHECK_r06_sf01.txt):
    past the HLL coupon-exact range the rollup estimate differs from
    exact COUNT(DISTINCT) within the sketch rsd. Assert the bound both
    at oracle scale (coupon range: rel_err == 0) and on a synthetic
    50k-cardinality day — two orders of magnitude past the coupon range,
    which the sf0.01 oracle gate structurally cannot reach."""
    from pyspark.sql import functions as F

    rows = E.queries()["sketch_rollup_error"](spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 0.02, f"{r.day}: {r.rel_err}"

    midnight = 1_704_067_200  # 2024-01-01 00:00:00 UTC — one calendar day
    users = spark.range(50_000).select(
        F.timestamp_seconds(
            F.lit(midnight) + (F.col("id") % 3) * 3600
        ).alias("ts"),
        F.col("id").alias("user_id"),
    )
    hourly = users.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk")
    )
    est = (
        hourly.groupBy(F.date_trunc("day", "h").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert abs(est - 50_000) / 50_000 <= 0.02


def test_sketch_rollup_partial_aggregation(spark, sf_smoke):
    """The rollup must keep BOTH aggregates partial-capable: map-side
    partial_hll_sketch_agg before the hour exchange (shuffle carries
    hours x fixed-size sketches, not raw events) and partial_hll_union_agg
    before the day exchange. A regression to sort-based or
    non-partial aggregation changes the shuffle volume class at 100 TB."""
    df = E.queries()["sketch_rollup_daily"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_hll_sketch_agg" in plan
    assert "partial_hll_union_agg" in plan
    assert "SortAggregate" not in plan


def test_sketch_state_survives_parquet_roundtrip(spark, sf_oracle, tmp_path):
    """The 100 TB pattern stores the hourly sketch table as parquet and
    merges LATER runs' questions from it. That only works if the sketch
    binary survives a write/read roundtrip bit-compatibly: estimates
    merged from the stored table must equal estimates merged from the
    live aggregation."""
    from pyspark.sql import functions as F

    from rds_pgbadger_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_oracle, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk")
    )
    path = str(tmp_path / "hourly_sketches")
    hourly.write.parquet(path)

    def daily_est(df):
        return {
            r.day: r.est
            for r in df.groupBy(F.date_trunc("day", "h").alias("day"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .collect()
        }

    live = daily_est(hourly)
    stored = daily_est(spark.read.parquet(path))
    assert stored == live and live
