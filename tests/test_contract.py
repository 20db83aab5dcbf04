"""Driver-contract guards: properties every registered query must hold.

The driver canonicalizer (pandas sort_values over all columns) crashes
on ARRAY/MAP/STRUCT-valued cells — even on rows-only checks. This broke
q22_sketch_profile in round 1; this test makes the whole class of
regression impossible.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E

# stream_* wrappers execute a real streaming job on build — their
# (scalar) schemas are covered by the oracle-parametrized streaming
# tests; everything else builds lazily and is cheap to scan.
LAZY = sorted(n for n in E.queries() if not n.startswith("stream_"))


@pytest.mark.parametrize("name", LAZY)
def test_query_schema_is_scalar_only(spark, sf_smoke, name):
    df = E.queries()[name](spark, sf_smoke)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        assert not t.startswith(("array", "map", "struct")), (
            f"{name}.{f.name} is {t}: the driver canonicalizer cannot "
            "hash container cells — project to scalar columns"
        )


def test_every_query_has_oracle_or_documented_exception(spark):
    # every query is oracle-checked except the approximate-sketch one
    # (approx values differ by design) and the ANN recall audit (a SQL
    # twin would re-implement all four approximate methods — it is
    # rows-only by design, invariant-tested in test_llm_ops instead)
    missing = set(E.queries()) - set(E.oracle_sql())
    assert missing == {
        "q22_sketch_profile",
        "ann_recall_report",
        "sketch_error_report",
        # delivered HLL-rollup error at any sf (the registered bound for
        # past-coupon-range estimates, SELFCHECK_r06_sf01.txt) — the
        # exact twin is literally half its own output; bound pinned by
        # test_plans.test_sketch_rollup_error_bounded_past_coupon_range
        "sketch_rollup_error",
        # recall@10 of the persisted index under first-N vs
        # kmeans-refined quantizers — grades approximation quality like
        # ann_recall_report (a SQL twin would re-implement the index);
        # invariants tested in test_ann_index.py
        "ann_index_refined_recall",
        # the same recall-audit contract for the TWO-LEVEL artifact
        # (prefix vs kmeans-refined quantizers, single-level refined as
        # the same-probe-budget anchor) — rows-only for the same reason;
        # the refined 2-level SEARCH itself is fully oracle-checked
        # (ann_index_2level_refined_topk)
        "ann_index_2level_recall",
        # physical file-layout audit (rows/partition, files/partition)
        # of the persisted index — Spark-side state with no SQL twin;
        # compaction semantics pinned in test_ann_index.py
        "ann_index_stats",
        # the SQ8 grid-drift slice of the same physical audit (OOB code
        # fraction + rows-past-grid) — artifact state with no SQL twin;
        # the drifted-append behavior and retrain rule are pinned in
        # test_ann_index.py::test_sq8_grid_drift_audit_*
        "ann_index_sq8_drift",
        # same layout-audit contract for the dedup signature store;
        # compaction semantics pinned in test_dedup_index.py
        "dedup_index_stats",
        # files a footer-pruning scan reads per (layout, predicate) for
        # the z-ordered vs ts-sorted rewrites — physical footer state
        # with no SQL twin; the z-ordered rewrite's RESULTS are fully
        # oracle-checked (zorder_range_query), and the skipping
        # inequality is pinned in test_layout.py
        "zorder_layout_audit",
    }


def test_oracle_comparator_rejects_wrong_results(spark, sf_smoke):
    # meta-test of the harness: the comparator must FAIL on a result
    # that differs by one value, one row, or one column name — a
    # comparator that can't fail proves nothing about the 93 greens
    import pytest as _pytest

    from rds_pgbadger_etl_spark.sources.tables import load_table
    from tests.oracle import compare

    good = load_table(spark, sf_smoke, "nation").select("n_nationkey", "n_name")
    sql = "SELECT n_nationkey, n_name FROM nation"
    compare(good, sql, sf_smoke)  # sanity: identical passes
    with _pytest.raises(AssertionError):
        compare(good.limit(10), sql, sf_smoke)  # row count
    with _pytest.raises(AssertionError):
        compare(
            good.withColumnRenamed("n_name", "name"), sql, sf_smoke
        )  # column names
    from pyspark.sql import functions as F

    tweaked = good.withColumn(
        "n_nationkey", F.col("n_nationkey") + (F.col("n_nationkey") == 3).cast("int")
    )
    with _pytest.raises(AssertionError):
        compare(tweaked, sql, sf_smoke)  # one value off
