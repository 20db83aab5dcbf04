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
