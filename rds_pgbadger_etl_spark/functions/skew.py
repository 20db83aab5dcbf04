"""Skew-handling utilities (SURVEY.md §7 phase 5 hardening).

AQE's skew-join splitting handles most cases at runtime; these are the
explicit tools for the two shapes AQE cannot fix:

- ``salted_count_distinct``: a plain ``countDistinct`` keeps every
  distinct value of a hot group in ONE reducer's hash set. Hash-bucketing
  the *values* splits that state across ``n_salt`` reducers, exactly
  (each distinct value lands in one bucket, so the bucket-distinct counts
  sum to the true distinct count).
- ``salted_join``: a broadcast-ineligible join where one key dominates
  puts the whole hot key in one task. Salting the probe side and
  replicating the build side ``n_salt``× spreads the hot key over
  ``n_salt`` tasks at the cost of an ``n_salt``× bigger build input —
  use for the few identified hot keys, not as a default.

Both are deterministic (salts derive from content hashes, not random),
so results are identical run-to-run and partition-layout-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salt: int = 64,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact distinct count per group in two balanced hash aggregates."""
    salt = F.pmod(F.hash(distinct_col), F.lit(n_salt)).alias("_salt")
    per_bucket = df.groupBy(*group_cols, salt).agg(
        F.countDistinct(distinct_col).alias("_part")
    )
    return per_bucket.groupBy(*group_cols).agg(F.sum("_part").alias(alias))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Inner/left join with the probe side salted and the build side
    replicated, so one hot key spreads over ``n_salt`` tasks.

    ``salt_by`` names a left column whose hash picks the salt; it must
    not be a join key — a key-derived salt is constant within the hot
    key, so every hot row would still land in ONE task (a silent no-op
    exactly where salting was needed). When unset, the first non-key
    left column is used; if the left side has only key columns this
    raises rather than degenerate.
    """
    if salt_by is not None and salt_by in on:
        raise ValueError(
            f"salt_by={salt_by!r} is a join key: a key-derived salt is "
            "constant per key and cannot split the hot key across tasks"
        )
    non_key = [c for c in left.columns if c not in on]
    if salt_by is None and not non_key:
        raise ValueError(
            "salted_join needs a non-key left column to derive the salt "
            f"from (left columns {left.columns} are all join keys); pass "
            "salt_by= a high-cardinality column"
        )
    salt_src = salt_by or non_key[0]
    l2 = left.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salt)))
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l2.join(r2, [*on, "_salt"], how).drop("_salt")


def heavy_hitters(
    df: DataFrame, key_cols: list[str], threshold_ratio: float = 0.01
) -> DataFrame:
    """Diagnostic: keys holding more than ``threshold_ratio`` of all rows
    (the keys worth salting). One aggregate + a scalar subquery-free
    total via a window-less cross count."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("ratio", F.col("n_rows") / F.lit(float(total)))
        .filter(F.col("ratio") > threshold_ratio)
        .orderBy(F.col("n_rows").desc(), *key_cols)
    )
