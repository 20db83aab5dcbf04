"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Generalizes the reference-surface session pairing (SURVEY.md §2.2 P10 —
pgBadger pairs connect/disconnect per pid; invocation site reference
rds_pgbadger.py:51-63) into the operator Spark itself lacks. Used for
"last statement before this error", "last config change before this
query", as-of price/feature lookups, etc.

Scale design: the naive formulation is a range join (O(n·m) per key, a
BroadcastNestedLoopJoin at worst). This implementation is the merge
formulation instead: tag both sides, union, ONE window pass per key —
a single shuffle on the key, linear work per partition, no range join.
Skewed keys fall under the same AQE/salting story as any window; the
window frame is running (UNBOUNDED PRECEDING..CURRENT ROW), which Spark
evaluates streamingly — no per-key buffering of the whole group.

Determinism: rows order by (_t, _side, _tb) — right rows sort before
left rows at equal timestamps (inclusive as-of), and ``tiebreak`` picks
the winner among right rows sharing a timestamp. The matched columns
come from ONE ``last`` over a packed struct, so they always belong to
the same right row even if some payload values are null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    prefix: str = "prev_",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Attach ``prefix+c`` for each ``c`` in ``right_cols`` (from the
    latest right row with ``right_ts <= left_ts``, same ``by`` key;
    nulls when no prior right row exists).

    ``tolerance_sec`` bounds the lookback: a match older than the
    tolerance yields nulls (the standard as-of tolerance semantics —
    stale lookups are worse than missing ones). Implemented as a
    post-filter on the matched timestamp carried in the packed struct,
    so the plan is unchanged: still one union + one window pass."""
    right_ts = right_ts or left_ts
    right_cols = right_cols or [
        c for c in right.columns if c not in by and c != right_ts
    ]

    r_struct = F.struct(
        *[F.col(c) for c in right_cols],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_type = left.select(l_struct.alias("_l")).schema["_l"].dataType

    tb = (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long")
    r2 = right.select(
        *by,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        r_struct.alias("_r"),
        F.lit(None).cast(l_type).alias("_l"),
    )
    l2 = left.select(
        *by,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None).cast(r_type).alias("_r"),
        l_struct.alias("_l"),
    )

    w = (
        Window.partitionBy(*by)
        .orderBy("_t", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r2.unionByName(l2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_sec is not None:
        in_tol = (
            F.col("_t").cast("double") - F.col("_m._rts").cast("double")
        ) <= F.lit(float(tolerance_sec))
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m"))
        )
    return matched.select(
        "_l.*",
        *[F.col(f"_m.{c}").alias(prefix + c) for c in right_cols],
    )
