"""Behavioral / product-analytics queries over the events stream: funnel
conversion, retention cohorts, and the event-transition matrix. The
standard event-analytics surface next to the relational spine — each is
one or two hash aggregates plus at most one window, shuffling only
(user, bucket)-grade tuples, so every plan scales with distinct users,
not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Funnel: signup → purchase within 24h of the user's FIRST signup. The
# min-per-type aggregate collapses the event stream to one row per user
# before any comparison — the funnel is computed on user-grain data, so
# the only shuffle carries (user, first_signup, first_purchase_after).
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    # first purchase AT/AFTER the first signup: the conditional min
    # needs the signup time, hence the join back — the signup side is
    # user-grain and broadcast-eligible
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        purchases.join(signups, "user_id")
        .filter(F.col("p_ts") >= F.col("first_signup"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    out = signups.join(conv, "user_id", "left")
    return out.agg(
        F.count(F.lit(1)).alias("n_signed_up"),
        F.count("first_purchase").alias("n_converted"),
        F.count(
            F.when(
                F.col("first_purchase").cast("long")
                - F.col("first_signup").cast("long")
                <= 86400,
                1,
            )
        ).alias("n_converted_24h"),
    )


_FUNNEL_SQL = """
WITH signups AS (
  SELECT user_id, min(ts) AS first_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
  SELECT p.user_id, min(p.ts) AS first_purchase
  FROM events p JOIN signups s
    ON p.user_id = s.user_id AND p.ts >= s.first_signup
  WHERE p.event_type = 'purchase'
  GROUP BY p.user_id
)
SELECT count(*) AS n_signed_up,
       count(first_purchase) AS n_converted,
       cast(count(CASE WHEN epoch(first_purchase) - epoch(first_signup)
                            <= 86400 THEN 1 END) AS bigint)
         AS n_converted_24h
FROM signups s LEFT JOIN conv USING (user_id)
"""


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen week × weeks-since-
# cohort in which they were active. Two aggregates: first-seen per user
# (user-grain), then distinct users per (cohort_week, week_offset) —
# the cohort matrix itself is tiny (weeks²).
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (
                (
                    F.col("active_week").cast("long")
                    - F.col("cohort_week").cast("long")
                )
                / (7 * 86400)
            ).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_RETENTION_SQL = """
WITH first_seen AS (
  -- cast: DuckDB date_trunc('week') yields DATE; Spark yields TIMESTAMP
  SELECT user_id, cast(date_trunc('week', min(ts)) AS timestamp)
           AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, cast(date_trunc('week', ts) AS timestamp)
           AS active_week
  FROM events
)
SELECT f.cohort_week,
       cast((epoch(a.active_week) - epoch(f.cohort_week))
            / (7 * 86400) AS int) AS week_offset,
       cast(count(DISTINCT a.user_id) AS bigint) AS n_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Event-transition matrix: counts of (event_type → next event_type) per
# user timeline — the Markov-chain view of user behavior. One window
# (lead over the user's ordered events; ties broken by event_id for a
# deterministic sequence) + one hash aggregate.
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


_TRANSITIONS_SQL = """
SELECT from_type, to_type, count(*) AS n_transitions FROM (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
) WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# Per-user EWMA of event value — a true recurrence (y_t depends on
# y_{t-1}), the one aggregation shape Spark's built-ins cannot express:
# there is no recursive window frame. This is the engine's canonical
# JUSTIFIED grouped-map Pandas UDF (policy: built-ins for everything
# expressible; Arrow-batched pandas for genuine recurrences): one
# shuffle on user_id, each group folds sequentially in C (pandas ewm),
# state is O(1) per group. The closed form Σ v_i(1-α)^(n-i) / Σ(1-α)^(n-i)
# IS SQL-expressible at bounded partition length — the oracle uses it —
# but (1-α)^(-i) overflows for long partitions, so the recurrence is the
# form that survives 100 TB timelines; the oracle cross-checks both.
EWMA_ALPHA = 0.1


def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    # secondary-sort shape: hash-partition by user, sort each partition
    # by (user, ts, event_id), then ONE pandas call per PARTITION that
    # folds all of its (contiguous) user groups — ~cores Python
    # invocations instead of one per user (measured ~3x on the bench;
    # per-group applyInPandas pays its Arrow round-trip per user).
    # Partitions are sized to fit memory by doctrine
    # (maxPartitionBytes); a beyond-memory timeline would carry the
    # (numerator, denominator) recurrence state across chunks instead
    # of concatenating.
    def ewma_partition(it):
        pdfs = [pdf for pdf in it]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        g = pdf.groupby("user_id", sort=False)
        last = g["value"].apply(
            lambda s: s.ewm(alpha=EWMA_ALPHA, adjust=True).mean().iloc[-1]
        )
        yield pd.DataFrame(
            {
                "user_id": last.index.to_numpy().astype("int64"),
                "n_events": g.size().to_numpy().astype("int64"),
                "ewma_value": np.round(last.to_numpy(), 6),
            }
        )

    return (
        ev.select("user_id", "ts", "event_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            ewma_partition, "user_id long, n_events long, ewma_value double"
        )
    )


# adjust=True EWMA closed form: weights (1-α)^(n-1-i) over the ordered
# values, normalized. The per-user index comes from one row_number.
_EWMA_SQL = f"""
WITH ordered AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, n AS n_events,
       round(sum(value * pow(1 - {EWMA_ALPHA}, n - i))
             / sum(pow(1 - {EWMA_ALPHA}, n - i)), 6) AS ewma_value
FROM ordered
GROUP BY user_id, n
"""


# ---------------------------------------------------------------------------
# 7-day rolling distinct active users. Distinct counts don't sum across
# days, so the window can't be a running total over daily aggregates.
# Plan: distinct (user, day) → map-side ×7 explode of the days each
# activity covers → one count-distinct per covered day, restricted to
# days that exist in the corpus. Two shuffles total, no self-join, no
# per-day re-scan — at scale the explode factor is the window length,
# independent of corpus size. (The approximate alternative at 100 TB is
# per-day HLL sketches merged over the window — q22 shows that path.)

_ROLLING_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    covered = du.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_ROLLING_DAYS - 1)),
                lambda i: F.date_add(F.col("d"), i),
            )
        ).alias("day"),
    )
    days = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    return (
        covered.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.col("day").cast("timestamp").alias("day"), "active_7d")
    )


_ROLLING_ACTIVE_SQL = f"""
WITH du AS (
  SELECT DISTINCT user_id, cast(date_trunc('day', ts) AS date) AS d
  FROM events
),
covered AS (
  SELECT user_id, d + cast(i AS int) AS day
  FROM du, unnest(range(0, {_ROLLING_DAYS})) AS t(i)
),
days AS (
  SELECT DISTINCT cast(date_trunc('day', ts) AS date) AS day FROM events
)
SELECT cast(day AS timestamp) AS day,
       cast(count(DISTINCT user_id) AS bigint) AS active_7d
FROM covered JOIN days USING (day)
GROUP BY day
"""


QUERIES = {
    "funnel_conversion": (funnel_conversion, _FUNNEL_SQL),
    "retention_cohorts": (retention_cohorts, _RETENTION_SQL),
    "event_transitions": (event_transitions, _TRANSITIONS_SQL),
    "user_value_ewma": (user_value_ewma, _EWMA_SQL),
    "rolling_active_users": (rolling_active_users, _ROLLING_ACTIVE_SQL),
}
