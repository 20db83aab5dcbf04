"""Parquet table catalog over the driver-generated testdata layout.

The reference plans over a tiny "catalog of files" fetched from the RDS
API (rds_pgbadger.py:86-93); here the equivalent is Spark's parquet file
source, which gives partition pruning, predicate pushdown and column
pruning for free (SURVEY.md §1.3, §4).

Schemas are declared explicitly (engine policy, SURVEY.md §1.3: explicit
StructType per table; inference only for ad-hoc reads) so a scan never
depends on footer sampling and the oracle comparison sees stable types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast when joined to a fact.
BROADCASTABLE = {"region", "nation", "customer", "supplier", "part"}

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts: the testdata has shipped BOTH parquet TIMESTAMP(MICROS) and
    # INT64 TIMESTAMP(NANOS) across rounds, so load_table sniffs the
    # footer type and branches (see events_ts_is_native_timestamp). This
    # declared schema is the native-timestamp variant; _EVENTS_NS_SCHEMA
    # is the nanos-as-long one (needs spark.sql.legacy.parquet.nanosAsLong
    # plus a ns→µs conversion because Spark has no ns timestamp).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


_EVENTS_NS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw int64 nanoseconds
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Footer-sniff / era-guard caches, keyed by parquet path (+ column).
# Driver-side only; one footer read + one single-column min/max scan per
# key per process.
_EVENTS_TS_NATIVE: dict[str, bool] = {}
_ERA_OK: set[tuple[str, str]] = set()

# The events corpus era is 2024-01; anything outside [2000, 2100) means a
# unit bug (e.g. µs interpreted as ns compresses 30 days into ~2.6 s of
# 1970). Other timestamp columns (orders/lineitem, 1995–2001 era) get a
# wider floor that still catches the 1000×-into-1970 compression class.
_ERA_MIN = "2000-01-01"
_ERA_MAX = "2100-01-01"
_TS_GUARDS: dict[str, tuple[str, str, str]] = {
    "events": ("ts", _ERA_MIN, _ERA_MAX),
    "orders": ("o_orderdate", "1980-01-01", _ERA_MAX),
    "lineitem": ("l_shipdate", "1980-01-01", _ERA_MAX),
}


def events_ts_is_native_timestamp(spark: SparkSession, path: str) -> bool:
    """True if the parquet footer types ``ts`` as a logical timestamp that
    Spark can read natively (µs/ms); False for int64-nanoseconds (which,
    under ``spark.sql.legacy.parquet.nanosAsLong``, infers as LongType and
    needs an explicit ns→µs conversion).

    The testdata's physical type for events.ts has changed between rounds
    (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)); sniffing the footer instead of
    assuming a unit keeps either variant correct.
    """
    if path not in _EVENTS_TS_NATIVE:
        inferred = spark.read.parquet(path).schema["ts"].dataType
        _EVENTS_TS_NATIVE[path] = isinstance(
            inferred, (T.TimestampType, T.TimestampNTZType)
        )
    return _EVENTS_TS_NATIVE[path]


def _assert_ts_era(df: DataFrame, path: str, col: str, lo_min: str, hi_max: str) -> None:
    """Loud schema-drift guard: fail at first read if timestamps land
    outside the corpus era — a silent unit mix-up (ns↔µs is a 1000×
    compression into 1970) must never ship as "green with weird results".

    Bounds are compared as parsed dates (not lexicographic strings), and
    ``SPARK_GRAFT_ERA_GUARD=warn`` downgrades the hard failure to a loud
    warning so a legitimately different corpus era can still be read while
    the guard bounds get updated.
    """
    if (path, col) in _ERA_OK:
        return
    import datetime
    import os
    import warnings

    from pyspark.sql import functions as F

    row = df.select(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = row["lo"], row["hi"]
    if lo is not None:
        lo_bound = datetime.date.fromisoformat(lo_min)
        hi_bound = datetime.date.fromisoformat(hi_max)

        def as_date(v: object) -> datetime.date:
            if isinstance(v, datetime.datetime):
                return v.date()
            if isinstance(v, datetime.date):
                return v
            # Schema drift can hand back a STRING min/max (e.g. a ts
            # column read as string) — exactly what this guard exists
            # for, so coerce instead of dying on a bare TypeError.
            try:
                return datetime.date.fromisoformat(str(v)[:10])
            except ValueError as exc:
                raise ValueError(
                    f"{col} era guard: cannot interpret {v!r} as a "
                    f"date for {path} — column type drifted"
                ) from exc

        if not (lo_bound <= as_date(lo) and as_date(hi) < hi_bound):
            msg = (
                f"{col} era guard: min={lo} max={hi} outside "
                f"[{lo_min}, {hi_max}) for {path} — parquet timestamp unit "
                "mismatch (ns vs µs)? Check events_ts_is_native_timestamp. "
                "Set SPARK_GRAFT_ERA_GUARD=warn to read anyway."
            )
            if os.environ.get("SPARK_GRAFT_ERA_GUARD", "error") == "warn":
                warnings.warn(msg, stacklevel=2)
            else:
                raise ValueError(msg)
    _ERA_OK.add((path, col))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table with its declared schema."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; know {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        if events_ts_is_native_timestamp(spark, path):
            df = spark.read.schema(SCHEMAS["events"]).parquet(path)
        else:
            from pyspark.sql import functions as F

            df = spark.read.schema(_EVENTS_NS_SCHEMA).parquet(path)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.schema(SCHEMAS[name]).parquet(path)
    if name in _TS_GUARDS:
        _assert_ts_era(df, path, *_TS_GUARDS[name])
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table; keys match the oracle's pre-registered view names."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register tables as temp views (for the SQL-surface queries)."""
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def rebalance(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the plan has fewer input partitions
    than the session's parallelism.

    Compute-amplifying operators (shingle explode ×~300, per-row vector
    math, regex log-line synthesis) call this so one small parquet file
    doesn't serialize the whole stage — measured 60× on the sf0.1
    MinHash aggregate (7.6 s → 0.12 s on 8 cores). At real scale the
    input already carries ≥ cores splits and this is a no-op, so no
    shuffle is added where the file source parallelizes naturally.
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
