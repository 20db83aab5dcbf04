"""Process-wide shared materialization of intermediate DataFrames.

Several oracle queries branch off the same expensive intermediate (the
parsed log corpus, the MinHash near-dup pairs, the synthesized file
catalog). Recomputing it per query is the diamond-DAG recomputation
problem at query-set level: at 100 TB the parsed/deduped intermediate is
a *staging table* written once and read by every report query (exactly
the reference's per-file report artifact split into sections,
rds_pgbadger.py:44-45). In-session the equivalent is persist() shared
across the `queries()` callables.

Keyed by (applicationId, name, sf_dir) so a new SparkSession never sees
a stale handle; entries live for the process (bench / driver / tests are
all short-lived single-session processes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def shared_df(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Build-once, persist, and reuse a DataFrame across queries."""
    key = (spark.sparkContext.applicationId, name, sf_dir)
    df = _CACHE.get(key)
    if df is None:
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = df
    return df
