"""Scalar column expressions.

Native Spark equivalents of the reference's two utility functions
(reference utils.py:7-11 order-insensitive hash; utils.py:14-21 date
extraction with ``'unknown'`` default) plus shared hashing helpers used by
the dedup/similarity operators. All built-ins — no Python UDFs — so they
stay inside whole-stage codegen (SURVEY.md §2.4 engine policy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATE_RE = r"(\d{4}-\d{2}-\d{2})"


def extract_date_from_name(col: Column | str) -> Column:
    """First YYYY-MM-DD in a string, else ``'unknown'``.

    Mirrors reference utils.py:14-21. Spark's ``regexp_extract`` returns
    ``''`` (not null) on no-match, hence the explicit default translation
    (SURVEY.md §2 O17).
    """
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_extract(c, DATE_RE, 1)
    return F.when(x == "", F.lit("unknown")).otherwise(x)


def order_insensitive_hash(col: Column | str) -> Column:
    """Aggregate: MD5 of the sorted string forms of a group's values.

    Permutation-invariant set fingerprint — reference utils.py:7-11
    (``hash_list``), and the same shape as the driver's correctness hash.
    Use inside ``.agg(...)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat_ws("", F.array_sort(F.collect_list(c.cast("string")))))


def hex_hash64(col: Column | str, seed: str = "") -> Column:
    """Deterministic 60-bit integer hash of a string via md5 hex prefix.

    Cross-engine reproducible (DuckDB twin:
    ``cast('0x' || substr(md5(seed || x), 1, 15) as bigint)``), unlike
    Spark's ``xxhash64`` which DuckDB lacks. Used for MinHash/SimHash
    where the oracle must agree bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    seeded = F.concat(F.lit(seed), c) if seed else c
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("bigint")
