"""Aggregate expression helpers.

``exact_sum``/``exact_avg`` make double aggregations *bit-deterministic*
across engines and across partitionings: the per-row double value is cast
to a fixed-scale decimal (deterministic rounding of one IEEE-754 value),
summed exactly in decimal (associative — no floating-point reordering
sensitivity under Spark's partial/map-side aggregation), and only the
final result is cast back to double. A plain ``sum(double)`` is
partition-order dependent, which at 100 TB means run-to-run drift; the
decimal path costs little and keeps both the driver's order-insensitive
value hash and re-runs stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits is enough for the price-like doubles in the corpus.
# 18 total digits keeps the per-value cast on the long-backed Decimal
# fast path (precision <= 18 avoids BigDecimal, ~20% cheaper); Spark
# widens the SUM accumulator to decimal(28,6) on its own, so sum
# headroom is ~1e22 — ample for 100 TB-scale totals.
_DECIMAL = "decimal(18,6)"


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic sum of a double column via exact decimal arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum divided by count (double div)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out


def oracle_exact_sum(expr: str) -> str:
    """DuckDB SQL twin of :func:`exact_sum` (same cast chain, same rounding)."""
    return f"cast(sum(cast(({expr}) as {_DECIMAL})) as double)"


def oracle_exact_avg(expr: str) -> str:
    """DuckDB SQL twin of :func:`exact_avg`."""
    return (
        f"cast(sum(cast(({expr}) as {_DECIMAL})) as double)"
        f" / cast(count({expr}) as double)"
    )
