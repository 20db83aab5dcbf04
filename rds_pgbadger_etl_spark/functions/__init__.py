from rds_pgbadger_etl_spark.functions.scalar import (
    extract_date_from_name,
    hex_hash64,
    order_insensitive_hash,
)
from rds_pgbadger_etl_spark.functions.agg import exact_avg, exact_sum

__all__ = [
    "extract_date_from_name",
    "hex_hash64",
    "order_insensitive_hash",
    "exact_avg",
    "exact_sum",
]
