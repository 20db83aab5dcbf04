"""rds_pgbadger_etl_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
yoyowallet/rds-pgbadger-etl (a Luigi ETL that feeds RDS PostgreSQL logs to
pgBadger; see SURVEY.md) as an idiomatic Spark engine:

- ``sources``   : table/log-file catalogs and readers (reference
                  rds_pgbadger.py:86-129 — listing, pruning, top-K select).
- ``operators`` : log parsing/reassembly, dedup, similarity, text analysis.
- ``functions`` : scalar/aggregate column expressions (reference
                  utils.py:7-21 equivalents plus normalization).
- ``plans``     : report-shaped queries (the pgBadger analytics surface,
                  reference rds_pgbadger.py:51-63) and relational core.
- ``streaming`` : incremental ingestion replacing Luigi-target memoization
                  (reference rds_pgbadger.py:25-26,44-45,70-71).
- ``sinks``     : partitioned report writers (reference rds_pgbadger.py:14-31).
"""

__version__ = "0.1.0"
