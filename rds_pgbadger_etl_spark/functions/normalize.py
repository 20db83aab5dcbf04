"""Query normalization and log-payload field extraction.

The reference delegates these to pgBadger (invocation at
rds_pgbadger.py:51-63, stderr format + prefix '%t:%r:%u@%d:[%p]:' at
rds_pgbadger.py:56-59); here they are native Spark column expressions
(SURVEY.md §2.2 P3/P4). Everything is built-ins (regexp_replace /
regexp_extract) so the hot path stays inside whole-stage codegen.

``normalize_query`` is literal-insensitive and idempotent (property-tested
in tests/test_logparse.py): two statements differing only in constants
collapse to one normalized form, which is what makes top-N-queries
aggregation meaningful.

Each regex step is mirrored verbatim in the DuckDB oracle
(plans/log_oracle.py) — keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Step regexes (applied in order). Kept as data so the oracle SQL can be
# generated from the same source of truth.
NORMALIZE_STEPS: list[tuple[str, str]] = [
    # quoted string literals (with '' escapes) -> ?
    (r"'(?:[^']|'')*'", "?"),
    # numeric literals -> ?  (after strings, so numbers inside strings are gone)
    (r"\b\d+(?:\.\d+)?\b", "?"),
    # IN (?, ?, ...) lists -> in (...)
    (r"in\s*\(\s*\?\s*(?:,\s*\?\s*)*\)", "in (...)"),
    # collapse whitespace
    (r"\s+", " "),
]

DURATION_RE = r"duration: ([0-9.]+) ms"
# (?s): a reassembled multi-line statement must match across newlines.
# The extended-protocol phases (parse/bind/execute <stmt-name>:) carry
# the statement text too — pgBadger splits prepare/bind/execute timing
# in its report (the reference gets that section via rds_pgbadger.py:51-63),
# so dropping them would under-attribute prepared-statement workloads.
# Anchored at payload start (optionally after the duration prefix), like
# PHASE_RE: an unanchored 'parse|bind' alternative falsely matches error
# prose such as 'could not bind IPv4 address "0.0.0.0": Address already
# in use' and would report the tail as a SQL statement.
STATEMENT_RE = (
    r"(?s)^\s*(?:duration: [0-9.]+ ms\s+)?"
    r"(?:statement|parse [^:\n]*|bind [^:\n]*|execute [^:\n]*): (.*)"
)
# Protocol phase of a duration/statement payload. Anchored at payload
# start (optionally after the 'duration: X ms' prefix) so phase keywords
# inside the SQL text itself can never match.
PHASE_RE = r"(?s)^\s*(?:duration: [0-9.]+ ms\s+)?(statement|parse|bind|execute)\b"


def normalize_query(col: Column | str) -> Column:
    """Collapse literals/whitespace/case so query variants group together."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    for pattern, replacement in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pattern, replacement)
    return F.trim(out)


def normalize_query_oracle_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_query` (same steps, same order)."""
    out = f"lower({expr})"
    for pattern, replacement in NORMALIZE_STEPS:
        pat = pattern.replace("'", "''")
        rep = replacement.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim({out})"


def extract_duration_ms(col: Column | str) -> Column:
    """``duration: 12.345 ms`` -> 12.345 (double), else null."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_extract(c, DURATION_RE, 1)
    return F.when(x == "", None).otherwise(x.cast("double"))


def extract_statement(col: Column | str) -> Column:
    """The SQL text after ``statement:`` / ``parse|bind|execute <name>:``,
    else null."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_extract(c, STATEMENT_RE, 1)
    return F.when(x == "", None).otherwise(x)


def extract_phase(col: Column | str) -> Column:
    """Protocol phase (``statement``/``parse``/``bind``/``execute``) of a
    payload, else null. ``statement`` is the simple protocol; the other
    three are the extended (prepared-statement) protocol whose per-phase
    timing pgBadger reports separately."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_extract(c, PHASE_RE, 1)
    return F.when(x == "", None).otherwise(x)


# pgBadger "Queries by type" buckets (the report section the reference
# produces via its pgbadger invocation, rds_pgbadger.py:51-63): the four
# DML verbs get their own bucket, DDL and transaction-control verbs are
# grouped, everything else (COPY, VACUUM, SET, ...) is OTHER. Kept as
# data so the DuckDB oracle CASE is generated from the same table.
_HEAD_RE = r"^\s*([A-Za-z]+)"
STATEMENT_CLASSES: list[tuple[tuple[str, ...], str]] = [
    (("select",), "SELECT"),
    (("insert",), "INSERT"),
    (("update",), "UPDATE"),
    (("delete",), "DELETE"),
    (("create", "alter", "drop", "truncate"), "DDL"),
    (("begin", "commit", "rollback", "savepoint", "start", "end"), "TCL"),
]


# pgBadger "queries by duration range" buckets, shared by the report
# section (plans/reports.py) and the oracle query (plans/log_oracle.py):
# (bucket index, exclusive upper bound in ms, label).
DURATION_BUCKETS: list[tuple[int, float, str]] = [
    (0, 1, "0-1ms"),
    (1, 5, "1-5ms"),
    (2, 10, "5-10ms"),
    (3, 100, "10-100ms"),
    (4, 1000, "100-1000ms"),
    (5, float("inf"), ">1000ms"),
]


def duration_bucket(col: Column | str, field: int) -> Column:
    """Bucket index (field=0) or label (field=1) for a duration_ms
    column, per :data:`DURATION_BUCKETS`. NULL durations bucket to NULL
    (the unbounded branch guards on isNotNull — an unconditional
    catch-all would silently count duration-less events as >1000ms)."""
    d = F.col(col) if isinstance(col, str) else col
    out = F.lit(None).cast("int" if field == 0 else "string")
    for idx, hi, name in reversed(DURATION_BUCKETS):
        val = idx if field == 0 else name
        cond = d.isNotNull() if hi == float("inf") else (d < hi)
        out = F.when(cond, val).otherwise(out)
    return out


# Error-message templating (pgBadger "most frequent errors"): quoted
# identifiers then bare numbers collapse to placeholders so literal
# variants count as one message.
ERROR_TEMPLATE_STEPS: list[tuple[str, str]] = [
    (r'"[^"]*"', '"?"'),
    (r"\b\d+\b", "?"),
]


def error_template(col: Column | str) -> Column:
    """Normalized error-message template per
    :data:`ERROR_TEMPLATE_STEPS`."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.trim(c)
    for pattern, replacement in ERROR_TEMPLATE_STEPS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def classify_statement(col: Column | str) -> Column:
    """Statement class (SELECT/INSERT/UPDATE/DELETE/DDL/TCL/OTHER) from
    the first keyword; null statements stay null."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.lower(F.regexp_extract(c, _HEAD_RE, 1))
    out = F.lit("OTHER")
    for verbs, label in reversed(STATEMENT_CLASSES):
        out = F.when(head.isin(*verbs), label).otherwise(out)
    return F.when(c.isNull(), None).otherwise(out)


def classify_statement_oracle_sql(expr: str) -> str:
    """DuckDB twin of :func:`classify_statement`."""
    head = f"lower(regexp_extract({expr}, '{_HEAD_RE}', 1))"
    whens = "\n".join(
        f"WHEN {head} IN ({', '.join(repr(v) for v in verbs)}) THEN '{label}'"
        for verbs, label in STATEMENT_CLASSES
    )
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL\n{whens}\nELSE 'OTHER' END"
    )
