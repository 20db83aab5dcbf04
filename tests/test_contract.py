"""Driver-contract guards: properties every registered query must hold.

The driver canonicalizer (pandas sort_values over all columns) crashes
on ARRAY/MAP/STRUCT-valued cells — even on rows-only checks. This broke
q22_sketch_profile in round 1; this test makes the whole class of
regression impossible.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E

# stream_* wrappers execute a real streaming job on build — their
# (scalar) schemas are covered by the oracle-parametrized streaming
# tests; everything else builds lazily and is cheap to scan.
LAZY = sorted(n for n in E.queries() if not n.startswith("stream_"))


@pytest.mark.parametrize("name", LAZY)
def test_query_schema_is_scalar_only(spark, sf_smoke, name):
    df = E.queries()[name](spark, sf_smoke)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        assert not t.startswith(("array", "map", "struct")), (
            f"{name}.{f.name} is {t}: the driver canonicalizer cannot "
            "hash container cells — project to scalar columns"
        )


def test_every_query_has_oracle_or_documented_exception(spark):
    # every query is oracle-checked except the approximate-sketch one,
    # whose exemption is deliberate (approx values differ by design)
    missing = set(E.queries()) - set(E.oracle_sql())
    assert missing == {"q22_sketch_profile"}
