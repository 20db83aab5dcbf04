"""Property-based tests (SURVEY.md §5 item 4, via hypothesis).

Each example batches into one small DataFrame so a property run costs a
handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from rds_pgbadger_etl_spark.functions.normalize import normalize_query
from rds_pgbadger_etl_spark.functions.scalar import order_insensitive_hash

_SQLISH = st.text(
    alphabet=st.sampled_from(list("abcXY01 '\",=()<>*.\n\t;")), max_size=60
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_SQLISH, min_size=1, max_size=20))
def test_normalize_is_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["q"])
    out = df.select(
        normalize_query("q").alias("n1"),
        normalize_query(normalize_query("q")).alias("n2"),
    )
    assert out.filter(F.col("n1") != F.col("n2")).count() == 0


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=0, max_value=10**9))
def test_normalize_is_literal_insensitive(spark, a, b):
    df = spark.createDataFrame(
        [
            (f"SELECT * FROM t WHERE x = {a} AND name = 'u{a}'",
             f"SELECT * FROM t WHERE x = {b} AND name = 'u{b}'"),
        ],
        ["qa", "qb"],
    )
    out = df.select(
        normalize_query("qa").alias("na"), normalize_query("qb").alias("nb")
    ).collect()[0]
    assert out.na == out.nb


@settings(max_examples=8, deadline=None)
@given(st.permutations(list(range(8))))
def test_order_insensitive_hash_is_permutation_invariant(spark, perm):
    rows = [(1, v) for v in perm] + [(2, v) for v in sorted(perm)]
    df = spark.createDataFrame(rows, ["g", "v"])
    hashes = {
        r.g: r.h
        for r in df.groupBy("g").agg(order_insensitive_hash("v").alias("h")).collect()
    }
    assert hashes[1] == hashes[2]


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=50, deadline=None)
def test_bmp_roundtrip_any_dims(w, h, seed):
    from rds_pgbadger_etl_spark.operators.multimodal import (
        _bmp_decode_header,
        _bmp_encode,
        _bmp_resize,
    )

    b = _bmp_encode(w, h, seed)
    assert _bmp_decode_header(b) == (w, h, 24)
    # declared file size matches actual byte length (header honesty)
    import struct

    assert struct.unpack_from("<I", b, 2)[0] == len(b)
    r = _bmp_resize(b, 5, 4)
    assert _bmp_decode_header(r) == (5, 4, 24)


@given(
    rate=st.integers(min_value=1000, max_value=48000),
    n=st.integers(min_value=0, max_value=500),
    seed=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_params(rate, n, seed):
    from rds_pgbadger_etl_spark.operators.multimodal import (
        _wav_decode_header,
        _wav_encode,
    )

    b = _wav_encode(rate, n, seed)
    channels, r, bits, samples = _wav_decode_header(b)
    assert (channels, r, bits, samples) == (1, rate, 16, n)
    assert len(b) == 44 + 2 * n


@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=15),
    seed=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=30, deadline=None)
def test_bmp_identity_resize_is_lossless(w, h, seed):
    # nearest-neighbor resize to the SAME dims must reproduce the
    # image byte-for-byte — catches stride/padding/offset bugs in the
    # pixel path that header checks can't see
    from rds_pgbadger_etl_spark.operators.multimodal import (
        _bmp_encode,
        _bmp_resize,
    )

    b = _bmp_encode(w, h, seed)
    assert _bmp_resize(b, w, h) == b


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["statement", "parse", "bind", "execute"]),
            st.text(alphabet=st.sampled_from(list("abcXY01 _$")), max_size=12),
            _SQLISH.filter(lambda s: s.strip() != ""),
            st.integers(min_value=0, max_value=99999),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_phase_and_statement_extraction_roundtrip(spark, cases):
    """Constructed 'duration: N ms  <marker>: <sql>' payloads round-trip
    through extract_phase/extract_statement/extract_duration_ms for every
    protocol phase — including statement names containing spaces and $."""
    from rds_pgbadger_etl_spark.functions.normalize import (
        extract_duration_ms,
        extract_phase,
        extract_statement,
    )

    rows = []
    for phase, name, sql, ms in cases:
        marker = phase if phase == "statement" else f"{phase} {name.replace(':', '')}"
        rows.append((f"duration: {ms} ms  {marker}: {sql}", phase, sql, ms))
    df = spark.createDataFrame(
        [(p,) for p, *_ in rows], "payload string"
    ).select(
        extract_phase("payload").alias("ph"),
        extract_statement("payload").alias("stmt"),
        extract_duration_ms("payload").alias("ms"),
    )
    got = df.collect()
    for r, (_, phase, sql, ms) in zip(got, rows):
        assert r.ph == phase
        assert r.stmt == sql
        assert r.ms == float(ms)
