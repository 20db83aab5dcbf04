"""DuckDB-oracle comparator mirroring the driver's t2 correctness check:
row count + column names + order-insensitive value comparison.

Stricter than the driver where possible: numeric columns are compared
exactly (the engine's exact_sum/exact_avg paths are designed to be
bit-identical across engines), with a 1e-9 relative tolerance fallback
reserved for genuinely interpolated values (percentiles).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical cell form: stringify everything except floats
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: str(v))
    key = out.apply(lambda r: tuple(str(x) for x in r), axis=1) if len(out) else None
    if key is not None:
        out = out.loc[key.sort_values().index].reset_index(drop=True)
    return out


def compare(spark_df, oracle_query: str, sf_dir: str, rel_tol: float = 1e-9) -> None:
    got = spark_df.toPandas()
    con = duck_connection(sf_dir)
    want = con.sql(oracle_query).df()
    con.close()

    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-12), (
                    f"{col}[{i}]: spark={a!r} oracle={b!r}"
                )
            else:
                assert str(a) == str(b), f"{col}[{i}]: spark={a!r} oracle={b!r}"
