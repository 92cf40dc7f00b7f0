"""Local rehearsal of the driver's correctness gate: every queries()
entry must match its oracle_sql() twin on DuckDB — row counts, schema
(column names), and exact values after column/row sorting."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def assert_frames_match(name, spark_pdf, duck_pdf):
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: schema mismatch"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (
                    (pd.isna(x) and pd.isna(y))
                    or x == y
                    or math.isclose(x, y, rel_tol=0, abs_tol=0)
                )
                assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["docid", "score"]


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    spark_pdf = q(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL op)
        return
    duck_pdf = con.sql(sql).df()
    assert_frames_match(name, spark_pdf, duck_pdf)
