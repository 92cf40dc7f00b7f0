"""The four tokenizer implementations must agree exactly."""

import duckdb
import pandas as pd
import pytest

from search_engine_spark.corpus import corpus_pandas
from search_engine_spark.tokenizer import (
    duckdb_tokens_sql,
    py_tokenize,
    tokenize_query,
    tokenize_series,
    tokens_col,
    tokens_udf_col,
)

SAMPLES = [
    "parse_token_id QueryParserImpl getHTTPResponse2 x 123 ab the and of",
    "def buildIndex(query_parser, token_list):\n    return hash_map.merge(a1)",
    "",
    "UPPER lower MiXeD snake_case_long camelCaseWord ACRONYMWord",
    "a1b2C3 ... !!! \t\n  42 9999999 x_y_z",
    "the quick brown fox jumps over the lazy dog",
    None,
]


def test_py_tokenize_basics():
    assert py_tokenize("QueryParserImpl") == ["query", "parser", "impl"]
    assert py_tokenize("parse_token_id") == ["parse", "token"]
    assert py_tokenize("the and of") == []  # stopwords/short dropped
    assert py_tokenize("12345 foo") == ["foo"]
    assert py_tokenize(None) == []
    assert py_tokenize("x" * 60) == []  # >= 50 chars dropped


def test_query_tokenize_dedups_terms():
    assert tokenize_query("java java java") == ["java"]
    assert tokenize_query("  search   algorithm ") == ["search", "algorithm"]


@pytest.fixture(scope="module")
def texts():
    docs = corpus_pandas(40)["content"].tolist()
    return [t for t in SAMPLES if t is not None] + docs


def test_pandas_series_matches_py(texts):
    got = tokenize_series(pd.Series(texts + [None]))
    want = [py_tokenize(t) for t in texts] + [[]]
    assert list(got) == want


def test_duckdb_matches_py(texts):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"content": texts}))
    sql = f"select {duckdb_tokens_sql('content')} as toks from t"
    got = [list(r[0]) for r in con.sql(sql).fetchall()]
    want = [py_tokenize(t) for t in texts]
    assert got == want


def test_spark_col_and_udf_match_py(spark, texts):
    sdf = spark.createDataFrame(pd.DataFrame({"content": texts}))
    rows = (
        sdf.select(
            tokens_col("content").alias("a"),
            tokens_udf_col("content").alias("b"),
        )
        .collect()
    )
    want = [py_tokenize(t) for t in texts]
    assert [list(r["a"]) for r in rows] == want
    assert [list(r["b"]) for r in rows] == want
