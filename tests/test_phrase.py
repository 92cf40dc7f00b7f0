"""Phrase (match_phrase) retrieval: scan/positional parity, a pure-
Python tf oracle, edge shapes, and the DuckDB twin on a synthetic
corpus (query/phrase.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.query import phrase as PH
from search_engine_spark.tokenizer import py_tokenize

DOCS = [
    # (docid, text) — tokens after py_tokenize are the lowercase words
    (0, "hash table hash table hash"),          # "hash table" x2, "table hash" x2
    (1, "table hash join"),                     # "table hash" x1
    (2, "hash join table"),                     # adjacency broken
    (3, "aaa aaa aaa aaa"),                     # overlapping runs
    (4, "table"),                               # shorter than the phrase
    (5, "join merge scan table hash table hash"),
    (6, ""),                                    # empty doc
]


def py_phrase_tf(tokens: list[str], terms: list[str]) -> int:
    n = len(terms)
    return sum(
        1
        for i in range(len(tokens) - n + 1)
        if tokens[i : i + n] == terms
    )


@pytest.fixture(scope="module")
def tl(spark):
    rows = [(d, t, py_tokenize(t)) for d, t in DOCS]
    df = spark.createDataFrame(
        rows, "docid long, text string, toks array<string>"
    ).withColumn("doclen", F.size("toks"))
    df = df.cache()
    df.count()
    return df


PHRASES = [
    ["table", "hash"],
    ["hash", "table", "hash"],   # duplicate term at two offsets
    ["aaa", "aaa"],              # overlapping occurrences count each start
    ["table"],                   # single term
    ["join", "zzz"],             # no match anywhere
]


@pytest.mark.parametrize("terms", PHRASES, ids=["-".join(p) for p in PHRASES])
def test_scan_matches_python_reference(tl, terms):
    got = {
        r["docid"]: r["ptf"]
        for r in PH.phrase_matches_scan(tl, terms).collect()
    }
    want = {
        d: py_phrase_tf(py_tokenize(t), terms)
        for d, t in DOCS
        if py_phrase_tf(py_tokenize(t), terms) > 0
    }
    assert got == want


@pytest.mark.parametrize("terms", PHRASES, ids=["-".join(p) for p in PHRASES])
def test_positional_matches_scan(tl, terms):
    scan = sorted(
        map(tuple, PH.phrase_matches_scan(tl, terms)
            .select("docid", "doclen", "ptf").collect())
    )
    pos = sorted(
        map(tuple, PH.phrase_matches_positional(
            PH.positional_postings(tl, terms), terms)
            .select("docid", "doclen", "ptf").collect())
    )
    assert pos == scan


def test_overlapping_counts_each_start(tl):
    # "aaa aaa aaa aaa" has 3 starts for the bigram, 2 for the trigram
    got = {
        r["docid"]: r["ptf"]
        for r in PH.phrase_matches_scan(tl, ["aaa", "aaa"]).collect()
    }
    assert got == {3: 3}
    got3 = {
        r["docid"]: r["ptf"]
        for r in PH.phrase_matches_scan(tl, ["aaa", "aaa", "aaa"]).collect()
    }
    assert got3 == {3: 2}


def test_short_doc_guard(tl):
    # docs shorter than the phrase (incl. the empty doc) never match
    # and never error on the sequence() bounds
    got = PH.phrase_matches_scan(
        tl, ["table", "hash", "join", "merge", "scan", "key", "row"]
    ).collect()
    assert got == []


def test_topk_score_value(tl):
    """Hand-computed BM25 pseudo-term score for 'table hash'."""
    res = PH.phrase_topk(
        PH.phrase_matches_scan(tl, ["table", "hash"]), tl, 10
    ).collect()
    # matches: doc0 ptf=2, doc1 ptf=1, doc5 ptf=2
    n_docs, dfp = 7.0, 3.0
    avgdl = sum(len(py_tokenize(t)) for _, t in DOCS) / n_docs
    idf = math.log1p((n_docs - dfp + 0.5) / (dfp + 0.5))

    def s(ptf, dl):
        return round(
            idf * (ptf * (BM25_K1 + 1.0)
                   / (ptf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))),
            4,
        )

    want = sorted(
        [
            (0, s(2, 5)),
            (1, s(1, 3)),
            (5, s(2, 7)),
        ],
        key=lambda r: (-r[1], r[0]),
    )
    assert [(r["docid"], r["score"]) for r in res] == want


def test_duckdb_twin_on_synthetic(spark, tl, tmp_path):
    """The generated oracle SQL and both Spark forms agree on a table
    DuckDB reads itself (same compare the driver does)."""
    duckdb = pytest.importorskip("duckdb")
    from search_engine_spark.oracle.sqlgen import bm25_phrase_sql

    pdf = tl.select(
        F.col("docid").alias("doc_id"), "text"
    ).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for phrase in ("table hash", "hash table hash", "join zzz", "table"):
        want = con.sql(bm25_phrase_sql(phrase, 10)).df()
        terms = py_tokenize(phrase)
        got = (
            PH.phrase_topk(PH.phrase_matches_scan(tl, terms), tl, 10)
            .toPandas()
        )
        got_ix = (
            PH.phrase_topk(
                PH.phrase_matches_positional(
                    PH.positional_postings(tl, terms), terms
                ),
                tl,
                10,
            ).toPandas()
        )
        for g in (got, got_ix):
            assert list(g.columns) == list(want.columns)
            assert g["docid"].tolist() == want["docid"].tolist(), phrase
            assert g["score"].tolist() == want["score"].tolist(), phrase
