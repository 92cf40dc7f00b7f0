"""Rank-identity of the naive DataFrame scorer vs the pure-Python oracle,
plus dedup invariants and docid determinism (BASELINE.md targets)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.indexer.docmap import build_docmap, dedup_incremental
from search_engine_spark.indexer.postings import (
    build_df_table,
    build_postings,
    build_stats,
)
from search_engine_spark.query.bm25 import search_naive

from tests.oracle import REFERENCE_QUERIES, OracleIndex

N_DOCS = 800


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


@pytest.fixture(scope="module")
def built(spark):
    docs = corpus_df(spark, N_DOCS, partitions=8)
    docmap = build_docmap(docs).cache()
    postings = build_postings(docmap).cache()
    df_table = build_df_table(postings).cache()
    n_docs, avgdl = built_stats = build_stats(docmap).collect()[0]
    return docmap, postings, df_table, float(n_docs), float(avgdl)


def test_dedup_and_sha_invariant(built, oracle):
    docmap = built[0]
    rows = docmap.select("docid", "repo", "path", "commit", "content",
                         "content_sha256", "doclen").collect()
    # unique shas, unique docids, dense range
    shas = [r["content_sha256"] for r in rows]
    assert len(shas) == len(set(shas))
    ids = sorted(r["docid"] for r in rows)
    assert ids == list(range(len(rows)))
    # per-row invariant: sha2(content, 256) equality vs source
    for r in rows:
        assert (
            hashlib.sha256(r["content"].encode()).hexdigest()
            == r["content_sha256"]
        )
    # matches oracle's survivor set and docid assignment exactly
    assert len(rows) == oracle.n_docs
    by_id = {r["docid"]: r for r in rows}
    for od in oracle.docmap:
        r = by_id[od["docid"]]
        assert (r["repo"], r["path"], r["commit"]) == (
            od["repo"], od["path"], od["commit"])
        assert r["doclen"] == od["doclen"]


def test_stats_match(built, oracle):
    _, _, _, n_docs, avgdl = built
    assert n_docs == oracle.n_docs
    assert abs(avgdl - oracle.avgdl) < 1e-9 * oracle.avgdl


def test_rank_identity_vs_oracle(built, oracle):
    _, postings, df_table, n_docs, avgdl = built
    for qid, q in REFERENCE_QUERIES.items():
        got = [
            (r["docid"], r["score"])
            for r in search_naive(postings, df_table, n_docs, avgdl, q, 10).collect()
        ]
        want = oracle.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], f"{qid}: docids differ"
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), f"{qid}: scores differ"


def test_tail_term_query(built, oracle):
    """q11: hottest term + a df=1 tail term (max-skew pair)."""
    _, postings, df_table, n_docs, avgdl = built
    tail = min(
        (t for t, p in oracle.postings.items() if len(p) == 1), default=None
    )
    hot = max(oracle.postings.items(), key=lambda kv: len(kv[1]))[0]
    assert tail is not None, "corpus should contain df=1 anchor terms"
    q = f"{hot} {tail}"
    got = [
        (r["docid"], r["score"])
        for r in search_naive(postings, df_table, n_docs, avgdl, q, 10).collect()
    ]
    want = oracle.search(q, 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_docid_determinism_under_partitioning(spark, built):
    docmap = built[0]
    docs2 = corpus_df(spark, N_DOCS, partitions=3).repartition(7)
    docmap2 = build_docmap(docs2, use_arrow_udf=False)
    a = {(r["repo"], r["path"], r["commit"]): r["docid"]
         for r in docmap.select("repo", "path", "commit", "docid").collect()}
    b = {(r["repo"], r["path"], r["commit"]): r["docid"]
         for r in docmap2.select("repo", "path", "commit", "docid").collect()}
    assert a == b


def test_incremental_dedup_anti_join(spark, built):
    docmap = built[0]
    new = corpus_df(spark, 50, partitions=2)  # subset regenerates same docs
    out = dedup_incremental(new, docmap.select("content_sha256"))
    assert out.count() == 0  # everything already indexed
