"""Incremental append (LSM generations): queries stay exact before and
after compaction, dedup spans batches, stats refresh correctly."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import append_documents, build_index

from tests.oracle import OracleIndex

N = 800
SPLIT = 500
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)

QUERIES = ["java search", "database index merge", "crawl rank page"]


def oracle_on_union(spark, engine):
    """Oracle over the appended docmap with the ENGINE's docids, so
    scores AND tie-breaks are comparable."""
    rows = (
        engine.spark.read.parquet(f"{engine.index_dir}/docmap")
        .select("docid", "repo", "path", "commit", "lang", "content")
        .collect()
    )
    docs = [r.asDict() for r in sorted(rows, key=lambda r: r["docid"])]
    o = OracleIndex.__new__(OracleIndex)
    # manual init preserving engine docids
    import hashlib
    from collections import defaultdict

    from search_engine_spark.tokenizer import py_tokenize

    o.docmap, o.postings, o.doclen = [], defaultdict(dict), {}
    for d in docs:
        toks = py_tokenize(d["content"])
        did = d["docid"]
        o.doclen[did] = len(toks)
        tf = defaultdict(int)
        for t in toks:
            tf[t] += 1
        for t, c in tf.items():
            o.postings[t][did] = c
        o.docmap.append(d)
    o.n_docs = len(docs)
    o.avgdl = sum(o.doclen.values()) / o.n_docs
    return o


@pytest.fixture(scope="module")
def appended(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_append"))
    all_docs = corpus_df(spark, N, partitions=8).persist()
    # deterministic split on a content-independent key
    docs1 = all_docs.filter(F.xxhash64("repo", "path") % 5 != 0)
    docs2 = all_docs.filter(F.xxhash64("repo", "path") % 5 == 0)
    build_index(spark, docs1, d, CFG)
    m = append_documents(spark, d, docs2)
    assert m["n_new"] > 0
    return SearchEngine(spark, d), m


def test_append_dedup_and_stats(spark, appended):
    eng, m = appended
    dm = spark.read.parquet(f"{eng.index_dir}/docmap")
    shas = [r["content_sha256"] for r in dm.select("content_sha256").collect()]
    assert len(shas) == len(set(shas))  # cross-batch dedup held
    ids = sorted(r["docid"] for r in dm.select("docid").collect())
    assert ids == list(range(len(ids)))  # dense ids continue past base
    assert eng.meta["max_gen"] == 1


def test_append_query_exact(spark, appended):
    eng, _ = appended
    oracle = oracle_on_union(spark, eng)
    for q in QUERIES:
        got = [(r["docid"], r["score"]) for r in eng.search(q, 10).collect()]
        want = oracle.search(q, 10)
        assert [x for x, _ in got] == [x for x, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_compaction_preserves_results(spark, appended, tmp_path_factory):
    eng, _ = appended
    before = {
        q: [(r["docid"], round(r["score"], 9)) for r in eng.search(q, 10).collect()]
        for q in QUERIES
    }
    m = append_documents(
        spark, eng.index_dir, corpus_df(spark, 40, partitions=2), compact=True
    )
    eng2 = SearchEngine(spark, eng.index_dir)
    assert eng2.meta["max_gen"] == 0  # compacted
    seg = spark.read.parquet(f"{eng2.index_dir}/segments")
    per = seg.groupBy("slab", "term").count().filter(F.col("count") > 1)
    assert per.count() == 0  # one chunk per (term, slab)
    oracle = oracle_on_union(spark, eng2)
    for q in QUERIES:
        got = [(r["docid"], r["score"]) for r in eng2.search(q, 10).collect()]
        want = oracle.search(q, 10)
        assert [x for x, _ in got] == [x for x, _ in want], q
