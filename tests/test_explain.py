"""ES explain API (engine.explain / explain_local): the per-term
breakdown must sum to the document's search() score, agree between
the Spark and serving paths, and match a brute-force recomputation.
"""

from __future__ import annotations

import math

import pytest

from search_engine_spark.config import BM25_B, BM25_K1, EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index
from tests.oracle import OracleIndex

N_DOCS = 500
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)
Q = "query parse buffer"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("explidx"))
    build_index(spark, corpus_df(spark, N_DOCS, partitions=8), d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


def test_explain_sums_to_search_score(engine):
    hits = engine.search_local(Q, 5)
    for docid, score in hits:
        rows = engine.explain_local(Q, docid)
        assert rows, docid
        assert sum(c for *_, c in rows) == pytest.approx(score, rel=1e-12)
        sp = [
            (r["term"], int(r["tf"]), int(r["df"]), float(r["idf"]),
             float(r["tfn"]), float(r["contribution"]))
            for r in engine.explain(Q, docid).collect()
        ]
        assert [r[0] for r in sp] == [r[0] for r in rows]
        for a, b in zip(sp, rows):
            assert a[1] == b[1] and a[2] == b[2]
            for x, y in zip(a[3:], b[3:]):
                assert x == pytest.approx(y, rel=1e-12)


def test_explain_vs_brute(engine, oracle):
    docid = engine.search_local(Q, 1)[0][0]
    rows = engine.explain_local(Q, docid)
    n, avgdl = float(oracle.n_docs), oracle.avgdl
    dl = oracle.doclen[docid]
    for term, tf, df, idf, tfn, contrib in rows:
        assert tf == oracle.postings[term][docid]
        assert df == len(oracle.postings[term])
        assert idf == pytest.approx(
            math.log1p((n - df + 0.5) / (df + 0.5)), rel=1e-12
        )
        assert tfn == pytest.approx(
            tf * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)),
            rel=1e-12,
        )
        assert contrib == pytest.approx(idf * tfn, rel=1e-12)


def test_explain_nonmatching_doc_is_empty(engine, oracle):
    # a doc containing none of the query terms explains to zero rows
    match = set()
    for t in Q.split():
        match |= set(oracle.postings.get(t, {}))
    non = next(d for d in range(oracle.n_docs) if d not in match)
    assert engine.explain_local(Q, non) == []
    assert engine.explain(Q, non).count() == 0
