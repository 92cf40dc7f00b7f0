"""bool.must_not exclusion retrieval (engine.search(exclude=...),
search_local(exclude=...), contract.q_bm25_not): brute-force oracle
pin, Spark-vs-serving rank identity, kernel-dispatch coverage (both
the batch WAND loop and the exhaustive dense path must honor the
exclusion set), and edge cases (empty / OOV / all-excluding terms).
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index
from tests.oracle import OracleIndex

N_DOCS = 600
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("notidx"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


# (query, exclude) pairs: hot exclusions (reshape the top-k), rare
# exclusions, multi-term exclusions, and a no-op OOV exclusion.
CASES = [
    ("query parse buffer", "config"),
    ("crawl rank", "python handler"),
    ("util worker", "zzznosuchterm"),
    ("query parse", "query"),  # exclusion term also scored
]


@pytest.mark.parametrize("q,ex", CASES)
def test_engine_not_vs_oracle(engine, oracle, q, ex):
    got = [
        (r["docid"], r["score"])
        for r in engine.search(q, 10, exclude=ex).collect()
    ]
    want = oracle.search_not(q, ex, 10)
    assert [d for d, _ in got] == [d for d, _ in want], (q, ex)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), (q, ex)


@pytest.mark.parametrize("q,ex", CASES)
def test_serving_not_identity(engine, q, ex):
    spark_res = [
        (r["docid"], r["score"])
        for r in engine.search(q, 10, exclude=ex).collect()
    ]
    local_res = engine.search_local(q, 10, exclude=ex)
    assert [d for d, _ in spark_res] == [d for d, _ in local_res]
    for (_, a), (_, b) in zip(spark_res, local_res):
        assert a == pytest.approx(b, rel=1e-12)


def test_excluded_docs_absent(engine, oracle):
    """Every returned doc must genuinely lack every excluded term."""
    ex_terms = ["config", "parse"]
    res = engine.search_local("query buffer rank", 50, exclude="config parse")
    banned = set()
    for t in ex_terms:
        banned |= set(oracle.postings.get(t, {}))
    assert res, "query should still match something"
    assert not ({d for d, _ in res} & banned)


def test_no_exclusion_is_plain_search(engine):
    a = engine.search_local("query parse buffer", 10)
    b = engine.search_local("query parse buffer", 10, exclude="")
    c = engine.search_local("query parse buffer", 10, exclude="zzznope")
    assert a == b == c


def test_exclusion_reshapes_topk(engine, oracle):
    """A hot excluded term must change the result set (guards against
    a silently ignored exclusion)."""
    plain = engine.search_local("query parse buffer", 10)
    excl = engine.search_local("query parse buffer", 10, exclude="config")
    assert plain != excl


def test_kernel_batch_and_exhaustive_paths():
    """Drive slab_topk directly on both dispatch branches with an
    exclusion set; results must equal a numpy brute force."""
    from search_engine_spark.indexer.codec import (
        TermChunk,
        encode_group,
        tf_norm_factor,
    )
    from search_engine_spark.query.wand import slab_topk

    rng = np.random.RandomState(7)
    slab_size, block_size = 512, 32
    chunks, raw = [], {}
    per_term = []
    for ti, df in enumerate([400, 37, 3]):  # dense, mid, sparse terms
        docids = np.sort(rng.choice(slab_size, size=df, replace=False))
        tfs = rng.randint(1, 5, size=df)
        dls = rng.randint(20, 60, size=df)
        per_term.append((ti, docids, tfs, dls))
        raw[ti] = (docids, tfs, dls, 1.0 + ti)
    tc = np.concatenate([np.full(len(d), ti) for ti, d, _, _ in per_term])
    ld = np.concatenate([d for _, d, _, _ in per_term])
    tf_ = np.concatenate([t for _, _, t, _ in per_term])
    dl_ = np.concatenate([x for _, _, _, x in per_term])
    p, s, bm, _, _dfs = encode_group(
        tc, ld, tf_, dl_, len(per_term), block_size, 1.2, 0.75, 40.0
    )
    for ti in range(len(per_term)):
        chunks.append((TermChunk(p[ti], s[ti], bm[ti]), 1.0 + ti))
    excl = np.unique(rng.choice(slab_size, size=100, replace=False))

    def brute(k):
        scores = np.zeros(slab_size)
        for docids, tfs, dls, idf in raw.values():
            scores[docids] += idf * tf_norm_factor(
                tfs.astype(np.float64), dls.astype(np.float64),
                1.2, 0.75, 40.0,
            )
        scores[excl] = 0.0
        ids = np.flatnonzero(scores > 0)
        order = np.lexsort((ids, -scores[ids]))[:k]
        return ids[order], scores[ids][order]

    want_ids, want_sc = brute(10)
    # exhaustive dispatch fires (dense chunk set vs the block grid)
    ids, sc = slab_topk(
        chunks, 0, slab_size, block_size, 10, 1.2, 0.75, 40.0,
        exclude=excl,
    )
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(sc, want_sc, rtol=1e-12)
    # batch WAND path: only the sparse chunks (prune-friendly)
    sparse = chunks[1:]
    scores = np.zeros(slab_size)
    for docids, tfs, dls, idf in list(raw.values())[1:]:
        scores[docids] += idf * tf_norm_factor(
            tfs.astype(np.float64), dls.astype(np.float64), 1.2, 0.75, 40.0
        )
    scores[excl] = 0.0
    ids2 = np.flatnonzero(scores > 0)
    order2 = np.lexsort((ids2, -scores[ids2]))[:10]
    got_ids, got_sc = slab_topk(
        sparse, 0, slab_size, block_size, 10, 1.2, 0.75, 40.0,
        exclude=excl,
    )
    np.testing.assert_array_equal(got_ids, ids2[order2])
    np.testing.assert_allclose(got_sc, scores[ids2][order2], rtol=1e-12)


def test_contract_not_vs_duckdb(spark):
    """Driver-style oracle compare for the contract entry at sf0.001."""
    import duckdb

    from search_engine_spark.contract import q_bm25_not
    from search_engine_spark.oracle.sqlgen import bm25_not_sql

    sf = "/root/testdata/sf0.001"
    sp = q_bm25_not(spark, sf, "key order merge scan", "table", 10).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    du = con.sql(bm25_not_sql("key order merge scan", "table", 10)).df()
    assert sp.reset_index(drop=True).equals(du.reset_index(drop=True))
