"""ES terms-aggregation facets (engine.facet_counts) and
more_like_this (engine.more_like_this): brute-force oracle pins,
Spark-vs-serving identity, tombstone interaction, and the MLT
term-selection rule (tf·idf desc, term asc, capped).
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


@pytest.fixture()
def engine(spark, tmp_path):
    d = str(tmp_path / "facidx")
    build_index(spark, corpus_df(spark, N_DOCS, partitions=8), d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


def _facet_brute(oracle, q, field, size, dropped=()):
    from search_engine_spark.tokenizer import tokenize_query

    match = set()
    for t in tokenize_query(q):
        match |= set(oracle.postings.get(t, {}))
    match -= set(dropped)
    counts: dict[str, int] = {}
    for d in match:
        v = oracle.docmap[d][field]
        counts[v] = counts.get(v, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:size]


@pytest.mark.parametrize("q", ["query parse buffer", "config"])
def test_facets_vs_brute_and_serving(engine, oracle, q):
    want = _facet_brute(oracle, q, "lang", 5)
    got = [
        (r["lang"], int(r["cnt"]))
        for r in engine.facet_counts(q, "lang", 5).collect()
    ]
    assert got == want, q
    assert engine.facet_counts_local(q, "lang", 5) == want, q
    # a second field exercises the per-field serving cache
    wr = _facet_brute(oracle, q, "repo", 8)
    assert engine.facet_counts_local(q, "repo", 8) == wr


def test_facets_exclude_deleted(engine, oracle):
    q = "query parse"
    match = set()
    for t in q.split():
        match |= set(oracle.postings.get(t, {}))
    victims = sorted(match)[:4]
    engine.delete(docids=victims)
    want = _facet_brute(oracle, q, "lang", 5, dropped=victims)
    got = [
        (r["lang"], int(r["cnt"]))
        for r in engine.facet_counts(q, "lang", 5).collect()
    ]
    assert got == want
    assert engine.facet_counts_local(q, "lang", 5) == want


def _mlt_brute(oracle, docid, k, max_terms=25):
    tfs = {
        t: plist[docid]
        for t, plist in oracle.postings.items()
        if docid in plist
    }
    n = float(oracle.n_docs)
    sel = sorted(
        tfs,
        key=lambda t: (
            -tfs[t]
            * math.log1p(
                (n - len(oracle.postings[t]) + 0.5)
                / (len(oracle.postings[t]) + 0.5)
            ),
            t,
        ),
    )[:max_terms]
    got = oracle.search_weighted({t: 1.0 for t in sel}, 10_000)
    return [(d, s) for d, s in got if d != docid][:k]


@pytest.mark.parametrize("docid", [0, 42, 137])
def test_mlt_vs_brute_and_serving(engine, oracle, docid):
    want = _mlt_brute(oracle, docid, 10)
    got = [
        (int(r["docid"]), float(r["score"]))
        for r in engine.more_like_this(docid, 10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], docid
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    loc = engine.more_like_this_local(docid, 10)
    assert [d for d, _ in loc] == [d for d, _ in want]
    # source doc never in its own results
    assert docid not in {d for d, _ in got}


def test_mlt_selection_rule(engine, oracle):
    """The selected clause set is exactly the brute-force top-25 by
    (tf·idf desc, term asc)."""
    tfs = {
        t: plist[7] for t, plist in oracle.postings.items() if 7 in plist
    }
    n = float(oracle.n_docs)
    want = sorted(
        tfs,
        key=lambda t: (
            -tfs[t]
            * math.log1p(
                (n - len(oracle.postings[t]) + 0.5)
                / (len(oracle.postings[t]) + 0.5)
            ),
            t,
        ),
    )[:25]
    assert sorted(engine.mlt_weights(7, 25)) == sorted(want)


def test_mlt_unknown_docid(engine):
    with pytest.raises(KeyError):
        engine.more_like_this(10_000_000, 5)
    with pytest.raises(KeyError):
        engine.more_like_this_local(10_000_000, 5)
