"""SearchDocumentsUseCase facade (usecase.py): the reference's
execute(SearchRequestDTO) -> SearchResponseDTO flow over the engine —
cache behavior, pagination math, DTO mapping, every request param
honored, suggestions on zero hits, and sortBy x filter composition
(the search_sorted filter hook).
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index
from search_engine_spark.ops.ranking import PUBLISH_EPOCH
from search_engine_spark.usecase import SearchDocumentsUseCase
from tests.oracle import OracleIndex

N_DOCS = 600
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)
QUERY = "query parse buffer"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ucidx"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


@pytest.fixture()
def usecase(engine):
    return SearchDocumentsUseCase(engine)


def test_response_shape_and_ranking(usecase, oracle):
    resp = usecase.execute({"query": QUERY, "page": 0, "size": 5})
    assert resp["query"] == QUERY
    assert resp["page"] == 0 and resp["size"] == 5
    want = oracle.search(QUERY, 5)
    assert len(resp["results"]) == 5
    for r, (d, s) in zip(resp["results"], want):
        assert r["relevanceScore"] == pytest.approx(s, rel=1e-9)
        assert set(r) == {
            "url", "title", "snippet", "relevanceScore",
            "pagerankScore", "language", "crawledAt",
            "highlightedTerms",
        }
        assert r["highlightedTerms"] == ["query", "parse", "buffer"]
        assert "@" in r["url"] and r["url"].count("/") >= 1
        datetime.date.fromisoformat(r["crawledAt"])  # valid ISO
    assert resp["totalResults"] == len(oracle.search(QUERY, 10**9))
    assert resp["totalPages"] == math.ceil(resp["totalResults"] / 5)
    assert resp["suggestions"] == []


def test_pagination_slices_the_ranking(usecase, oracle):
    p0 = usecase.execute({"query": QUERY, "page": 0, "size": 4})
    p1 = usecase.execute({"query": QUERY, "page": 1, "size": 4})
    want = oracle.search(QUERY, 8)
    got = [
        r["relevanceScore"] for r in p0["results"] + p1["results"]
    ]
    assert got == [pytest.approx(s, rel=1e-9) for _, s in want]


def test_cache_flow(engine):
    uc = SearchDocumentsUseCase(engine)
    r1 = uc.execute({"query": QUERY, "page": 0, "size": 5})
    assert (uc.cache.hits, uc.cache.misses) == (0, 1)
    r2 = uc.execute({"query": QUERY, "page": 0, "size": 5})
    assert (uc.cache.hits, uc.cache.misses) == (1, 1)
    assert r2 is r1  # served from cache, key = query:page:size:sort
    r3 = uc.execute({"query": QUERY, "page": 1, "size": 5})
    assert r3 is not r1  # different page = different key


def test_filters_and_ranges_apply(usecase, engine, oracle):
    langs = {d["docid"]: d["lang"] for d in oracle.docmap}
    lang = langs[oracle.search(QUERY, 1)[0][0]]
    resp = usecase.execute(
        {
            "query": QUERY,
            "size": 10,
            "language": lang,
            "dateFrom": 100,
            "dateTo": 2000,
            "minContentQuality": 0.4,
        }
    )
    want = [
        (d, s)
        for d, s in oracle.search_range(QUERY, 100, 2000, 0.4, 10**9)
        if langs[d] == lang
    ][:10]
    assert [r["relevanceScore"] for r in resp["results"]] == [
        pytest.approx(s, rel=1e-9) for _, s in want
    ]
    assert all(r["language"] == lang for r in resp["results"])
    # dateFrom/dateTo constrain the response's own crawledAt dates
    epoch = datetime.date.fromisoformat(PUBLISH_EPOCH)
    for r in resp["results"]:
        day = (datetime.date.fromisoformat(r["crawledAt"]) - epoch).days
        assert 100 <= day <= 2000


def test_sorted_with_filters(usecase, oracle):
    """sortBy=date + language filter: the search_sorted filter hook —
    dates descend and every hit carries the filtered language."""
    langs = {d["docid"]: d["lang"] for d in oracle.docmap}
    lang = langs[oracle.search(QUERY, 1)[0][0]]
    resp = usecase.execute(
        {"query": QUERY, "size": 8, "sortBy": "date", "language": lang}
    )
    assert resp["results"]
    days = [r["crawledAt"] for r in resp["results"]]
    assert days == sorted(days, reverse=True)
    assert all(r["language"] == lang for r in resp["results"])
    # brute force: the filtered match set's top days
    match = {d for d, _ in oracle.search(QUERY, 10**9)}
    want = sorted(
        ((d * 16807) % 2557, d)
        for d in match
        if langs[d] == lang
    )
    want = [day for day, _ in reversed(want)][: len(days)]
    epoch = datetime.date.fromisoformat(PUBLISH_EPOCH)
    got_days = [
        (datetime.date.fromisoformat(x) - epoch).days for x in days
    ]
    assert got_days == want


def test_zero_hits_and_suggestions(usecase):
    resp = usecase.execute({"query": "zzznosuchword"})
    assert resp["totalResults"] == 0
    assert resp["totalPages"] == 0
    assert resp["results"] == []
    assert resp["suggestions"] == []  # nothing within levenshtein 2
    resp2 = usecase.execute({"query": "qurey"})  # 'query' misspelled
    if resp2["totalResults"] == 0:
        assert resp2["suggestions"] == ["query"]


REQUESTS = [
    {"query": QUERY, "page": 0, "size": 5},
    {"query": QUERY, "page": 1, "size": 4},
    {"query": QUERY, "size": 8, "minContentQuality": 0.4,
     "dateFrom": 100, "dateTo": 2000},
    {"query": "zzznosuchword"},
    {"query": QUERY, "size": 6, "sortBy": "date"},
]


@pytest.mark.parametrize("req", REQUESTS)
def test_execute_local_identity(engine, req):
    """The no-Spark execute twin returns the IDENTICAL response
    (searchTimeMs aside) for every request shape — incl. the python
    snippet twin, the pyarrow metadata read, count_matches_local and
    the date-sorted path."""
    a = SearchDocumentsUseCase(engine).execute(dict(req))
    b = SearchDocumentsUseCase(engine).execute_local(dict(req))
    a.pop("searchTimeMs"), b.pop("searchTimeMs")
    for ra, rb in zip(a["results"], b["results"]):
        assert ra["relevanceScore"] == pytest.approx(
            rb["relevanceScore"], rel=1e-12
        )
        ra.pop("relevanceScore"), rb.pop("relevanceScore")
    assert a == b


def test_count_matches_local_identity(engine):
    for q in [QUERY, "query", "zzznosuchword", "crawl rank"]:
        assert engine.count_matches_local(q) == engine.count_matches(q)


def test_did_you_mean_local_identity(engine):
    for q in ["qurey parse", "zzznosuchword", QUERY, "databsae"]:
        assert engine.did_you_mean_local(q) == engine.did_you_mean(q)


def test_execute_local_sorted_with_filters_boundary(engine):
    uc = SearchDocumentsUseCase(engine)
    with pytest.raises(NotImplementedError):
        uc.execute_local(
            {"query": QUERY, "sortBy": "date", "language": "python"}
        )


def test_get_suggestions(engine):
    """The controller's second endpoint: real prefix autocomplete
    where the reference stubs [] — top-df completions, the reference's
    sub-2-char guard kept verbatim."""
    from search_engine_spark.usecase import GetSuggestionsUseCase

    uc = GetSuggestionsUseCase(engine)
    assert uc.execute("") == []
    assert uc.execute("q") == []  # < 2 chars, the reference guard
    got = uc.execute("qu")
    assert 0 < len(got) <= 5
    assert all(t.startswith("qu") for t in got)
    # (df desc, term asc) determinism: a repeat call agrees
    assert uc.execute("qu") == got
    dfs = {
        r["term"]: r["df"]
        for r in engine._content_vocab()
        .filter(F.col("term").startswith("qu"))
        .collect()
    }
    want = sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [t for t, _ in want]


def test_pagerank_score_join(usecase, engine):
    rank = engine.spark.createDataFrame(
        [(0, 0.5)], "docid long, rank double"
    )
    resp = usecase.execute(
        {"query": QUERY, "size": 10, "rank": rank}
    )
    by_doc = {
        r["url"]: r["pagerankScore"] for r in resp["results"]
    }
    assert set(by_doc.values()) <= {0.0, 0.5}
