"""SearchRequestDTO numeric range filters (engine.search(date_from=,
date_to=, min_quality=), search_local twins, contract.q_bm25_range*):
brute-force oracle pin, Spark-vs-serving rank identity, composition
with bool.filter / must_not / search_after / deletes, the ISO
day_offset helper, and append + refresh generation behavior.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine, _dto_ranges
from search_engine_spark.indexer.build import (
    append_documents,
    build_index,
    delete_documents,
)
from search_engine_spark.ops.ranking import PUBLISH_RANGE_DAYS, day_offset
from tests.oracle import OracleIndex

N_DOCS = 600
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rngidx"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


# (query, day_from, day_to, min_quality): hot multi-term queries take
# the exhaustive dense kernel, the rare single term takes the batch
# WAND loop — both dispatches must honor the raw admission rows.
CASES = [
    ("query parse buffer", None, None, 0.5),
    ("query parse buffer", 100, 1500, None),
    ("crawl rank", 200, 900, 0.45),
    ("zlib", 0, 2000, 0.4),  # rare term: batch WAND dispatch
    ("util worker", "2018-04-11", "2022-02-01", 0.4),  # ISO dates
    ("query parse", None, None, 0.99),  # nothing admissible
]


def _days(df_, dt_):
    lo = day_offset(df_) if df_ is not None else None
    hi = day_offset(dt_) if dt_ is not None else None
    return lo, hi


@pytest.mark.parametrize("q,dfrm,dto,qmin", CASES)
def test_engine_range_vs_oracle(engine, oracle, q, dfrm, dto, qmin):
    got = [
        (r["docid"], r["score"])
        for r in engine.search(
            q, 10, date_from=dfrm, date_to=dto, min_quality=qmin
        ).collect()
    ]
    lo, hi = _days(dfrm, dto)
    want = oracle.search_range(q, lo, hi, qmin, 10)
    assert [d for d, _ in got] == [d for d, _ in want], (q, dfrm, dto, qmin)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


@pytest.mark.parametrize("q,dfrm,dto,qmin", CASES)
def test_serving_range_identity(engine, q, dfrm, dto, qmin):
    spark_res = [
        (r["docid"], r["score"])
        for r in engine.search(
            q, 10, date_from=dfrm, date_to=dto, min_quality=qmin
        ).collect()
    ]
    local_res = engine.search_local(
        q, 10, date_from=dfrm, date_to=dto, min_quality=qmin
    )
    assert [d for d, _ in local_res] == [d for d, _ in spark_res]
    for (_, ls), (_, ss) in zip(local_res, spark_res):
        assert ls == pytest.approx(ss, rel=1e-12)


def test_scores_unchanged_by_range(engine):
    """Filter context: a doc admitted by the range scores BITWISE the
    same as in the unfiltered ranking."""
    base = {
        r["docid"]: r["score"]
        for r in engine.search("query parse buffer", N_DOCS).collect()
    }
    got = engine.search(
        "query parse buffer", 10, date_from=100, date_to=1500,
        min_quality=0.4,
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r["score"] == base[r["docid"]]


def test_range_composes_with_keyword_filter(engine, oracle):
    q = "query parse buffer"
    langs = {d["docid"]: d["lang"] for d in oracle.docmap}
    lang = langs[oracle.search(q, 1)[0][0]]  # a lang that fires
    got = [
        (r["docid"], r["score"])
        for r in engine.search(
            q, 10, filter={"lang": lang}, min_quality=0.4
        ).collect()
    ]
    want = [
        (d, s)
        for d, s in oracle.search_range(q, None, None, 0.4, 10**9)
        if langs[d] == lang
    ][:10]
    assert got == [
        (d, pytest.approx(s, rel=1e-9)) for d, s in want
    ]
    loc = engine.search_local(q, 10, filter={"lang": lang}, min_quality=0.4)
    assert [d for d, _ in loc] == [d for d, _ in got]


def test_range_composes_with_must_not(engine, oracle):
    q, ex = "query parse buffer", "config"
    got = [
        (r["docid"], r["score"])
        for r in engine.search(
            q, 10, exclude=ex, date_from=100, date_to=2000
        ).collect()
    ]
    notset = {
        d for d, _ in oracle.search_not(q, ex, 10**9)
    }
    want = [
        (d, s)
        for d, s in oracle.search_range(q, 100, 2000, None, 10**9)
        if d in notset
    ][:10]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_range_composes_with_after(engine):
    """search_after pages through the FILTERED ranking: chaining
    cursors reproduces the one-shot filtered top-12 exactly."""
    kw = dict(date_from=100, date_to=2000, min_quality=0.4)
    full = [
        (r["docid"], r["score"])
        for r in engine.search("query parse buffer", 12, **kw).collect()
    ]
    assert len(full) == 12
    pages, cursor = [], None
    for _ in range(3):
        page = [
            (r["docid"], r["score"])
            for r in engine.search(
                "query parse buffer", 4, after=cursor, **kw
            ).collect()
        ]
        pages.extend(page)
        cursor = page[-1]
        cursor = (cursor[1], cursor[0])
    assert pages == full


def test_range_respects_tombstones(spark, tmp_path_factory, oracle):
    d = str(tmp_path_factory.mktemp("rngdel"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    e = SearchEngine(spark, d)
    kw = dict(date_from=0, date_to=2400, min_quality=0.3)
    before = [
        (r["docid"], r["score"])
        for r in e.search("query parse buffer", 10, **kw).collect()
    ]
    victim = before[0][0]
    delete_documents(spark, d, docids=[victim])
    e.refresh()
    after = [
        (r["docid"], r["score"])
        for r in e.search("query parse buffer", 10, **kw).collect()
    ]
    assert victim not in [d_ for d_, _ in after]
    assert after[: len(before) - 1] == before[1:]
    loc = e.search_local("query parse buffer", 10, **kw)
    assert [d_ for d_, _ in loc] == [d_ for d_, _ in after]


def test_append_refresh_regenerates_dv(spark, tmp_path_factory):
    """Ranges stay correct across an append: the serving quality array
    is generation-scoped (refresh() drops it) and the new docids'
    values come from the appended docmap rows."""
    d = str(tmp_path_factory.mktemp("rngapp"))
    all_docs = corpus_df(spark, N_DOCS, partitions=8).persist()
    docs1 = all_docs.filter(F.xxhash64("repo", "path") % 5 != 0)
    docs2 = all_docs.filter(F.xxhash64("repo", "path") % 5 == 0)
    build_index(spark, docs1, d, CFG)
    e = SearchEngine(spark, d)
    kw = dict(min_quality=0.45, date_from=0, date_to=2400)
    _ = e.search_local("query parse buffer", 10, **kw)  # warm dv cache
    append_documents(spark, d, docs2)
    e.refresh()
    qual = {
        int(r["docid"]): float(r["quality"])
        for r in e.docmap.select("docid", "quality").collect()
    }
    base = [
        (r["docid"], r["score"])
        for r in e.search("query parse buffer", 10**6).collect()
    ]

    def adm(d_):
        day = (d_ * 16807) % PUBLISH_RANGE_DAYS
        return 0 <= day <= 2400 and qual[d_] >= 0.45

    want = [(d_, s) for d_, s in base if adm(d_)][:10]
    got = [
        (r["docid"], r["score"])
        for r in e.search("query parse buffer", 10, **kw).collect()
    ]
    assert got == want
    loc = e.search_local("query parse buffer", 10, **kw)
    assert [d_ for d_, _ in loc] == [d_ for d_, _ in got]
    # appended docids (beyond the base build) are reachable
    max_base = docs1.count()
    assert any(d_ >= max_base for d_, _ in base)


def test_legacy_docmap_without_quality(spark, tmp_path_factory, oracle):
    """A pre-quality-column docmap (legacy index) must degrade
    gracefully: the Spark path recomputes F13 at query time (the
    search_ranked fallback discipline) and the serving path computes
    the python twin once per generation — identical results to a
    quality-materialized index."""
    import shutil

    d = str(tmp_path_factory.mktemp("rnglegacy"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    dm = spark.read.parquet(f"{d}/docmap").drop("quality")
    dm.write.mode("overwrite").parquet(f"{d}/docmap_nq")
    shutil.rmtree(f"{d}/docmap")
    shutil.move(f"{d}/docmap_nq", f"{d}/docmap")
    e = SearchEngine(spark, d)
    assert "quality" not in e.docmap.columns
    got = [
        (r["docid"], r["score"])
        for r in e.search(
            "query parse buffer", 10, min_quality=0.45
        ).collect()
    ]
    want = oracle.search_range("query parse buffer", None, None, 0.45, 10)
    assert [d_ for d_, _ in got] == [d_ for d_, _ in want]
    loc = e.search_local("query parse buffer", 10, min_quality=0.45)
    assert [d_ for d_, _ in loc] == [d_ for d_, _ in got]


def test_day_offset_helper():
    assert day_offset("2018-01-01") == 0
    assert day_offset("2018-12-31") == 364
    assert day_offset("2025-01-01") == 2557  # out of calendar: matches none
    assert day_offset(1234) == 1234
    with pytest.raises(ValueError):
        day_offset("not-a-date")


def test_dto_ranges_assembly():
    assert _dto_ranges(None, None, None) is None
    assert _dto_ranges(None, None, 0.5) == [("quality", 0.5, None)]
    r = _dto_ranges("2018-01-11", None, None)
    assert r == [("day", 10.0, None)]
    r = _dto_ranges(5, 7, 0.25)
    assert r == [("quality", 0.25, None), ("day", 5.0, 7.0)]


def test_empty_query_and_noop_range(engine):
    assert engine.search("", 10, min_quality=0.5).count() == 0
    base = [
        (r["docid"], r["score"])
        for r in engine.search("query parse", 10).collect()
    ]
    # a fully-open day window admits everything: identical ranking
    got = [
        (r["docid"], r["score"])
        for r in engine.search(
            "query parse", 10, date_from=0, date_to=PUBLISH_RANGE_DAYS
        ).collect()
    ]
    assert got == base
