"""S8 result cache (SearchCachePort analog): TTL + LRU semantics,
reference key format, and engine-generation invalidation."""

import pytest

from search_engine_spark.cache import SearchCache, search_key
from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index

N_DOCS = 400
CFG = EngineConfig(slab_size=128, term_buckets=8, block_size=32)


def test_key_format_verbatim():
    # SearchCachePort.java:10-45: search:{q}:{page}:{size}:{sort}
    assert search_key("java tutorial", 2, 20, "date") == (
        "search:java tutorial:2:20:date"
    )
    assert search_key("x", 0, 10) == "search:x:0:10:score"


def test_get_put_hit_miss_counters():
    c = SearchCache()
    assert c.get("k") is None
    c.put("k", [1, 2])
    assert c.get("k") == [1, 2]
    assert (c.hits, c.misses) == (1, 1)


def test_ttl_expiry(monkeypatch):
    import search_engine_spark.cache as cache_mod

    now = [1000.0]
    monkeypatch.setattr(cache_mod.time, "monotonic", lambda: now[0])
    c = SearchCache(default_ttl_sec=300.0)
    c.put("a", "v")
    c.put("b", "w", ttl_sec=5.0)
    now[0] += 6.0
    assert c.get("b") is None  # per-entry ttl expired
    assert c.get("a") == "v"  # default ttl still live
    now[0] += 300.0
    assert c.get("a") is None
    assert "b" not in c._map  # expired entries are evicted on access


def test_lru_eviction_order():
    c = SearchCache(max_entries=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # touch a -> b becomes LRU
    c.put("c", 3)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3


def test_invalidate_prefix():
    c = SearchCache()
    c.put(search_key("java", 0, 10), 1)
    c.put(search_key("java", 1, 10), 2)
    c.put(search_key("python", 0, 10), 3)
    assert c.invalidate("search:java:") == 2
    assert len(c) == 1


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_cache"))
    build_index(spark, corpus_df(spark, N_DOCS, partitions=4), d, CFG)
    return SearchEngine(spark, d)


def test_cached_equals_uncached_and_hits(engine, monkeypatch):
    want = engine.search_local("java merge", 10)
    got1 = engine.search_local_cached("java merge", 10)
    assert got1 == want

    calls = {"n": 0}
    orig = SearchEngine.search_local

    def counting(self, q, k=10):
        calls["n"] += 1
        return orig(self, q, k)

    monkeypatch.setattr(SearchEngine, "search_local", counting)
    got2 = engine.search_local_cached("java merge", 10)
    assert got2 == want and calls["n"] == 0  # served from cache
    assert engine._result_cache.hits >= 1

    # different k = different key -> recompute
    engine.search_local_cached("java merge", 5)
    assert calls["n"] == 1


def test_caller_mutation_does_not_corrupt_cache(engine):
    """Round-3 review: the hit path returns a COPY — a serving
    handler reversing/popping the result list must not poison
    subsequent hits."""
    a = engine.search_local_cached("java merge", 10)
    a.reverse()
    b = engine.search_local_cached("java merge", 10)
    assert b == engine.search_local("java merge", 10)


def test_refresh_drops_cache(engine):
    engine.search_local_cached("python table", 10)
    assert engine._result_cache is not None and len(engine._result_cache) >= 1
    engine.refresh()
    assert engine._result_cache is None  # next call starts a fresh cache
    got = engine.search_local_cached("python table", 10)
    assert got == engine.search_local("python table", 10)
