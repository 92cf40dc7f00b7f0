"""Byte-splicing LSM merge (codec.splice_merge): byte-level parity
with a full re-encode, and engine-level exactness after a splice
compaction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import (
    append_documents,
    build_index,
    compact_index,
)
from search_engine_spark.indexer.codec import (
    TermChunk,
    encode_group,
    splice_merge,
)

BS = 64


def _enc(docids, tf, dl, idx, avgdl=200.0):
    d, t, l = docids[idx], tf[idx], dl[idx]
    codes = np.zeros(len(d), dtype=np.int64)
    p, s, bm, _, _ = encode_group(codes, d, t, l, 1, BS, 1.2, 0.75, avgdl)
    return p[0], s[0], bm[0]


def test_splice_equals_reencode():
    rng = np.random.RandomState(7)
    docids = np.sort(rng.choice(4000, size=900, replace=False))
    tf = rng.randint(1, 30, size=900)
    dl = rng.randint(20, 400, size=900)
    full = TermChunk(*_enc(docids, tf, dl, np.arange(900)))
    # split points chosen INSIDE blocks -> shared boundary blocks
    cut1, cut2 = 307, 611
    assert docids[cut1] // BS == docids[cut1 - 1] // BS
    assert docids[cut2] // BS == docids[cut2 - 1] // BS
    spliced = TermChunk(*splice_merge([
        _enc(docids, tf, dl, np.arange(0, cut1)),
        _enc(docids, tf, dl, np.arange(cut1, cut2)),
        _enc(docids, tf, dl, np.arange(cut2, 900)),
    ]))
    for a, b in zip(full.decode_all(BS), spliced.decode_all(BS)):
        assert np.array_equal(a, b)
    assert np.array_equal(full.block_ids, spliced.block_ids)
    assert np.allclose(full.block_max, spliced.block_max)


def test_splice_single_and_disjoint_blocks():
    rng = np.random.RandomState(11)
    docids = np.sort(rng.choice(1000, size=200, replace=False))
    tf = rng.randint(1, 9, size=200)
    dl = rng.randint(20, 100, size=200)
    one = _enc(docids, tf, dl, np.arange(200))
    assert splice_merge([one]) == one
    # cut exactly at a block boundary -> no shared block path
    cut = int(np.searchsorted(docids, (docids[100] // BS) * BS))
    full = TermChunk(*_enc(docids, tf, dl, np.arange(200)))
    spliced = TermChunk(*splice_merge([
        _enc(docids, tf, dl, np.arange(0, cut)),
        _enc(docids, tf, dl, np.arange(cut, 200)),
    ]))
    for a, b in zip(full.decode_all(BS), spliced.decode_all(BS)):
        assert np.array_equal(a, b)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def test_splice_property_random_splits(data):
        """Property: for ANY docid set, tf/dl values and ANY split of
        the postings into 1-4 ascending generations, byte-splicing the
        per-generation chunks decodes identically to encoding the
        whole list at once."""
        n = data.draw(st.integers(min_value=1, max_value=300))
        universe = data.draw(st.integers(min_value=n, max_value=5000))
        rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
        docids = np.sort(rng.choice(universe, size=n, replace=False))
        tf = rng.randint(1, 50, size=n)
        dl = rng.randint(1, 500, size=n)
        n_gens = data.draw(st.integers(min_value=1, max_value=4))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=1, max_value=max(1, n - 1)),
                    min_size=n_gens - 1,
                    max_size=n_gens - 1,
                )
            )
        )
        bounds = [0] + cuts + [n]
        parts = [
            np.arange(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
            if bounds[i] < bounds[i + 1]
        ]
        full = TermChunk(*_enc(docids, tf, dl, np.arange(n)))
        spliced = TermChunk(
            *splice_merge([_enc(docids, tf, dl, p) for p in parts])
        )
        for a, b in zip(full.decode_all(BS), spliced.decode_all(BS)):
            assert np.array_equal(a, b)
        assert np.array_equal(full.block_ids, spliced.block_ids)
        assert np.allclose(full.block_max, spliced.block_max)
except ImportError:  # pragma: no cover
    pass


def test_splice_compaction_engine_exact(spark, tmp_path):
    """append -> compact(mode=splice): one chunk per (term, slab),
    results still rank-identical to the brute-force oracle."""
    d = str(tmp_path / "idx")
    cfg = EngineConfig(slab_size=256, term_buckets=8, block_size=32)
    all_docs = corpus_df(spark, 700, partitions=6).persist()
    docs1 = all_docs.filter(F.xxhash64("repo", "path") % 4 != 0)
    docs2 = all_docs.filter(F.xxhash64("repo", "path") % 4 == 0)
    build_index(spark, docs1, d, cfg)
    append_documents(spark, d, docs2)
    compact_index(spark, d, mode="splice")
    eng = SearchEngine(spark, d)
    assert eng.meta["max_gen"] == 0
    # norm_avgdl preserved (splice keeps per-generation bound bases)
    assert eng.meta["norm_avgdl"] <= eng.meta["avgdl"]
    seg = spark.read.parquet(f"{d}/segments")
    assert seg.groupBy("slab", "term").count().filter("count > 1").count() == 0

    from tests.test_append import oracle_on_union

    oracle = oracle_on_union(spark, eng)
    for q in ["java search", "database index merge", "read write flush"]:
        got = [(r["docid"], r["score"]) for r in eng.search(q, 10).collect()]
        want = oracle.search(q, 10)
        assert [x for x, _ in got] == [x for x, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)
    # fields path too (title chunks spliced with their own basis)
    assert eng.search_fields("merge buffer", 10).count() > 0
