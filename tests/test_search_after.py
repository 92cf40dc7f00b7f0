"""ES ``search_after`` keyset pagination (engine.search(after=...),
search_local(after=...), contract.q_bm25_after): page-2-equals-rank-
window pins, Spark-vs-serving identity, kernel-dispatch coverage
(batch WAND, exhaustive dense, fused serving), paging-chain coverage
of the full ranking, and composition with bool.must / must_not.

Reference: the ES adapter pages via from/size (Pagination.java:16-27,
gated by bm25_page2); search_after is the ES-documented deep-paging
replacement — page N never materializes pages 1..N-1.
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

QUERIES = [
    "query parse buffer",   # multi-term, mid-df
    "crawl rank",           # hot terms
    "config",               # single term
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("afteridx"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


def _rows(df):
    return [(int(r["docid"]), float(r["score"])) for r in df.collect()]


@pytest.mark.parametrize("q", QUERIES)
def test_engine_after_is_next_page(engine, q):
    """search(after=hit k's (score, docid)) == rows k..2k-1 of the
    full ranking — the keyset page is exactly the rank window."""
    full = _rows(engine.search(q, 30))
    assert len(full) >= 12, q
    cursor = (full[9][1], full[9][0])  # (score, docid) — ES sort order
    page2 = _rows(engine.search(q, 10, after=cursor))
    assert page2 == full[10:20], q


@pytest.mark.parametrize("q", QUERIES)
def test_serving_after_identity(engine, q):
    """Each path pages with ITS OWN cursor (a cursor's floats are
    exact only within the engine that issued them — the ES rule: sort
    values come from the serving shard); the resulting page-2 docid
    lists must agree, scores to 1e-12."""
    full = engine.search_local(q, 30)
    cursor = (full[9][1], full[9][0])
    local = engine.search_local(q, 10, after=cursor)
    assert local == full[10:20], q
    sfull = _rows(engine.search(q, 30))
    spark_page = _rows(
        engine.search(q, 10, after=(sfull[9][1], sfull[9][0]))
    )
    assert [d for d, _ in spark_page] == [d for d, _ in local], q
    for (_, a), (_, b) in zip(spark_page, local):
        assert a == pytest.approx(b, rel=1e-12)


def test_after_chain_covers_ranking(engine, oracle):
    """Paging with size-7 cursors until exhaustion reproduces the
    entire ranking exactly once — no skips, no duplicates."""
    q = "query parse buffer"
    want = oracle.search(q, 10_000)
    got: list[tuple[int, float]] = []
    cursor = None
    while True:
        page = engine.search_local(q, 7, after=cursor)
        if not page:
            break
        got.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_after_serving_fused_vs_scan_paths(engine):
    """The cursor must behave identically through the fused dense
    serving path (decoded cache on) and the per-slab scan path
    (decoded cache off)."""
    q = "crawl rank"  # hot terms -> dense dispatch, fused-eligible
    full = engine.search_local(q, 30)
    cursor = (full[9][1], full[9][0])
    engine.search_local(q, 5)  # prime the decoded cache
    fused = engine.search_local(q, 10, after=cursor)
    old = engine.serving_decoded_max_bytes
    try:
        engine.serving_decoded_max_bytes = 0
        scan = engine.search_local(q, 10, after=cursor)
    finally:
        engine.serving_decoded_max_bytes = old
    assert fused == scan == full[10:20]


def test_after_exhausted_page_is_empty(engine):
    q = "config"
    full = engine.search_local(q, 10_000)
    cursor = (full[-1][1], full[-1][0])
    assert engine.search_local(q, 10, after=cursor) == []
    assert _rows(engine.search(q, 10, after=cursor)) == []


def test_after_composes_with_and_and_not(engine, oracle):
    """Cursor admission must compose with bool.must (n_required) and
    bool.must_not (exclusion set) — all three filters run inside the
    same kernel pass."""
    q, ex = "query parse", "config"
    full_and = _rows(engine.search(q, 30, mode="and"))
    if len(full_and) >= 8:
        cur = (full_and[4][1], full_and[4][0])
        assert _rows(engine.search(q, 10, mode="and", after=cur)) == (
            full_and[5:15]
        )
    full_not = _rows(engine.search(q, 30, exclude=ex))
    assert len(full_not) >= 8
    cur = (full_not[4][1], full_not[4][0])
    got = _rows(engine.search(q, 10, exclude=ex, after=cur))
    assert got == full_not[5:15]
    local = engine.search_local(q, 10, exclude=ex, after=cur)
    assert [d for d, _ in local] == [d for d, _ in got]
    for (_, a), (_, b) in zip(local, got):
        assert a == pytest.approx(b, rel=1e-12)


def test_kernel_after_both_dispatch_branches():
    """Drive slab_topk directly on both dispatch branches with a
    cursor; results must equal the numpy brute-force rank window."""
    from search_engine_spark.indexer.codec import (
        TermChunk,
        encode_group,
        tf_norm_factor,
    )
    from search_engine_spark.query.wand import slab_topk

    rng = np.random.RandomState(11)
    slab_size, block_size = 512, 32
    per_term = []
    for ti, df in enumerate([420, 41, 5]):  # dense, mid, sparse
        docids = np.sort(rng.choice(slab_size, size=df, replace=False))
        tfs = rng.randint(1, 5, size=df)
        dls = rng.randint(20, 60, size=df)
        per_term.append((ti, docids, tfs, dls))
    tc = np.concatenate([np.full(len(d), ti) for ti, d, _, _ in per_term])
    ld = np.concatenate([d for _, d, _, _ in per_term])
    tf_ = np.concatenate([t for _, _, t, _ in per_term])
    dl_ = np.concatenate([x for _, _, _, x in per_term])
    p, s, bm, _, _dfs = encode_group(
        tc, ld, tf_, dl_, len(per_term), block_size, 1.2, 0.75, 40.0
    )
    chunks = [
        (TermChunk(p[ti], s[ti], bm[ti]), 1.0 + ti)
        for ti in range(len(per_term))
    ]

    def brute(use_chunks_from):
        scores = np.zeros(slab_size)
        for ti, docids, tfs, dls in per_term[use_chunks_from:]:
            scores[docids] += (1.0 + ti) * tf_norm_factor(
                tfs.astype(np.float64), dls.astype(np.float64),
                1.2, 0.75, 40.0,
            )
        ids = np.flatnonzero(scores > 0)
        order = np.lexsort((ids, -scores[ids]))
        return ids[order], scores[ids][order]

    for start, label in [(0, "exhaustive"), (1, "batch-wand")]:
        ids, sc = brute(start)
        cursor = (float(sc[7]), int(ids[7]))
        got_ids, got_sc = slab_topk(
            chunks[start:], 0, slab_size, block_size, 10,
            1.2, 0.75, 40.0, after=cursor,
        )
        np.testing.assert_array_equal(got_ids, ids[8:18], err_msg=label)
        np.testing.assert_allclose(got_sc, sc[8:18], rtol=1e-12)


def test_kernel_after_tie_boundary():
    """A cursor sitting inside a run of equal scores must admit only
    the tied docs with LARGER docids (docid is the tiebreak)."""
    from search_engine_spark.query.wand import _after_mask

    sc = np.array([3.0, 2.0, 2.0, 2.0, 1.0])
    ids = np.array([5, 2, 7, 9, 1], dtype=np.int64)
    keep = _after_mask(sc, ids, (2.0, 7))
    np.testing.assert_array_equal(ids[keep], [9, 1])
