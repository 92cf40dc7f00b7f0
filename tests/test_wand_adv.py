"""Property tests for the composed-query kernel slab_topk_adv —
pure numpy, no Spark: clause max-combine, per-doc boost, required-term
coverage, and exact agreement with a brute-force reference."""

import numpy as np
import pytest

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.indexer.codec import TermChunk, encode_group
from search_engine_spark.query.wand import slab_topk, slab_topk_adv

SLAB = 256
BLOCK = 32
AVGDL = 40.0


def _mk_chunk(rng, n_docs):
    """Encode one term's postings over random docs of the slab."""
    docs = np.sort(rng.choice(SLAB, size=n_docs, replace=False)).astype(
        np.int64
    )
    tf = rng.integers(1, 6, size=n_docs).astype(np.int64)
    dl = rng.integers(10, 90, size=n_docs).astype(np.int64)
    codes = np.zeros(n_docs, dtype=np.int64)
    p, s, bm, _tmax, _dfs = encode_group(
        codes, docs, tf, dl, 1, BLOCK, BM25_K1, BM25_B, AVGDL
    )
    return TermChunk(p[0], s[0], bm[0]), docs, tf, dl


def _tfn(tf, dl, avgdl):
    return (
        tf * (BM25_K1 + 1.0)
        / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
    )


def _brute(chunk_specs, boost, n_required):
    """chunk_specs: [(docs, tf, dl, widf, avgdl, clause, fld, req)]."""
    per = {}
    reqs = {}
    for docs, tf, dl, widf, avgdl, clause, fld, req in chunk_specs:
        for d, t, l in zip(docs, tf, dl):
            per.setdefault((d, clause, fld), 0.0)
            per[(d, clause, fld)] += widf * _tfn(t, l, avgdl)
            if req >= 0:
                reqs.setdefault(d, set()).add(req)
    cl = {}
    for (d, clause, _fld), s in per.items():
        cl[(d, clause)] = max(cl.get((d, clause), 0.0), s)
    tot = {}
    for (d, _clause), s in cl.items():
        tot[d] = tot.get(d, 0.0) + s
    if boost is not None:
        tot = {d: s * boost[d] for d, s in tot.items()}
    if n_required:
        tot = {d: s for d, s in tot.items()
               if len(reqs.get(d, ())) >= n_required}
    return sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("use_boost", [False, True])
@pytest.mark.parametrize("n_required", [0, 2])
def test_adv_kernel_matches_brute(seed, use_boost, n_required):
    rng = np.random.default_rng(seed)
    specs = []
    chunks = []
    # 3 clauses: clause 0 two-field (2 terms x 2 fields, reqs 0/1),
    # clause 1 two-field single term, clause 2 content-only
    layout = [
        (0, 0, 0), (0, 1, 0), (0, 0, 1), (0, 1, 1),
        (1, 0, -1), (1, 1, -1),
        (2, 0, -1),
    ]
    for clause, fld, req in layout:
        c, docs, tf, dl = _mk_chunk(rng, int(rng.integers(20, 120)))
        widf = float(rng.uniform(0.3, 3.0))
        avgdl = AVGDL if fld == 0 else 7.0
        specs.append((docs, tf, dl, widf, avgdl, clause, fld, req))
        chunks.append((c, widf, avgdl, 1.0, clause, fld, req))
    boost = (
        np.log1p(2.0 * rng.uniform(0.0, 1.0, size=SLAB))
        if use_boost
        else None
    )
    for k in (5, 10, 300):
        ids, sc = slab_topk_adv(
            chunks, 0, SLAB, BLOCK, k, BM25_K1, BM25_B,
            boost=boost, n_required=n_required,
        )
        want = _brute(specs, boost, n_required)[:k]
        assert list(ids) == [d for d, _ in want], (seed, use_boost, k)
        for g, (_, w) in zip(sc, want):
            assert g == pytest.approx(w, rel=1e-12)


def test_adv_kernel_reduces_to_plain_sum():
    """With every chunk in its own clause, single field, no boost,
    the adv kernel ranks identically to the frozen slab_topk."""
    rng = np.random.default_rng(7)
    plain = []
    adv = []
    for i in range(5):
        c, docs, tf, dl = _mk_chunk(rng, int(rng.integers(30, 150)))
        widf = float(rng.uniform(0.5, 2.5))
        plain.append((c, widf))
        adv.append((c, widf, AVGDL, 1.0, i, 0, -1))
    ids_p, sc_p = slab_topk(plain, 0, SLAB, BLOCK, 20, BM25_K1, BM25_B, AVGDL)
    ids_a, sc_a = slab_topk_adv(adv, 0, SLAB, BLOCK, 20, BM25_K1, BM25_B)
    assert list(ids_p) == list(ids_a)
    for a, b in zip(sc_p, sc_a):
        assert a == pytest.approx(b, rel=1e-12)


def test_adv_kernel_boost_zero_prunes_nothing_wrong():
    """Boost of exactly 0 zeroes scores but never breaks pruning
    (docs with zero boost may appear with score 0.0 only at the
    tail)."""
    rng = np.random.default_rng(11)
    c, docs, tf, dl = _mk_chunk(rng, 100)
    boost = np.zeros(SLAB)
    boost[docs[::2]] = 1.0
    chunks = [(c, 1.0, AVGDL, 1.0, 0, 0, -1)]
    ids, sc = slab_topk_adv(
        chunks, 0, SLAB, BLOCK, 100, BM25_K1, BM25_B, boost=boost
    )
    zeroed = set(docs[1::2])
    for d, s in zip(ids, sc):
        if d in zeroed:
            assert s == 0.0
        else:
            assert s > 0.0


def test_adv_kernel_all_zero_boost_block_still_returned():
    """Regression (round-3 review): a block whose boost maximum is 0
    must still surface its matched docs at score 0.0 — activity comes
    from the TERM bound, not the boosted bound.  The oracle ranks
    zero-boost docs by (0.0, docid), so dropping the block breaks
    rank parity whenever fewer than k docs carry positive boost."""
    rng = np.random.default_rng(13)
    c, docs, tf, dl = _mk_chunk(rng, 60)
    boost = np.zeros(SLAB)  # EVERY block's bmax is 0
    chunks = [(c, 1.0, AVGDL, 1.0, 0, 0, -1)]
    ids, sc = slab_topk_adv(
        chunks, 0, SLAB, BLOCK, 100, BM25_K1, BM25_B, boost=boost
    )
    assert sorted(ids.tolist()) == sorted(docs.tolist())
    assert (sc == 0.0).all()
    # docid-ascending among equal scores
    assert list(ids) == sorted(ids.tolist())

    # mixed case: one block fully zeroed, others boosted — zeroed
    # block's docs still appear (at the tail, score 0.0)
    boost2 = np.ones(SLAB)
    boost2[:BLOCK] = 0.0
    ids2, sc2 = slab_topk_adv(
        chunks, 0, SLAB, BLOCK, 100, BM25_K1, BM25_B, boost=boost2
    )
    assert sorted(ids2.tolist()) == sorted(docs.tolist())
    in_zero = [d for d in docs if d < BLOCK]
    got_zero = [int(d) for d, s in zip(ids2, sc2) if s == 0.0]
    assert sorted(got_zero) == sorted(in_zero)
