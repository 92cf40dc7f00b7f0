"""Codec property tests (SURVEY.md §5 test plan item 1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.indexer.codec import (
    TermChunk,
    encode_group,
    tf_norm_factor,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    enc, nb = varint_encode(v)
    assert np.array_equal(varint_decode(enc), v)
    assert nb.sum() == len(enc)


@given(
    st.integers(min_value=1, max_value=5),       # n_terms
    st.integers(min_value=16, max_value=64),     # block_size
    st.data(),
)
@settings(max_examples=25, deadline=None)
def test_encode_group_roundtrip(n_terms, block_size, data):
    slab_size = 1024
    rng = np.random.default_rng(data.draw(st.integers(0, 10**6)))
    rows = []
    for t in range(n_terms):
        n = int(rng.integers(1, 200))
        ids = np.sort(rng.choice(slab_size, size=n, replace=False))
        for d in ids:
            rows.append((t, int(d), int(rng.integers(1, 40)),
                         int(rng.integers(20, 4000))))
    rows.sort()
    tc = np.array([r[0] for r in rows])
    ld = np.array([r[1] for r in rows])
    tf = np.array([r[2] for r in rows])
    dl = np.array([r[3] for r in rows])
    k1, b, avgdl = 1.2, 0.75, 120.0
    p, s, bm, tmax, dfs = encode_group(
        tc, ld, tf, dl, n_terms, block_size, k1, b, avgdl
    )
    for t in range(n_terms):
        m = tc == t
        chunk = TermChunk(p[t], s[t], bm[t])
        d2, t2, l2 = chunk.decode_all(block_size)
        assert np.array_equal(d2, ld[m])
        assert np.array_equal(t2, tf[m])
        assert np.array_equal(l2, dl[m])
        assert dfs[t] == m.sum()
        # block-max bounds are exact per-block maxima (>= any true factor)
        f = tf_norm_factor(tf[m], dl[m], k1, b, avgdl)
        bi = ld[m] // block_size
        for j, bid in enumerate(chunk.block_ids):
            assert chunk.block_max[j] == f[bi == bid].max()
        assert tmax[t] == f.max()
        # selective decode of one random block
        pick = int(rng.integers(0, chunk.n_blocks))
        d3, t3, l3 = chunk.decode_blocks(np.array([pick]), block_size)
        sel_m = bi == chunk.block_ids[pick]
        assert np.array_equal(d3, ld[m][sel_m])
        assert np.array_equal(t3, tf[m][sel_m])
