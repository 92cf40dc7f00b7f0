"""Posting-list codec: docid-delta + varint, aligned block-max skips.

Pure numpy, fully vectorized (the only Python-level loops are over
varint byte positions, <= 10 iterations, and per-term output slicing).
This is the part the reference outsources to Lucene (SURVEY.md §1.4):
term-sorted posting lists, delta + varint compression, block-level
skip/max metadata for Block-Max WAND.

Layout per (term, slab):

``postings`` binary =
    [uint32 len_docid_stream][uint32 len_tf_stream]
    [docid-delta varints][tf varints][doclen varints]

Docids are slab-local (docid - slab_base).  The block grid is ALIGNED
on absolute docid ranges: block b covers local docids
[b*block_size, (b+1)*block_size) — the same grid for every term in
the slab, so per-block upper bounds can be summed across terms during
WAND pruning.  The first posting of each block stores its offset from
the block base; subsequent postings store deltas — every block is
independently decodable.

``skips`` binary = int32 array
    [n_blocks][block_id x n][start_idx x n][off_d x n][off_t x n][off_l x n]
    (offsets are byte offsets into the respective stream; start_idx is
    the posting ordinal at the block head — counts come from diffs.)

``block_max`` binary = float64 array: per-block max of the BM25
tf-norm factor  tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)); multiplied by
idf at query time it upper-bounds any score contribution in the block.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array -> (bytes uint8 array, per-value byte length)."""
    v = values.astype(np.uint64, copy=False)
    nb = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        nb += v >= t
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]) if len(v) else 0, dtype=np.uint8)
    maxnb = int(nb.max()) if len(v) else 0
    for j in range(maxnb):
        mask = nb > j
        idx = starts[mask] + j
        byte = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = np.where(j < nb[mask] - 1, 0x80, 0)
        out[idx] = byte.astype(np.uint8) | cont.astype(np.uint8)
    return out, nb


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """uint8 array of concatenated varints -> uint64 values.

    Fast paths (r5, profiled on the 1M-doc serving head): an
    all-single-byte stream (hot-term docid deltas, most tfs) returns
    with one comparison; otherwise the leading byte of every value is
    a direct vectorized assignment and only the minority continuation
    bytes go through the unbuffered ``np.add.at``."""
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.asarray(buf, dtype=np.uint8)
    last = (buf & 0x80) == 0
    if bool(last.all()):  # every varint is one byte
        return buf.astype(np.uint64)
    n = int(last.sum())
    gid = np.cumsum(last) - last  # value index per byte
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(last)
    starts[1:] = ends[:-1] + 1
    vals = (buf[starts] & np.uint8(0x7F)).astype(np.uint64)
    pos = np.arange(len(buf), dtype=np.int64) - starts[gid]
    rest = np.flatnonzero(pos > 0)
    np.add.at(
        vals,
        gid[rest],
        (buf[rest] & np.uint8(0x7F)).astype(np.uint64)
        << (7 * pos[rest]).astype(np.uint64),
    )
    return vals


def tf_norm_factor(tf, dl, k1: float, b: float, avgdl: float):
    """BM25 term-frequency normalization factor (vectorized)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


class TermChunk:
    """Decoded handle over one (term, slab) chunk."""

    __slots__ = ("postings", "n_blocks", "block_ids", "start_idx",
                 "off_d", "off_t", "off_l", "block_max", "df",
                 "_d", "_t", "_l", "_full", "_full_block_size",
                 "_total", "_fnorm")

    def __init__(self, postings: bytes, skips: bytes, block_max: bytes):
        self.postings = postings
        hdr = np.frombuffer(postings[:8], dtype=np.uint32)
        ld, lt = int(hdr[0]), int(hdr[1])
        body = np.frombuffer(postings, dtype=np.uint8)[8:]
        self._d = body[:ld]
        self._t = body[ld:ld + lt]
        self._l = body[ld + lt:]
        sk = np.frombuffer(skips, dtype=np.int32)
        nb = int(sk[0])
        self.n_blocks = nb
        self.block_ids = sk[1:1 + nb]
        self.start_idx = sk[1 + nb:1 + 2 * nb]
        self.off_d = sk[1 + 2 * nb:1 + 3 * nb]
        self.off_t = sk[1 + 3 * nb:1 + 4 * nb]
        self.off_l = sk[1 + 4 * nb:1 + 5 * nb]
        self.block_max = np.frombuffer(block_max, dtype=np.float64)
        # df = total postings; start_idx end sentinel not stored:
        self.df = None  # set by caller if needed
        self._full = None  # adaptive full-decode memo (decode_blocks)
        self._full_block_size = None  # block_size the memo was built at
        self._total = None  # memoized posting count (_count_total)
        self._fnorm = None  # memoized tf-norm factors (factor_all)

    def _slices(self, sel: np.ndarray, off: np.ndarray, stream: np.ndarray):
        if len(sel) == 0:
            return np.zeros(0, dtype=np.uint8)
        if len(sel) == len(off):  # full decode: the stream verbatim
            return stream
        ends = np.concatenate([off[1:], [len(stream)]])
        starts, stops = off[sel], ends[sel]
        lens = stops - starts
        total = int(lens.sum())
        if total == 0:
            return np.zeros(0, dtype=np.uint8)
        # vectorized multi-range gather (no per-block Python loop)
        offs = np.cumsum(lens) - lens
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs, lens)
            + np.repeat(starts, lens)
        )
        return stream[idx]

    def decode_blocks(self, sel: np.ndarray, block_size: int):
        """Decode selected blocks (indices into this chunk's block list).

        Returns (local_docids, tfs, dls) as numpy arrays.

        Adaptive memo (r5, profiled on the 1M-doc serving head): once
        a single call wants >=1/3 of the chunk's blocks, the WHOLE
        chunk is decoded once and kept on the object (``_full``);
        this and later calls become pure vectorized gathers.  Bounds
        the worst-case extra decode at 3x one call while collapsing
        the per-batch varint/call overhead that dominated hot-term
        queries.  Values are integers, so full-vs-partial decode is
        bit-identical (delta cumsums reset at block heads either way).
        """
        if len(sel) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        sel = np.asarray(sel)
        if self._full is None and 3 * len(sel) >= self.n_blocks:
            self._full = self._decode_full(block_size)
            self._full_block_size = block_size
        if self._full is not None:
            # the memo bakes block_size into the docid bases; a call
            # with a different block_size must not silently reuse it
            assert self._full_block_size == block_size, (
                f"decode_blocks memo built at block_size="
                f"{self._full_block_size}, called with {block_size}"
            )
            local, t_all, dl_all, p_starts, p_ends = self._full
            if len(sel) == self.n_blocks:
                return local, t_all, dl_all
            starts, stops = p_starts[sel], p_ends[sel]
            lens = stops - starts
            total = int(lens.sum())
            if total == 0:
                z = np.zeros(0, dtype=np.int64)
                return z, z, z
            offs = np.cumsum(lens) - lens
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(offs, lens)
                + np.repeat(starts, lens)
            )
            return local[idx], t_all[idx], dl_all[idx]
        d = varint_decode(self._slices(sel, self.off_d, self._d)).astype(np.int64)
        t = varint_decode(self._slices(sel, self.off_t, self._t)).astype(np.int64)
        dl = varint_decode(self._slices(sel, self.off_l, self._l)).astype(np.int64)
        # counts per selected block (start_idx ordinals + total sentinel)
        all_ends = np.concatenate([self.start_idx[1:], [self._count_total()]])
        counts = (all_ends - self.start_idx)[sel]
        # delta -> absolute within block: first of each block is offset
        # from block base, the rest are deltas (cumsum reset at heads).
        heads = np.zeros(len(d), dtype=bool)
        heads[np.cumsum(counts)[:-1]] = True
        heads[0] = True
        base_per_posting = np.repeat(
            self.block_ids[sel].astype(np.int64) * block_size, counts
        )
        csum = np.cumsum(d)
        head_pos = np.flatnonzero(heads)
        offset = csum - np.repeat(csum[head_pos] - d[head_pos], counts)
        local = base_per_posting + offset
        return local, t, dl

    def _count_total(self) -> int:
        # total postings in chunk = number of tf varints (memoized —
        # this is an O(stream) scan called once per decode otherwise)
        if self._total is None:
            self._total = int(((self._t & 0x80) == 0).sum())
        return self._total

    def _decode_full(self, block_size: int):
        """Decode every block once; returns (local, tf, dl, posting
        start ordinals per block, posting end ordinals per block)."""
        d = varint_decode(self._d).astype(np.int64)
        t = varint_decode(self._t).astype(np.int64)
        dl = varint_decode(self._l).astype(np.int64)
        total = self._count_total()
        p_starts = self.start_idx.astype(np.int64)
        p_ends = np.concatenate([p_starts[1:], [total]])
        counts = p_ends - p_starts
        heads = np.zeros(len(d), dtype=bool)
        heads[p_starts] = True
        base_per_posting = np.repeat(
            self.block_ids.astype(np.int64) * block_size, counts
        )
        csum = np.cumsum(d)
        head_pos = np.flatnonzero(heads)
        offset = csum - np.repeat(csum[head_pos] - d[head_pos], counts)
        return base_per_posting + offset, t, dl, p_starts, p_ends

    def decode_all(self, block_size: int):
        return self.decode_blocks(np.arange(self.n_blocks), block_size)

    def factor_all(self, block_size: int, k1: float, b: float, avgdl: float):
        """(local docids, BM25 tf-norm factors) for the whole chunk.

        The factor ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` is
        query-INDEPENDENT (tf/dl are stored per posting; k1/b/avgdl are
        per-index/per-field constants), so it is memoized per
        ``(k1, b, avgdl)`` — the serving-head analog of Lucene
        precomputing norms/impacts at index time.  Same
        ``tf_norm_factor`` call either way, so scores are bit-identical
        to computing it per query."""
        key = (k1, b, avgdl)
        if self._full is None:
            self._full = self._decode_full(block_size)
            self._full_block_size = block_size
        assert self._full_block_size == block_size
        local, tf, dl = self._full[0], self._full[1], self._full[2]
        if self._fnorm is None or self._fnorm[0] != key:
            self._fnorm = (key, tf_norm_factor(tf, dl, k1, b, avgdl))
        return local, self._fnorm[1]


def splice_merge(chunks: list[tuple[bytes, bytes, bytes]]):
    """Byte-splicing merge of same-term chunks from successive
    generations — the 100x-scale alternative to decode+re-encode.

    Precondition (holds by construction for LSM generations): chunks
    are ordered by generation and their local-docid ranges are
    disjoint and ascending (appended docs always get higher docids).

    Because every block is independently decodable (the block head
    stores its offset from the block base, codec layout above), the
    docid/tf/doclen byte streams CONCATENATE verbatim; only when two
    adjacent generations share the boundary block does exactly ONE
    varint (the later chunk's first delta) need re-encoding, becoming
    a delta from the earlier chunk's last docid.  Skip entries get
    integer offset shifts; block_max arrays concatenate (shared
    boundary block keeps the max of the two).

    Bound caveat: each generation's block_max was computed with that
    generation's avgdl.  The spliced chunk keeps those values, so
    query-time exactness relies on the engine's bound_scale =
    avgdl_now / norm_avgdl (norm_avgdl = min over generations), the
    same mechanism that makes un-compacted generations exact.  A full
    re-encode (merge.py default) is what tightens bounds.

    Returns (postings bytes, skips bytes, block_max bytes).
    """
    assert chunks
    if len(chunks) == 1:
        return chunks[0]

    # List accumulation: each generation appends O(its own bytes) of
    # parts and the final assembly concatenates ONCE, so a term
    # spread over G generations moves O(total_bytes), not
    # O(G * total_bytes).  The only cross-generation state the
    # boundary re-encode needs is the docid-stream TAIL from the
    # last block head onward (`tail_d`), carried explicitly.
    acc = TermChunk(*chunks[0])
    parts_d = [np.array(acc._d, copy=True)]
    parts_t = [np.array(acc._t, copy=True)]
    parts_l = [np.array(acc._l, copy=True)]
    parts_ids = [np.array(acc.block_ids, dtype=np.int64)]
    parts_start = [np.array(acc.start_idx, dtype=np.int64)]
    parts_offd = [np.array(acc.off_d, dtype=np.int64)]
    parts_offt = [np.array(acc.off_t, dtype=np.int64)]
    parts_offl = [np.array(acc.off_l, dtype=np.int64)]
    parts_bm = [np.array(acc.block_max, copy=True)]
    len_d, len_t, len_l = len(acc._d), len(acc._t), len(acc._l)
    a_count = acc._count_total()
    last_block_id = int(acc.block_ids[-1])
    tail_d = parts_d[0][int(acc.off_d[-1]):]

    for nxt in chunks[1:]:
        b = TermChunk(*nxt)
        b_d = np.asarray(b._d)
        b_count = b._count_total()
        shared = int(b.block_ids[0]) == last_block_id
        if shared:
            # Both positions are offsets WITHIN the shared block, so
            # no block_size is needed: A's last docid offset is the
            # sum of its last block's deltas, B's head stores its own
            # offset from the block base.  Re-encode that ONE varint
            # as a delta from A's last docid.
            d_tail = varint_decode(tail_d).astype(np.int64)
            last_local_off = int(d_tail.sum())  # offset within block
            b_head_nbytes = int(
                np.flatnonzero((b_d & 0x80) == 0)[0] + 1
            )
            b_head_off = int(varint_decode(b_d[:b_head_nbytes])[0])
            # new delta: distance within the SAME block
            new_delta = np.uint64(b_head_off - last_local_off)
            new_head, _ = varint_encode(np.array([new_delta]))
            shift = len(new_head) - b_head_nbytes
            nb_d = np.concatenate([new_head, b_d[b_head_nbytes:]])
        else:
            shift = 0
            nb_d = b_d

        parts_d.append(nb_d)
        parts_t.append(np.asarray(b._t))
        parts_l.append(np.asarray(b._l))

        b_ids = np.asarray(b.block_ids, dtype=np.int64)
        b_start = np.asarray(b.start_idx, dtype=np.int64) + a_count
        b_offd = np.asarray(b.off_d, dtype=np.int64) + len_d
        # entries after the re-encoded head varint shift by `shift`
        if shift:
            b_offd = b_offd.copy()
            b_offd[1:] += shift
        b_offt = np.asarray(b.off_t, dtype=np.int64) + len_t
        b_offl = np.asarray(b.off_l, dtype=np.int64) + len_l
        b_bm = np.asarray(b.block_max)

        if shared:
            # B's first block folds into the accumulated last skip
            # entry (the last element of the last non-empty bm part)
            fold = max(float(parts_bm[-1][-1]), float(b_bm[0]))
            parts_bm[-1] = parts_bm[-1].copy()
            parts_bm[-1][-1] = fold
            b_ids = b_ids[1:]
            b_start = b_start[1:]
            b_offd = b_offd[1:]
            b_offt = b_offt[1:]
            b_offl = b_offl[1:]
            b_bm = b_bm[1:]

        if len(b_ids):
            parts_ids.append(b_ids)
            parts_start.append(b_start)
            parts_offd.append(b_offd)
            parts_offt.append(b_offt)
            parts_offl.append(b_offl)
            parts_bm.append(b_bm)
            last_block_id = int(b_ids[-1])
            # new last block head sits inside nb_d at B's local
            # offset (shifted when it is not B's own head varint)
            local_head = int(np.asarray(b.off_d)[-1])
            if local_head > 0:
                local_head += shift
            tail_d = nb_d[local_head:]
        else:
            # generation folded entirely into the shared block: the
            # last block head is unchanged, its bytes just grew
            tail_d = np.concatenate([tail_d, nb_d])
        len_d += len(nb_d)
        len_t += len(parts_t[-1])
        len_l += len(parts_l[-1])
        a_count += b_count

    a_d = np.concatenate(parts_d)
    a_t = np.concatenate(parts_t)
    a_l = np.concatenate(parts_l)
    a_ids = np.concatenate(parts_ids)
    a_start = np.concatenate(parts_start)
    a_offd = np.concatenate(parts_offd)
    a_offt = np.concatenate(parts_offt)
    a_offl = np.concatenate(parts_offl)
    a_bm = np.concatenate(parts_bm)

    hdr = np.array([len(a_d), len(a_t)], dtype=np.uint32).tobytes()
    postings = hdr + a_d.tobytes() + a_t.tobytes() + a_l.tobytes()
    skips = np.concatenate(
        [[len(a_ids)], a_ids, a_start, a_offd, a_offt, a_offl]
    ).astype(np.int32).tobytes()
    return postings, skips, a_bm.tobytes()


def encode_group(
    term_codes: np.ndarray,
    local_docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    n_terms: int,
    block_size: int,
    k1: float,
    b: float,
    avgdl: float,
):
    """Encode MANY terms' postings in one vectorized pass.

    Inputs must be sorted by (term_code, local_docid).  Returns, per
    term (arrays/lists of length n_terms):
    postings bytes, skips bytes, block_max bytes, max_factor, df.
    """
    n = len(term_codes)
    if n == 0:
        return [], [], [], np.zeros(0), np.zeros(0, dtype=np.int64)
    term_codes = np.asarray(term_codes, dtype=np.int64)
    local = np.asarray(local_docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)

    block_ids = local // block_size
    term_start = np.zeros(n, dtype=bool)
    term_start[0] = True
    term_start[1:] = term_codes[1:] != term_codes[:-1]
    block_head = np.zeros(n, dtype=bool)
    block_head[0] = True
    block_head[1:] = (block_ids[1:] != block_ids[:-1]) | term_start[1:]

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = local[0] - block_ids[0] * block_size
    deltas[1:] = local[1:] - local[:-1]
    heads = np.flatnonzero(block_head)
    deltas[heads] = local[heads] - block_ids[heads] * block_size

    d_bytes, d_nb = varint_encode(deltas.astype(np.uint64))
    t_bytes, t_nb = varint_encode(tfs.astype(np.uint64))
    l_bytes, l_nb = varint_encode(dls.astype(np.uint64))
    d_end = np.cumsum(d_nb)
    t_end = np.cumsum(t_nb)
    l_end = np.cumsum(l_nb)
    d_start = d_end - d_nb
    t_start = t_end - t_nb
    l_start = l_end - l_nb

    factors = tf_norm_factor(tfs, dls, k1, b, avgdl)
    # per-block max factor (reduceat over block heads)
    blk_max = np.maximum.reduceat(factors, heads)

    term_head_pos = np.flatnonzero(term_start)
    term_end_pos = np.concatenate([term_head_pos[1:], [n]])
    dfs = term_end_pos - term_head_pos
    # term-level max factor
    term_max = np.maximum.reduceat(factors, term_head_pos)

    # map each block head to its owning term
    blk_term = np.searchsorted(term_head_pos, heads, side="right") - 1
    n_blocks_per_term = np.bincount(blk_term, minlength=n_terms)
    blk_term_first = np.concatenate([[0], np.cumsum(n_blocks_per_term)])[:-1]

    postings_out: list[bytes] = []
    skips_out: list[bytes] = []
    blockmax_out: list[bytes] = []

    d_all = d_bytes.tobytes()
    t_all = t_bytes.tobytes()
    l_all = l_bytes.tobytes()
    for ti in range(n_terms):
        p0, p1 = term_head_pos[ti], term_end_pos[ti]
        db0, db1 = int(d_start[p0]), int(d_end[p1 - 1])
        tb0, tb1 = int(t_start[p0]), int(t_end[p1 - 1])
        lb0, lb1 = int(l_start[p0]), int(l_end[p1 - 1])
        hdr = np.array([db1 - db0, tb1 - tb0], dtype=np.uint32).tobytes()
        postings_out.append(hdr + d_all[db0:db1] + t_all[tb0:tb1] + l_all[lb0:lb1])

        b0 = blk_term_first[ti]
        b1 = b0 + n_blocks_per_term[ti]
        hsel = heads[b0:b1]
        sk = np.concatenate([
            [n_blocks_per_term[ti]],
            block_ids[hsel],
            hsel - p0,                       # start posting ordinal
            d_start[hsel] - d_start[p0],     # byte offsets, term-relative
            t_start[hsel] - t_start[p0],
            l_start[hsel] - l_start[p0],
        ]).astype(np.int32)
        skips_out.append(sk.tobytes())
        blockmax_out.append(blk_max[b0:b1].tobytes())

    return postings_out, skips_out, blockmax_out, term_max, dfs
