"""Positional posting segments — the Lucene ``.pos`` stream analog.

The main index (segments.py/codec.py) stores (docid, tf, doclen) per
term: everything BM25 bag-of-words retrieval needs, nothing phrase
retrieval needs.  This module persists WHERE each term occurs:
per (term, slab) one compressed chunk of

``posdata`` binary =
    [uint32 len_docid_stream][uint32 len_plen_stream]
    [docid-delta varints   (slab-local; first value absolute-local)]
    [positions-per-doc varints]
    [position varints      (per doc: first absolute, then deltas)]

sharing the main index's layout discipline:

- same ``(slab, bucket)`` shuffle keys and one-file-per-bucket-
  per-slab parquet layout, so the same driver-side crc32 bucket twin
  + slab inventory prune phrase scans to files that can match;
- same varint codec (codec.varint_encode/decode);
- hot-term skew is defused by the same docid-range slab salt: a term
  in 50% of docs still splits across slabs by construction.

Unlike the tf stream there is no block grid: phrase evaluation first
intersects docids across the query's terms (the selective step), then
checks position adjacency only on the survivors — block-max pruning
has no analog for a phrase's conjunctive semantics.

Scale note: the shuffle feeding the encoder carries one row per token
OCCURRENCE (a positional index is inherently occurrence-sized — so is
Lucene's .pos), versus the main build's per-(term, docid) aggregated
postings.  At 100 TB that is the dominant cost of opting into phrase
support, which is why it is a separate opt-in build artifact and not
part of build_index.

Staleness: the builder stamps the corpus size it saw into a
``pos_meta`` table; the engine refuses phrase queries whose main-index
``n_docs`` disagrees (append_documents/compact invalidate positions —
rebuild with build_positional_index, the same "merge rewrites .pos"
rule Lucene applies).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.indexer.codec import varint_decode, varint_encode

POS_SEGMENT_SCHEMA = (
    "slab int, bucket int, term string, df long, posdata binary"
)


def encode_term_positions(
    docids_local: np.ndarray, plens: np.ndarray, positions: np.ndarray
) -> bytes:
    """One (term, slab) chunk: slab-local docids (sorted unique),
    positions-per-doc counts, and the flattened per-doc-sorted
    positions."""
    d = docids_local.astype(np.int64, copy=True)
    d[1:] -= docids_local[:-1]
    p = positions.astype(np.int64, copy=True)
    starts = np.cumsum(plens) - plens
    p[1:] -= positions[:-1]
    p[starts] = positions[starts]  # first position per doc is absolute
    d_b, _ = varint_encode(d.astype(np.uint64))
    l_b, _ = varint_encode(plens.astype(np.uint64))
    p_b, _ = varint_encode(p.astype(np.uint64))
    header = np.array([len(d_b), len(l_b)], dtype="<u4").tobytes()
    return header + d_b.tobytes() + l_b.tobytes() + p_b.tobytes()


def decode_term_positions(
    posdata: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of encode_term_positions -> (docids_local, plens,
    positions), positions flattened in doc order."""
    buf = np.frombuffer(posdata, dtype=np.uint8)
    len_d, len_l = np.frombuffer(posdata[:8], dtype="<u4")
    off = 8
    docids = np.cumsum(varint_decode(buf[off : off + len_d]).astype(np.int64))
    off += int(len_d)
    plens = varint_decode(buf[off : off + len_l]).astype(np.int64)
    off += int(len_l)
    deltas = varint_decode(buf[off:]).astype(np.int64)
    # per-doc cumsum reset at doc heads (same trick as codec._decode_full)
    c = np.cumsum(deltas)
    starts = np.cumsum(plens) - plens
    base = c[starts] - deltas[starts]
    positions = c - np.repeat(base, plens)
    return docids, plens, positions


def make_positions_encoder(slab_size: int):
    """applyInPandas encoder for one (slab, bucket) group of
    (term, docid, pos) occurrence rows."""

    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        slab, bucket = int(key[0]), int(key[1])
        base = slab * slab_size
        pdf = pdf.sort_values(["term", "docid", "pos"], kind="stable")
        terms = pdf["term"].to_numpy()
        docids = pdf["docid"].to_numpy(dtype=np.int64) - base
        pos = pdf["pos"].to_numpy(dtype=np.int64)
        uniq_terms, t_starts = np.unique(terms, return_index=True)
        t_ends = np.append(t_starts[1:], len(terms))
        out = []
        for t, s, e in zip(uniq_terms, t_starts, t_ends):
            d = docids[s:e]
            heads = np.flatnonzero(np.diff(d, prepend=d[0] - 1) != 0)
            plens = np.append(heads[1:], len(d)) - heads
            out.append(
                (
                    slab,
                    bucket,
                    str(t),
                    int(len(heads)),
                    encode_term_positions(d[heads], plens, pos[s:e]),
                )
            )
        return pd.DataFrame(
            out, columns=["slab", "bucket", "term", "df", "posdata"]
        )

    return encode


def build_positional_index(
    spark: SparkSession,
    index_dir: str,
    use_arrow_udf: bool = True,
    incremental: bool = True,
) -> dict:
    """Build (or extend) the positional segments for an EXISTING
    index.

    Re-tokenizes the persisted docmap (deterministic — the same
    tokenizer the build used; build_index deliberately does not
    persist token arrays) and writes ``possegments`` (partitioned by
    slab, one file per bucket) + the ``pos_meta`` staleness stamp.

    ``incremental=True`` (default): when a pos_meta stamp exists and
    docids are append-only contiguous (they are — append_documents
    assigns new docids AFTER all existing, build.py:354), only docs
    from the first slab the new docids touch onward are re-tokenized
    and only those slab partitions are overwritten — the boundary
    slab is re-encoded whole because chunks are per-(slab, bucket)
    files.  At 100 TB this is what makes phrase support maintainable:
    appending 1% of the corpus costs ~1% of the positional build, not
    a full re-tokenize.  Compaction keeps docids and content, so a
    compacted index's positional segments stay valid without any
    rebuild (the stamp survives: n_docs is unchanged).
    """
    import time

    from search_engine_spark.catalog import store_for
    from search_engine_spark.tokenizer import tokens_col, tokens_udf_col

    t0 = time.time()
    store = store_for(index_dir)
    meta = store.get_meta(spark)
    slab_size = int(meta["slab_size"])
    n_buckets = int(meta["term_buckets"])
    n_docs = int(meta["n_docs"])
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    docmap = store.read(spark, "docmap")
    from_docid = 0
    mode = "full"
    if incremental and store.exists("pos_meta", spark):
        covered = int(
            store.read(spark, "pos_meta").collect()[0]["n_docs"]
        )
        if covered == n_docs:
            return {"t_positions": 0.0, "mode": "noop", "from_docid": n_docs}
        if 0 < covered < n_docs:
            # rewrite from the head of the slab the first new docid
            # lands in (whole-slab files; earlier slabs are immutable)
            from_docid = (covered // slab_size) * slab_size
            mode = "incremental"
            docmap = docmap.filter(F.col("docid") >= from_docid)
    tok = tokens_udf_col("content") if use_arrow_udf else tokens_col("content")
    occ = (
        docmap.select("docid", tok.alias("tokens"))
        .select("docid", F.posexplode("tokens").alias("pos", "term"))
        .withColumn("slab", (F.col("docid") / slab_size).cast("int"))
        .withColumn(
            "bucket",
            F.pmod(
                F.crc32(F.col("term").cast("binary")), F.lit(n_buckets)
            ).cast("int"),
        )
    )
    seg = occ.groupBy("slab", "bucket").applyInPandas(
        make_positions_encoder(slab_size), schema=POS_SEGMENT_SCHEMA
    )
    # full rebuild replaces the TABLE (under the session's dynamic
    # partitionOverwriteMode an "overwrite" of a partitioned path only
    # replaces touched partitions — stale high slabs would survive if
    # the corpus ever shrank, e.g. a fresh build_index into the same
    # dir); incremental touches only the partitions it carries
    if mode == "full":
        store.drop("possegments", spark)
    store.write(
        seg, "possegments", mode="dynamic_overwrite", partition_by="slab"
    )
    store.refresh(spark, "possegments")
    stamp = spark.createDataFrame([(n_docs,)], "n_docs long")
    store.write(stamp, "pos_meta")
    store.refresh(spark, "pos_meta")
    return {
        "t_positions": round(time.time() - t0, 2),
        "mode": mode,
        "from_docid": from_docid,
    }


def make_phrase_matcher(terms: list[str], slab_size: int, slop: int = 0):
    """applyInPandas kernel for one slab's pruned positional chunks:
    (docid global, ptf) for docs containing ``terms`` as an exact
    adjacent run — or, with ``slop > 0``, as an in-order proximity
    chain (Lucene SpanNearQuery inOrder=true analog): ptf = number of
    start positions beginning an increasing chain with total gap
    <= slop.  The slop path replaces the intersection fold with a
    vectorized GREEDY chain walk over the same composite keys
    (docid*M + pos is sorted, so "smallest position of term j in the
    same doc greater than p_{j-1}" is one searchsorted per offset);
    greedy minimizes the span, so chain-exists iff greedy-valid — the
    count is exact.  slop=0 keeps the intersection fast path; the two
    agree there by construction (adjacency = chain with gap 0),
    pinned in pytest against the scan form.

    All-numpy composite-key intersection — no per-doc Python objects:
    term at phrase offset j contributes keys
    ``docid_local * M + (pos - j + n)`` (M = max position + n + 1, a
    common per-slab radix; the +n keeps keys non-negative), so a
    phrase start at p in doc d is the single integer d*M + (p + n)
    surviving the intersection across ALL offsets.  Keys are unique
    per offset ((docid, pos) is unique), so ``np.intersect1d(...,
    assume_unique=True)`` applies; offsets are folded smallest-stream
    first with an empty-accumulator early exit.  Duplicate phrase
    terms reuse the same decoded chunk at each of their offsets.

    This is the same plan shape as the BM25 scorer
    (query/wand.make_slab_scorer): only the COMPRESSED chunks of the
    query's terms ever shuffle; position work is slab-local.
    """
    n = len(terms)

    def match(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        base = int(key[0]) * slab_size
        decoded: dict[str, tuple] = {}
        for t, blob in zip(pdf["term"], pdf["posdata"]):
            decoded[t] = decode_term_positions(bytes(blob))
        empty = pd.DataFrame({
            "docid": pd.Series([], dtype="int64"),
            "ptf": pd.Series([], dtype="int64"),
        })
        if any(t not in decoded for t in terms):
            return empty
        maxpos = max(
            (int(p.max()) if len(p) else 0)
            for _, _, p in (decoded[t] for t in set(terms))
        )
        m_radix = maxpos + n + 1
        if slop > 0:
            # greedy in-order chain over sorted composite keys
            key_arrays = []
            for j in range(n):
                d, plens, pos = decoded[terms[j]]
                key_arrays.append(
                    np.repeat(d, plens) * m_radix + pos
                )
            starts = key_arrays[0]
            cur = starts
            valid = np.ones(len(starts), dtype=bool)
            for j in range(1, n):
                kj = key_arrays[j]
                if len(kj) == 0:
                    return empty
                idx = np.searchsorted(kj, cur, side="right")
                ok = idx < len(kj)
                nxt = kj[np.minimum(idx, len(kj) - 1)]
                ok &= (nxt // m_radix) == (starts // m_radix)
                valid &= ok
                cur = np.where(ok, nxt, cur)
            span_ok = (cur % m_radix) - (starts % m_radix) - (n - 1) <= slop
            sel = starts[valid & span_ok]
            if sel.size == 0:
                return empty
            docids, counts = np.unique(sel // m_radix, return_counts=True)
            return pd.DataFrame(
                {"docid": docids + base, "ptf": counts.astype(np.int64)}
            )
        offsets = sorted(
            range(n), key=lambda j: len(decoded[terms[j]][2])
        )
        acc = None
        for j in offsets:
            d, plens, pos = decoded[terms[j]]
            keys = np.repeat(d, plens) * m_radix + (pos - j + n)
            acc = (
                keys
                if acc is None
                else np.intersect1d(acc, keys, assume_unique=True)
            )
            if acc.size == 0:
                return empty
        docids, counts = np.unique(acc // m_radix, return_counts=True)
        return pd.DataFrame(
            {"docid": docids + base, "ptf": counts.astype(np.int64)}
        )

    return match


def decode_pos_rows_df(pruned: DataFrame, slab_size: int) -> DataFrame:
    """possegments rows -> (term, docid global, positions array<int>)
    via Arrow mapInPandas (vectorized decode, no per-row Python in the
    varint kernels)."""

    def gen(batches):
        for pdf in batches:
            terms, docids, poslists = [], [], []
            for term, slab, blob in zip(
                pdf["term"], pdf["slab"], pdf["posdata"]
            ):
                d, plens, pos = decode_term_positions(bytes(blob))
                d = d + int(slab) * slab_size
                bounds = np.cumsum(plens)[:-1]
                terms.extend([term] * len(d))
                docids.extend(d.tolist())
                poslists.extend(
                    [a.astype(np.int32) for a in np.split(pos, bounds)]
                )
            yield pd.DataFrame(
                {"term": terms, "docid": docids, "positions": poslists}
            )

    return pruned.mapInPandas(
        gen, schema="term string, docid long, positions array<int>"
    )
