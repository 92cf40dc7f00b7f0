"""LSM-style segment merge (compaction).

Incremental builds append segment chunks with increasing ``gen``
(generation).  Queries work unmerged (chunks for the same (term, slab)
are additive because docid ranges across generations are disjoint),
but merge compacts them back to one chunk per (term, slab) — the
log-structured merge of the north rule, playing the role of Lucene's
background segment merging.

Two merge strategies, same group boundary and output contract:

- ``merge_segments`` (re-encode): decode all generations' chunks per
  (slab, bucket) group, concatenate, re-sort, re-encode with the
  vectorized codec — refreshes block-max bounds to the current avgdl.
- ``splice_segments`` (byte-splicing, codec.splice_merge): posting
  bytes concatenate verbatim, at most one varint re-encoded per
  generation boundary, single-generation terms pass through without
  parsing — measured 3.1-3.2x faster (BENCH/BASELINE.md); bounds
  keep their per-generation avgdl basis, exact via bound_scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer.codec import TermChunk, encode_group
from search_engine_spark.indexer.segments import SEGMENT_SCHEMA


def make_segment_merger(
    cfg: EngineConfig,
    avgdl: float,
    avgdl_title: float | None = None,
    drop: np.ndarray | None = None,
):
    """Per-(slab, bucket) merger.  Title-namespace terms (TITLE_PREFIX)
    re-encode with the title field's avgdl; everything else with the
    content avgdl — block-max bounds stay per-field-exact after
    compaction.

    ``drop`` (sorted unique GLOBAL docids — the tombstone set) purges
    deleted documents during the re-encode: their postings simply
    never reach the new chunks, and a term whose postings empty out
    vanishes from the segments table entirely (its df follows from the
    emitted rows).  This is the Lucene merge-applies-deletes rule —
    deletions cost nothing at delete time and are physically reclaimed
    here."""
    from search_engine_spark.config import TITLE_PREFIX

    block_size = cfg.block_size
    k1, b = cfg.k1, cfg.b
    slab_size = cfg.slab_size

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        slab = int(pdf["slab"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        drop_local = None
        if drop is not None and len(drop):
            lo = np.searchsorted(drop, slab * slab_size)
            hi = np.searchsorted(drop, (slab + 1) * slab_size)
            if hi > lo:
                drop_local = drop[lo:hi] - slab * slab_size
        terms: list[str] = []
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        counts: list[int] = []
        # decode every chunk (grouped by term); itertuples — rows are
        # segment chunks (thousands per group at most), decode is the
        # numpy-bound part
        for term, grp in pdf.groupby("term", sort=True):
            ds, ts, ls = [], [], []
            for row in grp.itertuples():
                c = TermChunk(row.postings, row.skips, row.block_max)
                d, t, l = c.decode_all(block_size)
                ds.append(d)
                ts.append(t)
                ls.append(l)
            d = np.concatenate(ds)
            t = np.concatenate(ts)
            l = np.concatenate(ls)
            if drop_local is not None:
                pos = np.searchsorted(drop_local, d)
                pos[pos >= len(drop_local)] = len(drop_local) - 1
                keep = drop_local[pos] != d
                d, t, l = d[keep], t[keep], l[keep]
                if len(d) == 0:
                    continue
            order = np.argsort(d, kind="mergesort")
            parts.append((d[order], t[order], l[order]))
            terms.append(term)
            counts.append(len(d))
        if not terms:
            return pd.DataFrame(
                columns=[f.split()[0] for f in SEGMENT_SCHEMA.split(", ")]
            )

        out: list[pd.DataFrame] = []
        is_title = np.array(
            [t.startswith(TITLE_PREFIX) for t in terms], dtype=bool
        )
        for sel_title, field_avgdl in (
            (False, avgdl),
            (True, avgdl_title if avgdl_title is not None else avgdl),
        ):
            idx = np.flatnonzero(is_title == sel_title)
            if len(idx) == 0:
                continue
            f_terms = [terms[i] for i in idx]
            f_counts = [counts[i] for i in idx]
            codes = np.repeat(np.arange(len(idx)), f_counts)
            local = np.concatenate([parts[i][0] for i in idx])
            tf = np.concatenate([parts[i][1] for i in idx])
            dl = np.concatenate([parts[i][2] for i in idx])
            p_, s_, bm_, tmax, dfs = encode_group(
                codes, local, tf, dl, len(idx), block_size, k1, b,
                field_avgdl,
            )
            out.append(
                pd.DataFrame(
                    {
                        "slab": slab,
                        "bucket": bucket,
                        "gen": 0,
                        "term": f_terms,
                        "df": dfs,
                        "max_factor": tmax,
                        "postings": p_,
                        "skips": s_,
                        "block_max": bm_,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return merge


def merge_segments(
    segments: DataFrame,
    cfg: EngineConfig,
    avgdl: float,
    avgdl_title: float | None = None,
    drop: np.ndarray | None = None,
) -> DataFrame:
    return segments.groupBy("slab", "bucket").applyInPandas(
        make_segment_merger(cfg, avgdl, avgdl_title, drop),
        schema=SEGMENT_SCHEMA,
    )


def make_segment_splicer():
    """Byte-splicing merger (codec.splice_merge): concatenates the
    generations' posting bytes per (term, slab) with at most one
    varint re-encoded per generation boundary — no decode of interior
    blocks, so merge cost is O(bytes moved), the 100x-scale LSM merge.

    Generations' docid ranges are disjoint and ascending within a
    slab by construction (appends allocate docids past the old max),
    which is exactly splice_merge's precondition.  Block-max values
    keep their per-generation avgdl basis, so callers must PRESERVE
    the index's norm_avgdl (query-time bound_scale keeps pruning
    exact); a re-encode merge is what tightens bounds.
    """
    from search_engine_spark.indexer.codec import splice_merge

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.split()[0] for f in SEGMENT_SCHEMA.split(", ")]
        slab = int(pdf["slab"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        # Fast path: a term present in only ONE generation needs no
        # merge at all — its bytes pass through verbatim.  After one
        # append most of the vocabulary (the df-1 tail) is single-gen,
        # so this pandas-vectorized split is what makes splice cheap.
        sizes = pdf.groupby("term")["term"].transform("size")
        singles = pdf[sizes == 1]
        out_single = singles[cols].copy()
        out_single["gen"] = 0
        multis = pdf[sizes > 1]
        if len(multis) == 0:
            return out_single
        recs = []
        for term, grp in multis.sort_values(
            ["term", "gen"], kind="mergesort"
        ).groupby("term", sort=False):
            p, s, bm = splice_merge(
                [
                    (r.postings, r.skips, r.block_max)
                    for r in grp.itertuples()
                ]
            )
            recs.append(
                (
                    slab, bucket, 0, term,
                    int(grp["df"].sum()),
                    float(grp["max_factor"].max()),
                    p, s, bm,
                )
            )
        return pd.concat(
            [out_single, pd.DataFrame(recs, columns=cols)],
            ignore_index=True,
        )

    return merge


def splice_segments(segments: DataFrame) -> DataFrame:
    return segments.groupBy("slab", "bucket").applyInPandas(
        make_segment_splicer(), schema=SEGMENT_SCHEMA
    )
