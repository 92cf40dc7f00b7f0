"""LSM-style segment merge (compaction).

Incremental builds append segment chunks with increasing ``gen``
(generation).  Queries work unmerged (chunks for the same (term, slab)
are additive because docid ranges across generations are disjoint),
but merge compacts them back to one chunk per (term, slab) — the
log-structured merge of the north rule, playing the role of Lucene's
background segment merging.

Merge = decode all generations' chunks per (slab, bucket) group,
concatenate, re-sort, re-encode with the same vectorized codec.
Decode+re-encode is numpy-bound; at 100 TB a byte-splicing merge that
avoids re-encoding interior blocks is the known optimization — the
group boundary and output contract would not change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer.codec import TermChunk, encode_group
from search_engine_spark.indexer.segments import SEGMENT_SCHEMA


def make_segment_merger(cfg: EngineConfig, avgdl: float):
    slab_size, block_size = cfg.slab_size, cfg.block_size
    k1, b = cfg.k1, cfg.b

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        slab = int(pdf["slab"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        terms: list[str] = []
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        counts: list[int] = []
        # decode every chunk (grouped by term)
        for term, grp in pdf.groupby("term", sort=True):
            ds, ts, ls = [], [], []
            for _, row in grp.iterrows():
                c = TermChunk(row["postings"], row["skips"], row["block_max"])
                d, t, l = c.decode_all(block_size)
                ds.append(d)
                ts.append(t)
                ls.append(l)
            d = np.concatenate(ds)
            t = np.concatenate(ts)
            l = np.concatenate(ls)
            order = np.argsort(d, kind="mergesort")
            parts.append((d[order], t[order], l[order]))
            terms.append(term)
            counts.append(len(d))
        if not terms:
            return pd.DataFrame(
                columns=[f.split()[0] for f in SEGMENT_SCHEMA.split(", ")]
            )
        codes = np.repeat(np.arange(len(terms)), counts)
        local = np.concatenate([p[0] for p in parts])
        tf = np.concatenate([p[1] for p in parts])
        dl = np.concatenate([p[2] for p in parts])
        p_, s_, bm_, tmax, dfs = encode_group(
            codes, local, tf, dl, len(terms), block_size, k1, b, avgdl
        )
        return pd.DataFrame(
            {
                "slab": slab,
                "bucket": bucket,
                "gen": 0,
                "term": terms,
                "df": dfs,
                "max_factor": tmax,
                "postings": p_,
                "skips": s_,
                "block_max": bm_,
            }
        )

    return merge


def merge_segments(segments: DataFrame, cfg: EngineConfig, avgdl: float) -> DataFrame:
    return segments.groupBy("slab", "bucket").applyInPandas(
        make_segment_merger(cfg, avgdl), schema=SEGMENT_SCHEMA
    )
