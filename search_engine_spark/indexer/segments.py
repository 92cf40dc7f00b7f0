"""Inverted-index segment construction via groupBy().applyInPandas.

Mirrors what Lucene does inside Elasticsearch for the reference
(SURVEY.md §1.4, §7 step 3), Spark-first:

- postings are hash-partitioned by ``(slab, bucket)`` where
  slab = docid // slab_size (a docid-range shard) and
  bucket = xxhash64(term) % term_buckets;
- each group is encoded in ONE vectorized numpy pass
  (``codec.encode_group``) into term-sorted, delta+varint posting
  chunks with aligned block-max skip metadata.

Skew: a hot term's postings are split across slabs by construction
(the docid-range slab is the salt — SURVEY.md §4 "salt hot terms"),
so no single applyInPandas group exceeds
~slab_size * tokens_per_doc / term_buckets rows regardless of df.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer.codec import encode_group

SEGMENT_SCHEMA = (
    "slab int, bucket int, gen int, term string, df long, "
    "max_factor double, postings binary, skips binary, block_max binary"
)


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of the bucket hash (crc32 mod buckets).

    crc32 is chosen over xxhash64 because Python's zlib.crc32 matches
    Spark's F.crc32 bit-for-bit, letting the query planner compute the
    bucket set for the query terms WITHOUT a Spark job and prune
    segment files (each segment file holds exactly one bucket)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def postings_with_keys(postings: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Add (slab, bucket) shuffle keys to a postings DataFrame."""
    return postings.withColumn(
        "slab", (F.col("docid") / cfg.slab_size).cast("int")
    ).withColumn(
        "bucket",
        F.pmod(
            F.crc32(F.col("term").cast("binary")), F.lit(cfg.term_buckets)
        ).cast("int"),
    )


def make_segment_builder(cfg: EngineConfig, avgdl: float, gen: int = 0):
    """Per-(slab, bucket) group encoder for applyInPandas."""
    slab_size, block_size = cfg.slab_size, cfg.block_size
    k1, b = cfg.k1, cfg.b

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "docid"], kind="mergesort")
        slab = int(pdf["slab"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        codes, uniques = pd.factorize(pdf["term"])  # appearance order == sorted
        local = pdf["docid"].to_numpy() - slab * slab_size
        p, s, bm, tmax, dfs = encode_group(
            codes,
            local,
            pdf["tf"].to_numpy(),
            pdf["doclen"].to_numpy(),
            len(uniques),
            block_size,
            k1,
            b,
            avgdl,
        )
        return pd.DataFrame(
            {
                "slab": slab,
                "bucket": bucket,
                "gen": gen,
                "term": uniques,
                "df": dfs,
                "max_factor": tmax,
                "postings": p,
                "skips": s,
                "block_max": bm,
            }
        )

    return build


def build_segments(
    postings: DataFrame, cfg: EngineConfig, avgdl: float, gen: int = 0
) -> DataFrame:
    """postings(term, docid, tf, doclen) -> segment rows."""
    keyed = postings_with_keys(postings, cfg)
    return keyed.groupBy("slab", "bucket").applyInPandas(
        make_segment_builder(cfg, avgdl, gen), schema=SEGMENT_SCHEMA
    )
