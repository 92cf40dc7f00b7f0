"""Data-plane scaling bench: times the compute-dominant index
pipeline (dedup -> docids -> tokenize -> postings -> segment encode)
as ONE Spark job chain, excluding constant driver-side orchestration
(metadata writes/collects that cost the same at any cluster size and
amortize to noise at 100 TB but dominate a seconds-long sandbox run).

Usage: python scripts/bench_dataplane.py --docs 150000 --cpus 8
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--slab", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.indexer.docmap import build_docmap
    from search_engine_spark.indexer.postings import build_postings
    from search_engine_spark.indexer.segments import (
        build_segments,
        postings_with_keys,
    )
    from search_engine_spark.session import get_spark

    spark = get_spark(
        "dataplane", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    path = f"/tmp/sgb_corpus_{args.docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus_df(spark, args.docs, partitions=max(args.cpus * 2, 16)).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    docs.count()  # warm FS + JVM
    slab = args.slab or max(2048, args.docs // 48)
    cfg = EngineConfig(slab_size=slab, term_buckets=16)

    t0 = time.time()
    dm = build_docmap(docs)
    keyed = postings_with_keys(build_postings(dm), cfg)
    avgdl = 205.0  # constant: block-max factor math, not a data stat
    seg = build_segments(keyed, cfg, avgdl)
    n_chunks = seg.count()  # ONE action drives the whole chain
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "dataplane_index_sec",
                "value": round(wall, 3),
                "unit": "sec",
                "queries": {"dataplane": round(wall, 3)},
                "sf": f"synthetic_{args.docs}",
                "extras": {
                    "parallelism": args.cpus,
                    "docs_per_sec": round(args.docs / wall, 1),
                    "n_chunks": n_chunks,
                    "slab_size": slab,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
