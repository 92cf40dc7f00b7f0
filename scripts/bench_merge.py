"""LSM compaction micro-benchmark: byte-splicing merge vs full
decode+re-encode, on identical inputs (build + one appended
generation, index dir copied before each compaction).

Both run back-to-back in the same window, so the RATIO is robust to
this host's throttling even when absolute times are not.

Usage: python scripts/bench_merge.py [--docs 40000] [--cpus 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.indexer.build import (
        append_documents,
        build_index,
        compact_index,
    )
    from search_engine_spark.session import get_spark

    spark = get_spark("bench-merge", parallelism=args.cpus,
                      shuffle_partitions=args.cpus)
    cfg = EngineConfig(
        slab_size=max(1024, args.docs // 48), term_buckets=16, block_size=128
    )
    base = tempfile.mkdtemp(prefix="sgb_merge_")
    idx = os.path.join(base, "idx")
    all_docs = corpus_df(spark, args.docs, partitions=args.cpus * 2).persist()
    d1 = all_docs.filter(F.xxhash64("repo", "path") % 5 != 0)
    d2 = all_docs.filter(F.xxhash64("repo", "path") % 5 == 0)
    build_index(spark, d1, idx, cfg, detailed_metrics=False)
    append_documents(spark, idx, d2)

    results = {}
    for mode in ("splice", "reencode"):
        work = os.path.join(base, mode)
        shutil.copytree(idx, work)
        t0 = time.time()
        compact_index(spark, work, mode=mode)
        results[mode] = round(time.time() - t0, 3)
    ratio = round(results["reencode"] / results["splice"], 2)

    # the auto policy (append_documents(compact="auto")): verify which
    # mode it resolves for this (un-drifted) index and time that path,
    # so the bench row pins "the 3x splice win is the default"
    from search_engine_spark.catalog import store_for
    from search_engine_spark.indexer.build import resolve_compact_mode

    meta = store_for(idx).get_meta(spark)
    auto_mode = resolve_compact_mode("auto", meta)
    work = os.path.join(base, "auto")
    shutil.copytree(idx, work)
    t0 = time.time()
    compact_index(spark, work, mode=auto_mode)
    results["auto"] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "compaction_sec",
                "value": results["splice"],
                "unit": "sec",
                "queries": {
                    "compact_splice": results["splice"],
                    "compact_reencode": results["reencode"],
                    "compact_auto": results["auto"],
                },
                "sf": f"synthetic_{args.docs}",
                "extras": {
                    "parallelism": args.cpus,
                    "speedup_reencode_over_splice": ratio,
                    "auto_resolved_mode": auto_mode,
                },
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
