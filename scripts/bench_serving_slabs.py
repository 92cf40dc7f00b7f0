"""Serving-latency-vs-slab-count evidence (VERDICT r2 item 9).

The no-Spark serving path (engine.search_local*) must stay flat as
the index's slab count grows: at 10M+ docs a term's postings live in
only the slabs that contain it, and the driver-side (term, slab)
inventory (indexer/build.write_term_slabs) prunes every other slab
from both the pyarrow filter and the partition listing.  Without the
inventory, every (bucket, term) row across ALL slabs is read and
latency grows with slab count even for df=1 terms.

This bench builds the SAME corpus into two indexes whose slab counts
differ ~10x, then times 3 passes of (a) the 12 reference queries and
(b) 12 df=1 anchor-term queries on each, pruned and unpruned.
Per-level minima over passes are reported (this host suffers episodic
CPU-steal; the minimum approximates the code's own cost).

Usage: python scripts/bench_serving_slabs.py [--docs 40000] [--cpus 8]
Prints one JSON line; append it to BENCH/serving_slabs.jsonl.
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

REFERENCE_QUERIES = [
    "java", "python tutorial", "search algorithm", "database index merge",
    "parse_token_id", "QueryParserImpl", "bug framework api",
    "zzznosuchterm", "java java java", "the and of", "java uniq0token",
    "crawl rank page link doc term",
]


def time_passes(eng, queries: list[str], reps: int = 3) -> float:
    # this bench measures the per-query pruned-SCAN path (inventory
    # slab pruning); the round-4 bucket cache would hide exactly the
    # IO cost under test, so force scan mode
    eng.serving_cache_buckets = 0
    eng.search_local(queries[0], 10)  # warm dataset handle
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for q in queries:
            eng.search_local(q, 10)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("bench-slabs", parallelism=args.cpus,
                      shuffle_partitions=args.cpus)
    corpus_path = f"/tmp/sgb_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_df(spark, args.docs, partitions=args.cpus * 2).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    # df=1 anchor terms (corpus.py plants uniq{i}token for i % 97 == 0)
    rare = [f"uniq{i}token" for i in range(0, 97 * 12, 97)]

    base = tempfile.mkdtemp(prefix="sgb_slabs_")
    queries: dict[str, float] = {}
    extras: dict = {"parallelism": args.cpus, "bench_docs": args.docs}
    slab_sizes = {"few": max(1024, args.docs // 10), "many": args.docs // 96}
    for label, slab_size in slab_sizes.items():
        idx = os.path.join(base, label)
        cfg = EngineConfig(slab_size=slab_size, term_buckets=16,
                           block_size=128, build_partitions=args.cpus)
        eng = SearchEngine.build(spark, docs, idx, cfg,
                                 detailed_metrics=False)
        n_slabs = -(-int(eng.meta["n_docs"]) // slab_size)
        extras[f"n_slabs_{label}"] = n_slabs
        queries[f"ref12_{label}"] = round(time_passes(eng, REFERENCE_QUERIES), 3)
        queries[f"rare12_{label}"] = round(time_passes(eng, rare), 3)
        eng._term_slab_cache = None  # disable pruning: the counterfactual
        queries[f"ref12_{label}_nopruning"] = round(
            time_passes(eng, REFERENCE_QUERIES), 3
        )
        queries[f"rare12_{label}_nopruning"] = round(time_passes(eng, rare), 3)

    extras["slab_ratio"] = round(
        extras["n_slabs_many"] / extras["n_slabs_few"], 1
    )
    extras["ref12_growth_pruned"] = round(
        queries["ref12_many"] / queries["ref12_few"], 2
    )
    extras["rare12_growth_pruned"] = round(
        queries["rare12_many"] / queries["rare12_few"], 2
    )
    extras["rare12_growth_nopruning"] = round(
        queries["rare12_many_nopruning"] / queries["rare12_few_nopruning"], 2
    )
    print(
        json.dumps(
            {
                "metric": "serving_slab_scaling",
                "value": extras["ref12_growth_pruned"],
                "unit": "ratio",
                "queries": queries,
                "sf": f"synthetic_{args.docs}",
                "extras": extras,
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
