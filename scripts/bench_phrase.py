#!/usr/bin/env python
"""Positional-index build cost + phrase-query latency at scale.

Phrase support is an opt-in artifact (indexer/positions.py): the
positional build shuffles one row per token OCCURRENCE (~doclen x
n_docs rows), versus the main build's per-(term, docid) postings —
this script measures that opt-in premium directly, plus the phrase
query path (slab-INTERSECTION pruned scan -> vectorized varint
decode -> position-list fold) against the bag-of-words query on the
same corpus.

Usage: python scripts/bench_phrase.py [--docs 200000] [--cpus 8]
Prints one JSON line; append to BENCH/phrase.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# phrases over the synthetic code corpus's vocabulary, mixed
# selectivity: hot bigram, moderate, trigram, duplicate-term,
# rare/absent (slab-prune early-out)
PHRASES = [
    "merge sort",
    "binary search",
    "hash table lookup",
    "sort merge sort",
    "parse parse",
    "zzznope qqqnope",
]
BOW_TWINS = ["merge sort", "binary search", "hash table lookup"]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--slab", type=int, default=25_000)
    ap.add_argument("--passes", type=int, default=5)
    args = ap.parse_args()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark(
        "bench-phrase", parallelism=args.cpus,
        shuffle_partitions=args.cpus * 2,
    )
    idx = f"/tmp/sgb_phrase_idx_{args.docs}"
    marker = os.path.join(idx, "_BENCH_READY")
    t_build = t_pos = None
    if not os.path.exists(marker):
        t0 = time.time()
        SearchEngine.build(
            spark,
            corpus_df(spark, args.docs, partitions=args.cpus * 4),
            idx,
            EngineConfig(slab_size=args.slab, term_buckets=16),
        )
        t_build = round(time.time() - t0, 2)
        eng = SearchEngine(spark, idx)
        t0 = time.time()
        eng.build_positions()
        t_pos = round(time.time() - t0, 2)
        open(marker, "w").write("ok")
    eng = SearchEngine(spark, idx)
    n_docs = int(eng.meta["n_docs"])

    # warm both paths once (codegen + dataset handles)
    eng.search_phrase(PHRASES[0], 10).collect()
    eng.search(BOW_TWINS[0], 10).collect()

    per_phrase: dict[str, float] = {}
    for p in PHRASES:
        best = None
        rows = 0
        for _ in range(args.passes):
            t0 = time.time()
            rows = len(eng.search_phrase(p, 10).collect())
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        per_phrase[p] = round(best, 1)
        per_phrase[p + " [rows]"] = rows
    per_bow: dict[str, float] = {}
    for q in BOW_TWINS:
        best = None
        for _ in range(args.passes):
            t0 = time.time()
            eng.search(q, 10).collect()
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        per_bow[q] = round(best, 1)

    # no-Spark serving head (pinned identical to search_phrase)
    eng.search_phrase_local(PHRASES[0], 10)  # warm handles + doclen
    per_serving: dict[str, float] = {}
    for p in PHRASES:
        best = None
        for _ in range(args.passes):
            t0 = time.time()
            eng.search_phrase_local(p, 10)
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        per_serving[p] = round(best, 1)

    seg_b = dir_bytes(os.path.join(idx, "segments"))
    pos_b = dir_bytes(os.path.join(idx, "possegments"))
    print(json.dumps({
        "metric": "phrase retrieval at scale",
        "n_docs": n_docs,
        "cpus": args.cpus,
        "t_build_main_s": t_build,
        "t_build_positions_s": t_pos,
        "bytes_segments": seg_b,
        "bytes_possegments": pos_b,
        "pos_size_ratio": round(pos_b / seg_b, 2) if seg_b else None,
        "phrase_ms_min": per_phrase,
        "phrase_serving_ms_min": per_serving,
        "bow_ms_min": per_bow,
    }))


if __name__ == "__main__":
    main()
