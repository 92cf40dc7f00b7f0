"""Persisted-ANN-index bench: build-once cost + per-query latency of
the three query paths (Spark LSH, Spark IVF, no-Spark local twins)
over the sf embeddings table.

Usage: python scripts/bench_ann.py [--sf /root/testdata/sf0.1]
Prints one JSON line; append to BENCH/ann.jsonl.
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

N_QUERIES = 12
K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from search_engine_spark.ann_index import AnnIndex, build_ann_index
    from search_engine_spark.session import get_spark

    spark = get_spark("bench-ann", parallelism=args.cpus,
                      shuffle_partitions=args.cpus)
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    n_vecs = emb.count()

    d = tempfile.mkdtemp(prefix="sgb_ann_")
    t0 = time.time()
    build_ann_index(spark, emb, d)
    build_sec = time.time() - t0
    idx = AnnIndex(spark, d)

    queries: dict[str, float] = {"ann_build": round(build_sec, 3)}
    # warm each path once, then time N_QUERIES
    idx.query_lsh(0, K).collect()
    t0 = time.time()
    for q in range(N_QUERIES):
        idx.query_lsh(q, K).collect()
    queries["ann_lsh_spark_12q"] = round(time.time() - t0, 3)
    idx.query_ivf(0, K).collect()
    t0 = time.time()
    for q in range(N_QUERIES):
        idx.query_ivf(q, K).collect()
    queries["ann_ivf_spark_12q"] = round(time.time() - t0, 3)
    idx.query_lsh_local(0, K)
    t0 = time.time()
    for q in range(N_QUERIES):
        idx.query_lsh_local(q, K)
    queries["ann_lsh_local_12q"] = round(time.time() - t0, 3)
    idx.query_ivf_local(0, K)
    t0 = time.time()
    for q in range(N_QUERIES):
        idx.query_ivf_local(q, K)
    queries["ann_ivf_local_12q"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "ann_index_bench",
                "value": round(sum(queries.values()), 3),
                "unit": "sec",
                "queries": queries,
                "sf": args.sf.rstrip("/").split("/")[-1],
                "extras": {
                    "parallelism": args.cpus,
                    "n_vecs": int(n_vecs),
                    "lsh_local_ms_per_query": round(
                        queries["ann_lsh_local_12q"] / N_QUERIES * 1000, 2
                    ),
                    "ivf_local_ms_per_query": round(
                        queries["ann_ivf_local_12q"] / N_QUERIES * 1000, 2
                    ),
                },
            }
        )
    )
    shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
