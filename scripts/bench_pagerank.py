#!/usr/bin/env python
"""PageRank at reference scale (VERDICT r4 next-item 2).

The reference publishes "1M pages ~ 30 s" for its in-memory Java
power iteration (README.md:227; PageRankCalculator.java:16-18 —
d=0.85, total-L1 eps=1e-4, cap 100 iters).  This bench runs the SAME
semantics at >=1M nodes / >=10M edges two ways:

  * ``ops.graph.pagerank_local`` — the driver-local numpy kernel
    (gather + bincount per iteration), the apples-to-apples twin of
    the reference's single-node loop;
  * ``ops.graph.pagerank_converged`` — the distributed DataFrame loop
    (the 100 TB path), same formula, same eps, same cap.

Graph: deterministic pseudo-random with a hot-node skew component —
99% of edges go uniform, 1% concentrate on 100 hub nodes, so the
contribution aggregate sees real key skew (the shape a link graph
has).  Both paths read the same parquet file.

Usage: python scripts/bench_pagerank.py [--nodes 1000000]
       [--edges 10000000] [--cpus 8] [--skip-spark]
Prints one JSON line; append to BENCH/pagerank.jsonl.
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
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--skip-spark", action="store_true",
                    help="numpy kernel only (the reference twin)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.ops.graph import (
        pagerank_converged,
        pagerank_local,
    )
    from search_engine_spark.session import get_spark

    spark = get_spark(
        "pagerank-1m", parallelism=args.cpus,
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/sgb_graph_{args.nodes}_{args.edges}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        n, m = args.nodes, args.edges
        (
            spark.range(0, m, numPartitions=args.cpus * 4)
            .select(
                F.pmod(F.xxhash64("id", F.lit(0)), F.lit(n)).alias("src"),
                F.when(
                    F.col("id") % 100 == 0,
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)),
                )
                .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n)))
                .alias("dst"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )

    # --- numpy twin (reference's single-node shape) ---
    import pyarrow.dataset as ds

    tab = ds.dataset(path).to_table(columns=["src", "dst"])
    src = tab.column("src").to_numpy()
    dst = tab.column("dst").to_numpy()
    t0 = time.time()
    nodes, scores, iters_l = pagerank_local(
        src, dst, eps=args.eps, max_iters=args.max_iters
    )
    t_local = time.time() - t0
    top_local = sorted(
        zip(scores.tolist(), nodes.tolist()), reverse=True
    )[:10]

    row = {
        "metric": "pagerank_1m_sec",
        "value": round(t_local, 1),
        "unit": "sec",
        "sf": f"graph_{args.nodes}n_{args.edges}e",
        "extras": {
            "n_nodes_distinct": int(len(nodes)),
            "n_edges": int(len(src)),
            "eps": args.eps,
            "local_sec": round(t_local, 1),
            "local_iters": iters_l,
            "local_sec_per_iter": round(t_local / max(1, iters_l), 2),
            "top10_local": [
                [int(n), round(s, 10)] for s, n in top_local
            ],
            "parallelism": args.cpus,
            "reference_claim_sec": 30,
        },
    }

    if not args.skip_spark:
        edges = spark.read.parquet(path)
        t0 = time.time()
        pr, iters_s = pagerank_converged(
            edges, eps=args.eps, max_iters=args.max_iters
        )
        top_spark = pr.orderBy(F.desc("score"), F.asc("node")).limit(
            10
        ).collect()
        t_spark = time.time() - t0
        row["extras"]["spark_sec"] = round(t_spark, 1)
        row["extras"]["spark_iters"] = iters_s
        row["extras"]["spark_sec_per_iter"] = round(
            t_spark / max(1, iters_s), 2
        )
        row["extras"]["top10_spark"] = [
            [int(r["node"]), round(float(r["score"]), 10)]
            for r in top_spark
        ]
        # the two paths must agree on the ranking they exist to serve
        row["extras"]["top10_rank_match"] = [
            n for n, _ in (tuple(x) for x in row["extras"]["top10_local"])
        ] == [n for n, _ in (tuple(x) for x in row["extras"]["top10_spark"])]

    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
