#!/usr/bin/env python
"""Zipf hot-term stress (VERDICT r4 next-item 7).

Claim under test (indexer/segments.py:13-17): a hot term's postings
are salted across slabs BY CONSTRUCTION (slab = docid range), so no
applyInPandas segment group exceeds ~slab_size * tokens_per_doc /
term_buckets rows regardless of df.  This bench builds two indexes of
the same corpus — uniform, and with a synthetic term injected into
50% of all documents (df = N/2, far beyond any organic term) — and
records:

  * per-(slab, bucket) group sizes (max / p99) for both builds —
    the skew evidence: the hot build's max group must stay within
    tokens-per-doc jitter of the uniform build's, nowhere near df;
  * build wall-time for both;
  * query latency on the hot term, a mixed hot+rare query, and a
    rare-only control, on both indexes;
  * count_matches("zzhot") == exactly N/2 (the inventory fast path
    agrees with construction).

Usage: python scripts/bench_zipf.py [--docs 100000] [--cpus 8]
Prints one JSON line; append to BENCH/zipf.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT = "zzhot"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--slab", type=int, default=12_500)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark(
        "zipf-stress", parallelism=args.cpus,
        shuffle_partitions=args.cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(slab_size=args.slab, term_buckets=16)

    base = corpus_df(spark, args.docs, partitions=args.cpus * 4)
    # hot variant: ~half the rows gain the synthetic term (chosen by a
    # deterministic hash of the doc key, partition-layout independent)
    hot = base.withColumn(
        "content",
        F.when(
            F.pmod(F.xxhash64("repo", "path"), F.lit(2)) == 0,
            F.concat(F.col("content"), F.lit(" " + HOT)),
        ).otherwise(F.col("content")),
    )

    out = {}
    engines = {}
    for name, docs in (("uniform", base), ("zipf_hot", hot)):
        idx = f"/tmp/sgb_zipf_{name}_{args.docs}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        engines[name] = SearchEngine.build(spark, docs, idx, cfg)
        t_build = time.time() - t0
        seg = spark.read.parquet(f"{idx}/segments")
        sizes = (
            seg.groupBy("slab", "bucket")
            .agg(F.sum("df").alias("rows"))
            .select("rows")
            .toPandas()["rows"]
        )
        out[name] = {
            "build_sec": round(t_build, 1),
            "n_groups": int(len(sizes)),
            "group_rows_max": int(sizes.max()),
            "group_rows_p99": int(sizes.quantile(0.99)),
            "group_rows_mean": int(sizes.mean()),
        }

    # the salting claim, quantified (same bound the pytest pins,
    # test_index_extras.py): a group's rows are the sum over ALL terms
    # in that (slab, bucket) — organic tokens dominate — so the hot
    # build's max group may exceed the uniform build's by at most one
    # injected posting per doc in one slab (<= slab_size), never by
    # anything df-shaped; and the hot term itself must arrive as one
    # chunk per slab, each chunk's df <= slab_size.
    df_hot = args.docs // 2
    ratio = out["zipf_hot"]["group_rows_max"] / max(
        1, out["uniform"]["group_rows_max"]
    )
    out["max_group_ratio_hot_vs_uniform"] = round(ratio, 3)
    out["hot_df"] = df_hot
    hot_chunks = (
        spark.read.parquet(f"/tmp/sgb_zipf_zipf_hot_{args.docs}/segments")
        .filter(F.col("term") == HOT)
        .select("slab", "df")
        .collect()
    )
    out["hot_term_chunks"] = len(hot_chunks)
    out["hot_term_max_chunk_df"] = max(r["df"] for r in hot_chunks)
    out["bounded"] = bool(
        out["zipf_hot"]["group_rows_max"]
        <= out["uniform"]["group_rows_max"] + args.slab
        and out["hot_term_max_chunk_df"] <= args.slab
    )

    # A7 inventory fast path agrees with ground truth on the hot term
    eng = engines["zipf_hot"]
    want = (
        spark.read.parquet(f"/tmp/sgb_zipf_zipf_hot_{args.docs}/docmap")
        .filter(F.col("content").contains(HOT))
        .count()
    )
    got = eng.count_matches(HOT)
    assert got == want, f"hot df mismatch: {got} != {want}"
    out["hot_count_matches"] = got
    queries = {
        "hot_only": HOT,
        "hot_plus_rare": HOT + " merge",
        "rare_control": "merge",
    }
    for which, engname in (("zipf_hot", "zipf_hot"), ("uniform", "uniform")):
        e = engines[engname]
        lat = {}
        for qname, q in queries.items():
            e.search_local(q, 10)  # warm
            best = min(
                _timed(e, q) for _ in range(5)
            )
            lat[qname] = round(best * 1000, 1)
        out[which]["query_ms"] = lat

    row = {
        "metric": "zipf_hot_max_group_rows",
        "value": out["zipf_hot"]["group_rows_max"],
        "unit": "rows",
        "sf": f"synthetic_{args.docs}",
        "extras": out,
    }
    print(json.dumps(row))
    spark.stop()


def _timed(e, q):
    t0 = time.time()
    e.search_local(q, 10)
    return time.time() - t0


if __name__ == "__main__":
    main()
