"""Benchmark harness — prints ONE JSON line for the driver.

Measures, in one process:
1. index-build throughput (docs/sec) on the deterministic synthetic
   code corpus (FIXTURES.md) — scan -> dedup -> tokenize -> postings
   -> compressed segments + lineage,
2. BM25 top-10 latency for the reference query set (per-query,
   single-query path),
3. batch query throughput (all queries x paraphrases in ONE Spark
   job via search_batch) — the cluster-throughput figure,
4. the sf-dir contract queries (documents table).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_DOCS (default 40000).

Run directly (`python bench.py`) or via spark-submit
(`scripts/submit_bench.sh [cpus]`).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_QUERIES = {
    "q01": "java",
    "q02": "python tutorial",
    "q03": "search algorithm",
    "q04": "database index merge",
    "q05": "parse_token_id",
    "q06": "QueryParserImpl",
    "q07": "bug framework api",
    "q08": "zzznosuchterm",
    "q09": "java java java",
    "q10": "the and of",
    "q11": "java uniq0token",
    "q12": "crawl rank page link doc term",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    requested_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # This host's hypervisor sustains ~8 cores; local[32] measurably
    # ANTI-scales (GC + scheduler thrash on an oversubscribed VM —
    # BENCH/BASELINE.md).  The harness therefore sizes local-mode
    # threads to the sustained envelope, like any production launcher
    # sizes executors to real cores; raise SPARK_GRAFT_MAX_LOCAL on
    # genuine hardware.
    max_local = int(os.environ.get("SPARK_GRAFT_MAX_LOCAL", "8"))
    cpus = min(requested_cpus, max_local)
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "40000"))

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark("bench", parallelism=cpus, shuffle_partitions=cpus)
    queries: dict[str, float] = {}
    extras: dict = {
        "parallelism": cpus,
        "requested_parallelism": requested_cpus,
        "bench_docs": n_docs,
    }

    # --- corpus (generation excluded from build timing; cached) ---
    corpus_path = f"/tmp/sgb_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_df(spark, n_docs, partitions=cpus * 2).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    spark.range(10).count()  # absorb session warm-up

    # --- 1. index build ---
    idx_dir = tempfile.mkdtemp(prefix="sgb_idx_")
    # slab count tracks corpus size: ~48 shards keeps applyInPandas
    # groups chunky and the segment store at ~48*16 files (a 6000-file
    # store at slab_size=1024/400k docs made serving reads crawl)
    cfg = EngineConfig(
        slab_size=max(1024, n_docs // 48),
        term_buckets=16,
        block_size=128,
        build_partitions=cpus,
    )
    t0 = time.time()
    eng = SearchEngine.build(spark, docs, idx_dir, cfg, detailed_metrics=False)
    build_sec = time.time() - t0
    queries["index_build"] = round(build_sec, 3)
    extras["docs_per_sec"] = round(n_docs / build_sec, 1)
    extras["n_docs_indexed"] = eng.meta["n_docs"]

    # --- 2. single-query latency ---
    eng.segments.count()  # materialize cache once
    for qid, q in REFERENCE_QUERIES.items():
        t0 = time.time()
        eng.search(q, 10).collect()
        queries[qid] = round(time.time() - t0, 3)

    # --- 2b. serving-path latency (no Spark job; pyarrow + numpy).
    # The path is driver-side and parallelism-independent, but this
    # host suffers episodic CPU-steal; min over passes reports the
    # code's cost, not the hypervisor's (BENCH/BASELINE.md).
    eng.search_local("java", 10)  # warm the dataset handle
    reps = 3
    pass_secs = []
    for _ in range(reps):
        t0 = time.time()
        for q in REFERENCE_QUERIES.values():
            eng.search_local(q, 10)
        pass_secs.append(time.time() - t0)
    # serving_36q = the MEASURED 3-pass wall time (round-1 meaning,
    # comparable across rounds).  The throttling-robust best-case view
    # lives in extras: per-pass raw times + min-based ms/query, so a
    # stolen host window is self-evident from the pass spread instead
    # of silently inflating the one headline number.
    queries["serving_36q"] = round(sum(pass_secs), 3)
    extras["serving_passes"] = [round(p, 3) for p in pass_secs]
    extras["serving_36q_minpass"] = round(min(pass_secs) * reps, 3)
    extras["serving_ms_per_query"] = round(
        min(pass_secs) / len(REFERENCE_QUERIES) * 1000, 2
    )

    # --- 2b2. S8 result cache: same 12 queries through the TTL+LRU
    # cache (first pass populates, later passes hit) — the reference's
    # SearchCachePort analog on the serving tier ---
    t0 = time.time()
    for _ in range(reps):
        for q in REFERENCE_QUERIES.values():
            eng.search_local_cached(q, 10)
    queries["serving_cached_36q"] = round(time.time() - t0, 3)
    extras["cache_hits"] = eng._result_cache.hits
    extras["cache_misses"] = eng._result_cache.misses

    # --- 2c. field-weighted search (title^3/content^1) ---
    t0 = time.time()
    eng.search_fields("database index merge", 10).collect()
    queries["fields_q"] = round(time.time() - t0, 3)
    eng.search_local_fields("java", 10)  # warm
    t0 = time.time()
    for q in REFERENCE_QUERIES.values():
        eng.search_local_fields(q, 10)
    queries["serving_fields_12q"] = round(time.time() - t0, 3)

    # --- 2d. the composed intended query (BEST_FIELDS + synonyms +
    # intent + entity + function_score pagerank multiply in-kernel) ---
    pr = eng.docmap.select(
        F.col("docid").alias("node"),
        (F.col("docid") % 97 / 96.0).alias("pagerank"),
    )
    t0 = time.time()
    eng.search_advanced("how to search database index", 10, pagerank=pr).collect()
    queries["advanced_q"] = round(time.time() - t0, 3)

    # --- 2e. phrase retrieval: opt-in positional artifact build +
    # one Spark-path query + the no-Spark phrase serving head ---
    t0 = time.time()
    eng.build_positions()
    queries["build_positions"] = round(time.time() - t0, 3)
    t0 = time.time()
    eng.search_phrase("merge sort", 10).collect()
    queries["phrase_q"] = round(time.time() - t0, 3)
    phrase_set = (
        "merge sort", "binary search", "hash table lookup",
        "sort merge sort", "parse parse", "zzznosuchterm qqq",
    )
    eng.search_phrase_local("merge sort", 10)  # warm handles + doclen
    t0 = time.time()
    for p in phrase_set:
        eng.search_phrase_local(p, 10)
    queries["phrase_serving_6q"] = round(time.time() - t0, 3)

    # --- 2f. fuzzy + prefix retrieval (scoring_boolean expansion):
    # one Spark-path query each + the serving twins over a 6-query
    # typo set (each expands 1-11 vocabulary terms) ---
    t0 = time.time()
    eng.search_fuzzy("qery parse", 10).collect()
    queries["fuzzy_q"] = round(time.time() - t0, 3)
    fuzzy_set = (
        "qery parse", "pyton handler", "crawl buffer",
        "jav servic", "tokn merg", "util config",
    )
    eng.search_local_fuzzy("java", 10)  # warm the vocab map
    t0 = time.time()
    for q in fuzzy_set:
        eng.search_local_fuzzy(q, 10)
    queries["fuzzy_serving_6q"] = round(time.time() - t0, 3)
    t0 = time.time()
    for p in ("crawl", "get", "pars", "ind", "q", "zz"):
        eng.search_local_prefix(p, 10)
    queries["prefix_serving_6q"] = round(time.time() - t0, 3)

    # --- 2g. round-5 session-4 features: keyset pagination (three
    # pages deep per query — each page costs one kernel pass, never
    # re-materializing earlier pages), sortBy-date serving, and a
    # serving pass with 200 pending tombstones (the deleted-docs
    # masking overhead before a purge compaction) ---
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        cur = None
        for _ in range(3):
            page = eng.search_local(q, 10, after=cur)
            if len(page) < 10:
                break
            cur = (page[-1][1], page[-1][0])
    queries["after_pages_6x3"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        eng.search_local_sorted(q, 10, "date")
    queries["sorted_serving_6q"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        eng.search_local(q, 10, filter={"lang": "python"})
    queries["filtered_serving_6q"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        eng.facet_counts_local(q, "lang", 10)
    queries["facets_serving_6q"] = round(time.time() - t0, 3)
    from search_engine_spark.indexer.build import delete_documents

    delete_documents(
        spark, idx_dir, docids=range(0, 2000, 10)  # 200 tombstones
    )
    eng.refresh()
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        eng.search_local(q, 10)
    queries["deleted_serving_6q"] = round(time.time() - t0, 3)
    # clear tombstones so the batch/contract sections below measure
    # the undeleted index
    import shutil as _sh

    _sh.rmtree(f"{idx_dir}/tombstones", ignore_errors=True)
    eng.refresh()

    # --- 2g. session-5 request params: doc-values ranges + m-of-n ---
    t0 = time.time()
    eng.search(
        list(REFERENCE_QUERIES.values())[0], 10,
        date_from=300, date_to=1800, min_quality=0.45,
    ).count()
    queries["range_q"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        eng.search_local(
            q, 10, date_from=300, date_to=1800, min_quality=0.45
        )
    queries["range_serving_6q"] = round(time.time() - t0, 3)
    t0 = time.time()
    for q in list(REFERENCE_QUERIES.values())[:6]:
        eng.search_local(q, 10, min_should_match="50%")
    queries["msm_serving_6q"] = round(time.time() - t0, 3)

    # --- 3. batch throughput ---
    batch = {}
    for rep in range(4):
        for qid, q in REFERENCE_QUERIES.items():
            batch[f"{qid}_r{rep}"] = q
    t0 = time.time()
    eng.search_batch(batch, 10).count()
    batch_sec = time.time() - t0
    queries["batch_48q"] = round(batch_sec, 3)
    extras["batch_qps"] = round(len(batch) / batch_sec, 1)

    # --- 3b. conjunctive batch (bool.must paraphrases) ---
    t0 = time.time()
    eng.search_batch(dict(REFERENCE_QUERIES), 10, mode="and").count()
    queries["batch_and_12q"] = round(time.time() - t0, 3)

    # --- 3c. batch composed query (per-slab shared pagerank boost) ---
    t0 = time.time()
    eng.search_batch_advanced(dict(REFERENCE_QUERIES), 10, pagerank=pr).count()
    queries["batch_adv_12q"] = round(time.time() - t0, 3)

    # --- 4. sf-dir contract queries ---
    import __spark_entry__ as E

    for name in ["term_counts", "bm25_q1", "bm25_wand_q1", "exact_dedup",
                 "hll_vocab", "cms_term_freq", "bpe_merges"]:
        t0 = time.time()
        E.queries()[name](spark, sf_dir).count()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "e2e_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf_dir.rstrip("/").split("/")[-1],
                "extras": extras,
            }
        )
    )
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
