"""Index build orchestration: documents -> docmap/df/stats/segments,
wave-by-wave with lineage checkpointing, resumable mid-job.

Storage layout under ``index_dir`` (Parquet catalog shim; the same
table names/schemas/partitioning would sit behind an Iceberg catalog
when the runtime jar is present — SURVEY.md §7):

    docmap/    (docid, repo, path, commit, lang, content,
                content_sha256, doclen)
    df/        (term, df)
    stats/     (n_docs, avgdl)
    segments/  partitioned by slab: (bucket, gen, term, df,
                max_factor, postings, skips, block_max)
    lineage/   per-slab build status + metrics
    meta.json  engine config + corpus stats + norm_avgdl
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer import lineage as L
from search_engine_spark.indexer.docmap import build_docmap
from search_engine_spark.indexer.postings import (
    build_df_table,
    build_postings,
    build_stats,
)
from search_engine_spark.indexer.segments import build_segments, postings_with_keys


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


DOCMAP_COLS = [
    "docid", "repo", "path", "commit", "lang", "content",
    "content_sha256", "doclen",
]


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = False,
    wave_size: int | None = None,
    use_arrow_udf: bool = True,
    fail_after_waves: int | None = None,
    detailed_metrics: bool = True,
) -> dict:
    """Build (or resume) the full index.  Returns build metrics.

    ``fail_after_waves`` is a test hook: abort after N segment waves
    to exercise resume.  ``detailed_metrics=False`` skips the per-wave
    segment read-back (lineage rows then carry zero rows/bytes) —
    one less job per wave for latency-sensitive runs.
    """
    cfg = cfg or EngineConfig()
    os.makedirs(index_dir, exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.time()
    metrics: dict = {}

    # One tokenize pass: docmap (with tokens) is persisted and feeds
    # the docmap write, stats, postings, and df in a single lineage.
    # On resume, tokens are recomputed deterministically from the
    # docmap already on disk.
    docmap_path = f"{index_dir}/docmap"
    fresh = not (resume and _exists(docmap_path))
    if fresh:
        docmap_tok = build_docmap(docs, use_arrow_udf=use_arrow_udf)
    else:
        from search_engine_spark.tokenizer import tokens_col, tokens_udf_col

        tok = tokens_udf_col("content") if use_arrow_udf else tokens_col("content")
        docmap_tok = spark.read.parquet(docmap_path).withColumn("tokens", tok)
    docmap_tok = docmap_tok.persist()
    if fresh:
        docmap_tok.select(*DOCMAP_COLS).write.mode("overwrite").parquet(
            docmap_path
        )
    metrics["t_docmap"] = round(time.time() - t0, 2)

    stats_path = f"{index_dir}/stats"
    if resume and _exists(stats_path):
        n_docs, avgdl = spark.read.parquet(stats_path).collect()[0]
    else:
        n_docs, avgdl = build_stats(docmap_tok).collect()[0]
        spark.createDataFrame(
            [(n_docs, avgdl)], "n_docs long, avgdl double"
        ).coalesce(1).write.mode("overwrite").parquet(stats_path)
    n_docs, avgdl = int(n_docs), float(avgdl) if avgdl is not None else 0.0
    metrics["n_docs"] = n_docs
    metrics["avgdl"] = avgdl
    metrics["t_stats"] = round(time.time() - t0, 2)

    postings = build_postings(docmap_tok)
    keyed = postings_with_keys(postings, cfg).persist()

    df_path = f"{index_dir}/df"
    if not (resume and _exists(df_path)):
        build_df_table(keyed).write.mode("overwrite").parquet(df_path)
    docmap_tok.unpersist()
    metrics["t_df"] = round(time.time() - t0, 2)

    n_slabs = max(1, math.ceil(n_docs / cfg.slab_size))
    done = L.completed_slabs(spark, index_dir) if resume else set()
    remaining = [s for s in range(n_slabs) if s not in done]
    metrics["n_slabs"] = n_slabs
    metrics["resumed_skipped"] = n_slabs - len(remaining)

    wave_size = wave_size or len(remaining) or 1
    try:
        waves = [
            remaining[i:i + wave_size]
            for i in range(0, len(remaining), wave_size)
        ]
        seg_path = f"{index_dir}/segments"
        for wi, wave in enumerate(waves):
            if fail_after_waves is not None and wi >= fail_after_waves:
                raise RuntimeError("injected build failure (test hook)")
            started = time.time()
            seg = build_segments(
                keyed.filter(F.col("slab").isin(wave)), cfg, avgdl, gen=0
            )
            # No repartition: each applyInPandas task holds one
            # (slab, bucket) group, so partitionBy(slab) yields one
            # file per bucket per slab — min/max stats on the bucket
            # column then let query scans skip whole files.
            seg.write.mode("overwrite").partitionBy("slab").parquet(seg_path)
            if detailed_metrics:
                back = spark.read.parquet(seg_path).filter(
                    F.col("slab").isin(wave)
                )
                wave_stats = {
                    r["slab"]: (r["rows"], r["bytes"])
                    for r in back.groupBy("slab")
                    .agg(
                        F.sum("df").alias("rows"),
                        F.sum(F.length("postings")).alias("bytes"),
                    )
                    .collect()
                }
            else:
                wave_stats = {}
            L.append_lineage(
                spark,
                index_dir,
                [
                    {
                        "slab": s,
                        "status": "COMPLETED",
                        "rows": wave_stats.get(s, (0, 0))[0],
                        "bytes": wave_stats.get(s, (0, 0))[1],
                        "started_at": started,
                        "finished_at": time.time(),
                    }
                    for s in wave
                ],
            )
    finally:
        keyed.unpersist()
    metrics["t_segments"] = round(time.time() - t0, 2)

    meta = {
        "slab_size": cfg.slab_size,
        "term_buckets": cfg.term_buckets,
        "block_size": cfg.block_size,
        "k1": cfg.k1,
        "b": cfg.b,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "norm_avgdl": avgdl,  # avgdl the block_max bounds were built with
        "n_slabs": n_slabs,
        "max_gen": 0,
    }
    with open(f"{index_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    metrics["build_sec"] = time.time() - t0
    return metrics


def append_documents(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    use_arrow_udf: bool = True,
    compact: bool = False,
) -> dict:
    """Incrementally index a new batch (the LSM write path).

    Mirrors the reference's incremental Kafka pump (SURVEY.md §2.8):
    new pages arrive in batches, are deduped against everything seen
    (the J2 anti-join on content sha), get docids AFTER all existing
    docs (arrival order, like crawl order), and land as a NEW segment
    GENERATION.  Queries work immediately (generations are additive
    per (term, slab)); ``compact=True`` runs the LSM merge down to one
    chunk per (term, slab), re-encoding block-max bounds with the
    current corpus avgdl.

    Until compaction, queries stay EXACT because the engine scales
    stale block-max bounds by avgdl_current / norm_avgdl (the upper
    bound grows monotonically in avgdl — engine.py).
    """
    from search_engine_spark.indexer.docmap import (
        assign_docids,
        dedup_incremental,
    )
    from search_engine_spark.indexer.merge import merge_segments
    from search_engine_spark.tokenizer import tokens_col, tokens_udf_col

    with open(f"{index_dir}/meta.json") as f:
        meta = json.load(f)
    cfg = EngineConfig(
        slab_size=int(meta["slab_size"]),
        term_buckets=int(meta["term_buckets"]),
        block_size=int(meta["block_size"]),
        k1=float(meta["k1"]),
        b=float(meta["b"]),
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    metrics: dict = {}
    t0 = time.time()
    docmap_path = f"{index_dir}/docmap"
    existing = spark.read.parquet(docmap_path)
    base = int(meta["n_docs"])
    gen = int(meta.get("max_gen", 0)) + 1

    tok = tokens_udf_col("content") if use_arrow_udf else tokens_col("content")
    # localCheckpoint severs lineage BEFORE we append to the docmap
    # path: the anti-join below reads that same path, and Spark's
    # write-refresh would otherwise invalidate a mere .cache() and
    # re-execute the anti-join against the already-appended docmap —
    # silently deduping the new batch out of existence.  (On a real
    # cluster use reliable checkpoint() with a checkpoint dir.)
    fresh = (
        assign_docids(
            dedup_incremental(new_docs, existing.select("content_sha256"))
        )
        .withColumn("docid", (F.col("docid") + base).cast("long"))
        .withColumn("tokens", tok)
        .withColumn("doclen", F.size("tokens").cast("int"))
        .localCheckpoint(eager=True)
    )
    n_new = fresh.count()
    metrics["n_new"] = n_new
    if n_new == 0:
        fresh.unpersist()
        if compact:
            compact_index(spark, index_dir)
        metrics["append_sec"] = time.time() - t0
        return metrics
    fresh.select(*DOCMAP_COLS).write.mode("append").parquet(docmap_path)

    # refreshed corpus stats (exact, over the full docmap)
    n_docs = base + n_new
    new_stats = spark.read.parquet(docmap_path).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    avgdl = float(new_stats.collect()[0][1])
    new_stats.write.mode("overwrite").parquet(f"{index_dir}/stats")

    postings = build_postings(fresh)
    seg = build_segments(postings, cfg, avgdl, gen=gen)
    seg.write.mode("append").partitionBy("slab").parquet(
        f"{index_dir}/segments"
    )
    fresh.unpersist()
    spark.catalog.refreshByPath(f"{index_dir}/segments")
    spark.catalog.refreshByPath(docmap_path)

    # df over ALL generations, recomputed from segment chunk dfs
    all_seg = spark.read.parquet(f"{index_dir}/segments")
    all_seg.groupBy("term").agg(
        F.sum("df").cast("long").alias("df")
    ).write.mode("overwrite").parquet(f"{index_dir}/df")

    meta["n_docs"] = n_docs
    meta["avgdl"] = avgdl
    meta["norm_avgdl"] = min(float(meta["norm_avgdl"]), avgdl)
    meta["max_gen"] = gen
    meta["n_slabs"] = max(1, math.ceil(n_docs / cfg.slab_size))
    L.append_lineage(
        spark,
        index_dir,
        [{"slab": -1, "gen": gen, "status": "COMPLETED", "rows": n_new}],
    )

    with open(f"{index_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    if compact:
        compact_index(spark, index_dir)
    metrics["append_sec"] = time.time() - t0
    metrics["n_docs"] = n_docs
    return metrics


def compact_index(spark: SparkSession, index_dir: str) -> None:
    """LSM compaction: merge all generations to one chunk per
    (term, slab), re-encoding block-max bounds with the CURRENT corpus
    avgdl (so the query-time bound_scale returns to 1)."""
    import shutil

    from search_engine_spark.indexer.merge import merge_segments

    with open(f"{index_dir}/meta.json") as f:
        meta = json.load(f)
    cfg = EngineConfig(
        slab_size=int(meta["slab_size"]),
        term_buckets=int(meta["term_buckets"]),
        block_size=int(meta["block_size"]),
        k1=float(meta["k1"]),
        b=float(meta["b"]),
    )
    avgdl = float(meta["avgdl"])
    all_seg = spark.read.parquet(f"{index_dir}/segments")
    compacted = merge_segments(all_seg, cfg, avgdl)
    tmp = f"{index_dir}/segments_compact"
    compacted.write.mode("overwrite").partitionBy("slab").parquet(tmp)
    shutil.rmtree(f"{index_dir}/segments")
    os.rename(tmp, f"{index_dir}/segments")
    # drop any cached plans over the old segment files (a cached
    # SearchEngine.segments would otherwise serve pre-compaction data
    # to EVERY later reader — Spark reuses cached relations for
    # equivalent path plans)
    spark.catalog.refreshByPath(f"{index_dir}/segments")
    meta["norm_avgdl"] = avgdl
    meta["max_gen"] = 0
    with open(f"{index_dir}/meta.json", "w") as f:
        json.dump(meta, f, indent=2)
