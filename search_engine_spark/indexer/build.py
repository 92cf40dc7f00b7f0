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
    build_title_postings,
)
from search_engine_spark.indexer.segments import build_segments, postings_with_keys


DOCMAP_COLS = [
    "docid", "repo", "path", "commit", "lang", "content",
    "content_sha256", "doclen", "title_len", "quality",
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
    from search_engine_spark.catalog import store_for

    cfg = cfg or EngineConfig()
    store = store_for(index_dir)
    if store.kind == "parquet":
        os.makedirs(index_dir, exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.time()
    metrics: dict = {}

    # One tokenize pass: docmap (with tokens) is persisted and feeds
    # the docmap write, stats, postings, and df in a single lineage.
    # On resume, tokens are recomputed deterministically from the
    # docmap already on disk.
    fresh = not (resume and store.exists("docmap", spark))
    if fresh:
        # A fresh build into a previously-used index_dir must not
        # inherit state: segment writes use dynamic partition
        # overwrite (stale slabs from a larger prior corpus would
        # survive) and old lineage rows would corrupt a later resume.
        for sub in ("segments", "lineage"):
            try:
                store.drop(sub, spark)
            except NotImplementedError:
                pass  # catalog-managed tables are replaced below
        docmap_tok = build_docmap(docs, use_arrow_udf=use_arrow_udf)
    else:
        from search_engine_spark.indexer.docmap import title_col
        from search_engine_spark.tokenizer import tokens_col, tokens_udf_col

        tok = tokens_udf_col("content") if use_arrow_udf else tokens_col("content")
        ttok = (
            tokens_udf_col(title_col()) if use_arrow_udf
            else tokens_col(title_col())
        )
        docmap_tok = (
            store.read(spark, "docmap")
            .withColumn("tokens", tok)
            .withColumn("title_tokens", ttok)
        )
    docmap_tok = docmap_tok.persist()
    if fresh:
        store.write(docmap_tok.select(*DOCMAP_COLS), "docmap")
    metrics["t_docmap"] = round(time.time() - t0, 2)

    if resume and store.exists("stats", spark):
        n_docs, avgdl, avgdl_title = store.read(spark, "stats").collect()[0]
    else:
        n_docs, avgdl, avgdl_title = docmap_tok.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.avg("doclen").alias("avgdl"),
            F.avg("title_len").alias("avgdl_title"),
        ).collect()[0]
        store.write(
            spark.createDataFrame(
                [(n_docs, avgdl, avgdl_title)],
                "n_docs long, avgdl double, avgdl_title double",
            ),
            "stats",
            coalesce=1,
        )
    n_docs = int(n_docs)
    avgdl = float(avgdl) if avgdl is not None else 0.0
    avgdl_title = float(avgdl_title) if avgdl_title is not None else 0.0
    metrics["n_docs"] = n_docs
    metrics["avgdl"] = avgdl
    metrics["t_stats"] = round(time.time() - t0, 2)

    postings = build_postings(docmap_tok)
    meta_fields = [
        f_ for f_ in getattr(cfg, "index_fields", ()) or ()
        if f_ in docmap_tok.columns
    ]
    if meta_fields:
        from search_engine_spark.indexer.postings import (
            build_meta_postings,
        )

        postings = postings.unionByName(
            build_meta_postings(docmap_tok, meta_fields)
        )
    keyed = postings_with_keys(postings, cfg).persist()
    keyed_title = None
    if cfg.index_title:
        keyed_title = postings_with_keys(
            build_title_postings(docmap_tok), cfg
        ).persist()

    if not (resume and store.exists("df", spark)):
        df_all = build_df_table(keyed)
        if keyed_title is not None:
            df_all = df_all.unionByName(build_df_table(keyed_title))
        store.write(df_all, "df")
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
        for wi, wave in enumerate(waves):
            if fail_after_waves is not None and wi >= fail_after_waves:
                raise RuntimeError("injected build failure (test hook)")
            started = time.time()
            seg = build_segments(
                keyed.filter(F.col("slab").isin(wave)), cfg, avgdl, gen=0
            )
            if keyed_title is not None:
                # Title chunks are encoded with the title field's own
                # avgdl so their block-max bounds (and query-time
                # normalization) use per-field statistics.
                seg = seg.unionByName(
                    build_segments(
                        keyed_title.filter(F.col("slab").isin(wave)),
                        cfg,
                        avgdl_title,
                        gen=0,
                    )
                )
            # No repartition: each applyInPandas task holds one
            # (slab, bucket) group, so partitionBy(slab) yields one
            # file per bucket per slab — min/max stats on the bucket
            # column then let query scans skip whole files.  Dynamic
            # overwrite keeps wave retries idempotent (Iceberg:
            # overwritePartitions).
            store.write(
                seg, "segments", mode="dynamic_overwrite", partition_by="slab"
            )
            if detailed_metrics:
                back = store.read(spark, "segments").filter(
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
        # Serving-tier slab inventory — derived from the CACHED
        # postings (fresh build = one generation, so n_chunks is 1 by
        # construction and df per (term, slab) is the row count): no
        # segments read-back inside the build.  Appends/compactions
        # refresh it from the segments table (write_term_slabs).
        inv = keyed.groupBy("term", "slab").agg(
            F.count("*").cast("long").alias("df")
        )
        if keyed_title is not None:
            inv = inv.unionByName(
                keyed_title.groupBy("term", "slab").agg(
                    F.count("*").cast("long").alias("df")
                )
            )
        store.write(
            inv.withColumn("n_chunks", F.lit(1).cast("int")).select(
                "term", "slab", "n_chunks", "df"
            ),
            "term_slabs",
        )
        store.refresh(spark, "term_slabs")
    finally:
        keyed.unpersist()
        if keyed_title is not None:
            keyed_title.unpersist()
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
        "index_title": bool(cfg.index_title),
        "index_fields": list(meta_fields),
        "avgdl_title": avgdl_title,
        "norm_avgdl_title": avgdl_title,
        "n_slabs": n_slabs,
        "max_gen": 0,
    }
    store.put_meta(spark, meta)
    metrics["build_sec"] = time.time() - t0
    return metrics


def write_term_slabs(spark: SparkSession, store) -> None:
    """Serving-tier slab-pruning stats: (term, slab) -> n_chunks, df.

    A tiny inventory (one row per term per slab that actually holds a
    posting chunk) read driver-side by the serving path, so a query
    touches ONLY the slabs its terms occur in — at 10M docs / hundreds
    of slabs, a rare term's latency stays proportional to its df, not
    to the slab count.  Derived from the segments table with column
    pruning (term/slab/df only), no decode."""
    from pyspark.sql import functions as F  # noqa: F811 (module-local)

    seg = store.read(spark, "segments")
    inv = seg.groupBy("term", "slab").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum("df").cast("long").alias("df"),
    )
    store.write(inv, "term_slabs")
    store.refresh(spark, "term_slabs")


def append_documents(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    use_arrow_udf: bool = True,
    compact: bool | str = False,
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

    ``compact`` policy: False = leave generations; ``"splice"`` =
    byte-splicing merge (O(bytes moved), bounds keep their basis);
    ``"reencode"`` or True = decode/re-encode (tightest bounds);
    ``"auto"`` = splice by default, escalate to re-encode once the
    block-max drift avgdl/norm_avgdl exceeds AUTO_REENCODE_DRIFT —
    the 3x-cheaper splice stays the steady state without unbounded
    bound looseness.
    """
    from search_engine_spark.indexer.docmap import (
        assign_docids,
        dedup_incremental,
        title_col,
    )
    from search_engine_spark.ops.ranking import quality_col
    from search_engine_spark.tokenizer import tokens_col, tokens_udf_col

    from search_engine_spark.catalog import store_for

    store = store_for(index_dir)
    meta = store.get_meta(spark)
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
    existing = store.read(spark, "docmap")
    # dedup against LIVE content only: a document whose content
    # matches a tombstoned (deleted-but-not-yet-purged) doc must be
    # re-insertable — delete followed by re-add yields a NEW docid
    seen = existing
    if store.exists("tombstones", spark):
        seen = existing.join(
            store.read(spark, "tombstones"), "docid", "left_anti"
        )
    # docid watermark: n_docs until the first purging compaction,
    # after which live count < watermark (deleted docids leave holes;
    # they are NEVER reused, so external references stay valid)
    base = int(meta.get("next_docid", meta["n_docs"]))
    gen = int(meta.get("max_gen", 0)) + 1

    tok = tokens_udf_col("content") if use_arrow_udf else tokens_col("content")
    ttok = (
        tokens_udf_col(title_col()) if use_arrow_udf
        else tokens_col(title_col())
    )
    # localCheckpoint severs lineage BEFORE we append to the docmap
    # path: the anti-join below reads that same path, and Spark's
    # write-refresh would otherwise invalidate a mere .cache() and
    # re-execute the anti-join against the already-appended docmap —
    # silently deduping the new batch out of existence.  (On a real
    # cluster use reliable checkpoint() with a checkpoint dir.)
    fresh = (
        assign_docids(
            dedup_incremental(new_docs, seen.select("content_sha256"))
        )
        .withColumn("docid", (F.col("docid") + base).cast("long"))
        .withColumn("tokens", tok)
        .withColumn("doclen", F.size("tokens").cast("int"))
        .withColumn("title_tokens", ttok)
        .withColumn("title_len", F.size("title_tokens").cast("int"))
        .withColumn("quality", quality_col(F.col("content"),
                                           F.col("tokens")))
        .localCheckpoint(eager=True)
    )
    # appending to a pre-quality-column index must keep the docmap
    # parquet schema uniform across files (plain reads don't
    # mergeSchema); such docs keep query-time quality computation
    docmap_cols = [c for c in DOCMAP_COLS if c in existing.columns]
    n_new = fresh.count()
    metrics["n_new"] = n_new
    if n_new == 0:
        fresh.unpersist()
        if compact:
            mode = resolve_compact_mode(compact, meta)
            metrics["compact_mode"] = mode
            compact_index(spark, index_dir, mode=mode)
        metrics["append_sec"] = time.time() - t0
        return metrics
    store.write(fresh.select(*docmap_cols), "docmap", mode="append")
    store.refresh(spark, "docmap")

    # refreshed corpus stats (exact, over the full docmap)
    n_docs = int(meta["n_docs"]) + n_new
    next_docid = base + n_new
    new_stats = store.read(spark, "docmap").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        F.avg("title_len").alias("avgdl_title"),
    )
    srow = new_stats.collect()[0]
    avgdl, avgdl_title = float(srow[1]), float(srow[2])
    store.write(new_stats, "stats", coalesce=1)

    index_title = bool(meta.get("index_title", False))
    postings = build_postings(fresh)
    meta_fields = [
        f_ for f_ in meta.get("index_fields", []) or []
        if f_ in fresh.columns
    ]
    if meta_fields:
        from search_engine_spark.indexer.postings import (
            build_meta_postings,
        )

        postings = postings.unionByName(
            build_meta_postings(fresh, meta_fields)
        )
    seg = build_segments(postings, cfg, avgdl, gen=gen)
    if index_title:
        seg = seg.unionByName(
            build_segments(
                build_title_postings(fresh), cfg, avgdl_title, gen=gen
            )
        )
    store.write(seg, "segments", mode="append", partition_by="slab")
    fresh.unpersist()
    store.refresh(spark, "segments")
    store.refresh(spark, "docmap")

    # ONE pruned segments scan refreshes both stats tables: the
    # (term, slab) inventory, then df over ALL generations from it
    write_term_slabs(spark, store)
    store.write(
        store.read(spark, "term_slabs")
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df")),
        "df",
    )

    meta["n_docs"] = n_docs
    meta["next_docid"] = next_docid
    meta["avgdl"] = avgdl
    meta["norm_avgdl"] = min(float(meta["norm_avgdl"]), avgdl)
    meta["avgdl_title"] = avgdl_title
    meta["norm_avgdl_title"] = min(
        float(meta.get("norm_avgdl_title", avgdl_title)), avgdl_title
    )
    meta["max_gen"] = gen
    # slabs cover the docid RANGE (watermark), not the live count
    meta["n_slabs"] = max(1, math.ceil(next_docid / cfg.slab_size))
    L.append_lineage(
        spark,
        index_dir,
        [{"slab": -1, "gen": gen, "status": "COMPLETED", "rows": n_new}],
    )

    store.put_meta(spark, meta)
    if compact:
        mode = resolve_compact_mode(compact, meta)
        metrics["compact_mode"] = mode
        compact_index(spark, index_dir, mode=mode)
    metrics["append_sec"] = time.time() - t0
    metrics["n_docs"] = n_docs
    return metrics


def update_documents(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    use_arrow_udf: bool = True,
    compact: bool | str = False,
) -> dict:
    """Index-time upsert (the ES index-with-same-id analog): a new
    version of a document replaces the old one, keyed by the canonical
    identity (repo, path) — SURVEY F7's URL-normalization analog for a
    code corpus.

    Composition of the two existing primitives: superseded docids
    (same key, DIFFERENT content sha) are tombstoned, then the batch
    appends as a fresh generation — the replacement shows up at the
    caller's ``engine.refresh()``, old versions are physically
    reclaimed by the next purging compaction, and docids of replaced
    versions are never reused.  A doc whose content is unchanged for
    its key is a no-op (its sha dedups away and nothing is deleted).
    Corpus-wide exact dedup still applies: new content identical to a
    LIVE doc under a different key is not re-added (the global
    content-dedup policy, J2).

    Returns the append metrics plus ``n_replaced``."""
    from pyspark.sql import functions as F  # noqa: F811 (module-local)

    from search_engine_spark.catalog import store_for

    store = store_for(index_dir)
    existing = store.read(spark, "docmap")
    if store.exists("tombstones", spark):
        # only LIVE docs can be replaced — an already-tombstoned old
        # version must not be counted (or deleted) again
        existing = existing.join(
            store.read(spark, "tombstones"), "docid", "left_anti"
        )
    incoming = (
        new_docs.withColumn("_sha", F.sha2(F.col("content"), 256))
        .select("repo", "path", "_sha")
        .distinct()
    )
    stale = (
        existing.join(incoming, ["repo", "path"])
        .filter(F.col("content_sha256") != F.col("_sha"))
        .select("docid")
        .distinct()
    )
    stale_ids = sorted(int(r["docid"]) for r in stale.collect())
    if stale_ids:
        delete_documents(spark, index_dir, docids=stale_ids)
    metrics = append_documents(
        spark, index_dir, new_docs, use_arrow_udf, compact
    )
    metrics["n_replaced"] = len(stale_ids)
    return metrics


def delete_documents(
    spark: SparkSession,
    index_dir: str,
    docids=None,
    where=None,
) -> int:
    """Tombstone deletes — the ES delete-by-id / delete_by_query
    analog the LSM write path was missing (the reference's adapter
    exposes document CRUD through Spring Data; SURVEY §2.1 S5/S7).

    Marks documents deleted by writing their docids to a
    ``tombstones`` table; queries exclude them immediately (call
    ``engine.refresh()`` after, the same rule as append/compact), and
    BM25 corpus statistics (n_docs / avgdl / df) intentionally stay
    pre-delete until a purging ``compact_index`` — the Lucene
    deleted-docs rule (liveDocs mask now, stats corrected at merge).
    The tombstone set is the live-deletes working set (Lucene's
    liveDocs bitmap analog): bounded driver-side and shipped to the
    kernels as sorted arrays; compaction physically reclaims the
    postings and clears the table.

    ``docids``: iterable of ints or a single-column DataFrame;
    ``where``: a pyspark Column predicate evaluated against docmap
    (delete_by_query).  Exactly one must be given.  Unknown docids are
    tolerated (they exclude nothing).  Returns the live tombstone
    count after the call."""
    from pyspark.sql import DataFrame as _DF

    from search_engine_spark.catalog import store_for

    if (docids is None) == (where is None):
        raise ValueError("pass exactly one of docids= / where=")
    store = store_for(index_dir)
    if where is not None:
        docmap = store.read(spark, "docmap")
        ids = {
            int(r["docid"])
            for r in docmap.filter(where).select("docid").collect()
        }
    elif isinstance(docids, _DF):
        col = docids.columns[0]
        ids = {int(r[col]) for r in docids.select(col).collect()}
    else:
        ids = {int(d) for d in docids}
    if store.exists("tombstones", spark):
        ids |= {
            int(r["docid"])
            for r in store.read(spark, "tombstones").collect()
        }
    if not ids:
        return 0
    store.write(
        spark.createDataFrame([(d,) for d in sorted(ids)], "docid long"),
        "tombstones",
        coalesce=1,
    )
    store.refresh(spark, "tombstones")
    return len(ids)


def resolve_compact_mode(compact: bool | str, meta: dict) -> str:
    """Compaction policy.  True (legacy) -> re-encode; explicit
    "splice"/"reencode" pass through; "auto" -> splice while block-max
    drift (avgdl / norm_avgdl, either field) stays within
    AUTO_REENCODE_DRIFT, re-encode once bounds have loosened past it.
    Drift only grows when the corpus's average doclen outgrows the
    basis the bounds were encoded with — exactly when WAND pruning
    pays for a re-tighten."""
    from search_engine_spark.config import AUTO_REENCODE_DRIFT

    if compact is True:
        return "reencode"
    if compact in ("splice", "reencode"):
        return str(compact)
    if compact != "auto":
        raise ValueError(
            f"unknown compact mode {compact!r}: use True, 'splice', "
            "'reencode' or 'auto'"
        )
    drift = float(meta["avgdl"]) / float(meta["norm_avgdl"])
    if meta.get("avgdl_title") and meta.get("norm_avgdl_title"):
        drift = max(
            drift,
            float(meta["avgdl_title"]) / float(meta["norm_avgdl_title"]),
        )
    return "reencode" if drift > AUTO_REENCODE_DRIFT else "splice"


def compact_index(
    spark: SparkSession, index_dir: str, mode: str = "reencode"
) -> None:
    """LSM compaction: merge all generations to one chunk per
    (term, slab).

    ``mode="reencode"`` (default): decode + re-encode, refreshing
    block-max bounds to the CURRENT corpus avgdl (query-time
    bound_scale returns to 1 — tightest pruning).

    ``mode="splice"``: byte-splicing merge (codec.splice_merge) —
    O(bytes moved), no interior-block decode; block-max keeps each
    generation's avgdl basis, so norm_avgdl is PRESERVED and queries
    stay exact via bound_scale.  The scale path for frequent merges;
    run a re-encode compaction occasionally to re-tighten bounds.

    Pending tombstones (delete_documents) are PURGED here — the
    Lucene merge-applies-deletes rule: the docmap drops the deleted
    rows, postings re-encode without them (a term whose postings
    empty out vanishes), df/term_slabs/stats/meta refresh to the live
    corpus, and the tombstone table clears.  Purging requires the
    decode path, so pending deletes force ``mode="reencode"``.
    Deleted docids are never reused (meta.next_docid watermark), so
    docids stay stable across the purge.
    """
    import shutil

    import numpy as np

    from search_engine_spark.catalog import store_for
    from search_engine_spark.indexer.merge import merge_segments, splice_segments

    store = store_for(index_dir)
    meta = store.get_meta(spark)
    cfg = EngineConfig(
        slab_size=int(meta["slab_size"]),
        term_buckets=int(meta["term_buckets"]),
        block_size=int(meta["block_size"]),
        k1=float(meta["k1"]),
        b=float(meta["b"]),
    )
    tomb = None
    if store.exists("tombstones", spark):
        rows = store.read(spark, "tombstones").collect()
        if rows:
            tomb = np.unique(
                np.array([int(r["docid"]) for r in rows], dtype=np.int64)
            )
    if tomb is not None:
        mode = "reencode"  # splice cannot drop postings
        # the watermark must survive the live-count drop BEFORE
        # n_docs is rewritten below
        meta["next_docid"] = int(meta.get("next_docid", meta["n_docs"]))
        # purge the docmap first and recompute live-corpus stats —
        # the re-encode must use the POST-delete avgdl as its basis
        dm = store.read(spark, "docmap")
        tombdf = spark.createDataFrame(
            [(int(d),) for d in tomb], "docid long"
        )
        kept = dm.join(F.broadcast(tombdf), "docid", "left_anti")
        if store.kind == "parquet":
            tmp_dm = f"{index_dir}/docmap_compact"
            kept.write.mode("overwrite").parquet(tmp_dm)
            shutil.rmtree(f"{index_dir}/docmap")
            os.rename(tmp_dm, f"{index_dir}/docmap")
        else:
            store.write(kept, "docmap")
        store.refresh(spark, "docmap")
        new_stats = store.read(spark, "docmap").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.avg("doclen").alias("avgdl"),
            F.avg("title_len").alias("avgdl_title"),
        )
        srow = new_stats.collect()[0]
        meta["n_docs"] = int(srow[0])
        meta["avgdl"] = float(srow[1]) if srow[1] is not None else 0.0
        meta["avgdl_title"] = (
            float(srow[2]) if srow[2] is not None else 0.0
        )
        store.write(new_stats, "stats", coalesce=1)
    avgdl = float(meta["avgdl"])
    avgdl_title = float(meta.get("avgdl_title", avgdl))
    all_seg = store.read(spark, "segments")
    if mode == "splice":
        compacted = splice_segments(all_seg)
    else:
        compacted = merge_segments(all_seg, cfg, avgdl, avgdl_title, tomb)
    if store.kind == "parquet":
        # parquet cannot atomically replace a table it is reading
        # from: write aside, swap directories
        tmp = f"{index_dir}/segments_compact"
        compacted.write.mode("overwrite").partitionBy("slab").parquet(tmp)
        shutil.rmtree(f"{index_dir}/segments")
        os.rename(tmp, f"{index_dir}/segments")
    else:
        # catalog-managed (Iceberg): createOrReplace is a snapshot swap
        store.write(compacted, "segments", partition_by="slab")
    # drop any cached plans over the old segment files (a cached
    # SearchEngine.segments would otherwise serve pre-compaction data
    # to EVERY later reader — Spark reuses cached relations for
    # equivalent path plans)
    store.refresh(spark, "segments")
    write_term_slabs(spark, store)
    if tomb is not None:
        # df over the purged postings — one pruned read of the fresh
        # inventory (the append path's discipline); terms whose
        # postings emptied out simply have no rows anymore
        store.write(
            store.read(spark, "term_slabs")
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df")),
            "df",
        )
        store.refresh(spark, "df")
        store.drop("tombstones", spark)
    if mode != "splice":
        # re-encode refreshed every bound to the current avgdl;
        # splice keeps per-generation bases, so norm_avgdl must stay
        meta["norm_avgdl"] = avgdl
        if "avgdl_title" in meta:
            meta["norm_avgdl_title"] = avgdl_title
    meta["max_gen"] = 0
    store.put_meta(spark, meta)
