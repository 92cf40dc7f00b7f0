"""Structured Streaming faces == batch semantics."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index
from search_engine_spark.streaming.ingest import (
    stream_index_documents,
    streaming_windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_streaming_windowed_equals_batch(spark, tmp_path):
    import shutil

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = tmp_path / "events_dir"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-0.parquet")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = streaming_windowed_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in (
            events.groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
                ).alias("window_start"),
                "event_type",
            )
            .agg(
                F.count("*").cast("long").alias("n"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
            .collect()
        )
    }
    assert got == want


def test_stream_indexing_matches_batch_build(spark, tmp_path):
    cfg = EngineConfig(slab_size=256, term_buckets=8, block_size=32)
    src = str(tmp_path / "docs_src")
    corpus_df(spark, 300, partitions=3).write.mode("overwrite").parquet(src)

    # bootstrap an empty index from an empty (but schema-ful) batch
    docs_schema_df = spark.read.parquet(src)
    idx = str(tmp_path / "idx_stream")
    build_index(spark, docs_schema_df.limit(1), idx, cfg)

    stream = (
        spark.readStream.schema(docs_schema_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_index_documents(
        spark, stream, idx, str(tmp_path / "ckpt"), compact_every=2
    )
    q.awaitTermination(300)

    eng = SearchEngine(spark, idx)
    # every unique document got indexed exactly once
    dm = spark.read.parquet(f"{idx}/docmap")
    n_unique = docs_schema_df.select("content").distinct().count()
    assert dm.count() == n_unique
    shas = [r["content_sha256"] for r in dm.collect()]
    assert len(set(shas)) == len(shas)
    rows = eng.search("java search", 5).collect()
    assert len(rows) == 5
