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


def test_stateful_sessionize_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionizer: the open session SURVIVES
    micro-batch boundaries (file 2's first event continues user 1's
    session from file 1), gaps close+emit sessions in-batch, and the
    emitted (closed) sessions match the batch lag+cumsum semantics."""
    import pandas as pd

    from search_engine_spark.streaming.ingest import streaming_sessionize

    t0 = 1_700_000_000  # epoch seconds, deterministic
    mk = lambda eid, uid, ts, v: {
        "event_id": eid, "user_id": uid,
        "ts": pd.Timestamp(ts, unit="s", tz=None), "value": float(v),
    }
    # file 1: user 1 two events 10 min apart; user 2 one event
    f1 = pd.DataFrame([
        mk(1, 1, t0, 1.0),
        mk(2, 1, t0 + 600, 2.0),
        mk(3, 2, t0, 5.0),
    ])
    # file 2 (next micro-batch): user 1 event 20 min after f1's last
    # (same session, continued ACROSS batches), then one 2h later
    # (gap -> closes session 1); user 2 event 3h later (closes too)
    f2 = pd.DataFrame([
        mk(4, 1, t0 + 1800, 3.0),
        mk(5, 1, t0 + 1800 + 7200, 7.0),
        mk(6, 2, t0 + 10800, 9.0),
    ])
    src = tmp_path / "sess_events"
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"
    for i, f in enumerate([f1, f2]):
        spark.createDataFrame(f, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = streaming_sessionize(stream, gap_sec=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["session_value"]
        )
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # closed sessions only (the t0+9000 / t0+10800 sessions stay open
    # in state — no later watermark advance forces their timeout here)
    want = {
        (1, t0): (t0 + 1800, 3, 6.0),   # 3 events ACROSS both batches
        (2, t0): (t0, 1, 5.0),
    }
    assert got == want
