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


def test_stateful_sessionize_out_of_order(spark, tmp_path):
    """Late (in-watermark) events that arrive in a LATER micro-batch
    than newer events still produce the batch twin's sessions: a late
    event can prepend to an open session (start moves backwards, end
    does NOT regress) or bridge two previously separate runs into one
    (ADVICE r3 #1).  Emission happens once the watermark passes a
    session's gap horizon — the no-data timeout batch after the last
    file flushes every session the final watermark has sealed."""
    import pandas as pd

    from search_engine_spark.streaming.ingest import streaming_sessionize

    t0 = 1_700_000_000
    mk = lambda eid, uid, ts, v: {
        "event_id": eid, "user_id": uid,
        "ts": pd.Timestamp(ts, unit="s", tz=None), "value": float(v),
    }
    # f0 (on-time): u1 run (t0+3000 .. t0+3600); u2 TWO runs separated
    # by 3300 s > gap: (t0) and (t0+3300)
    f0 = pd.DataFrame([
        mk(1, 1, t0 + 3000, 2.0),
        mk(2, 1, t0 + 3600, 3.0),
        mk(3, 2, t0, 1.0),
        mk(4, 2, t0 + 3300, 2.0),
    ])
    # f1 (late but above watermark = t0+3600-7200): u1 event at
    # t0+1500 PREPENDS (1500 < state's last=3600 — the old code would
    # have regressed session_end to 1500 and split spuriously); a
    # second u1 event at t0+6000 opens a separate run; u2 event at
    # t0+1700 BRIDGES its two runs (t0..t0 and t0+3300) into one
    f1 = pd.DataFrame([
        mk(5, 1, t0 + 1500, 1.0),
        mk(6, 1, t0 + 6000, 4.0),
        mk(7, 2, t0 + 1700, 3.0),
    ])
    # f2: far-future clock event advances the watermark to t0+12800 so
    # every session above gets sealed and flushed by the timeout batch
    f2 = pd.DataFrame([mk(8, 1, t0 + 20000, 9.0)])
    src = tmp_path / "sess_ooo"
    src.mkdir()
    schema = "event_id long, user_id long, ts timestamp, value double"
    for i, f in enumerate([f0, f1, f2]):
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
        .queryName("sess_ooo_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["session_value"]
        )
        for r in spark.sql("SELECT * FROM sess_ooo_out").collect()
    }
    want = {
        (1, t0 + 1500): (t0 + 3600, 3, 6.0),  # prepended, end intact
        (1, t0 + 6000): (t0 + 6000, 1, 4.0),
        (2, t0): (t0 + 3300, 3, 6.0),         # bridged into one run
    }
    # (u1's t0+20000 session stays open: horizon t0+21800 > final wm)
    assert got == want

    # exact batch-twin parity: the lag+cumsum split of the fully
    # sorted event stream yields the same sealed sessions
    all_ev = pd.concat([f0, f1, f2])
    twin = {}
    for uid, g in all_ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        secs = (g["ts"].astype("int64") // 1_000_000_000).tolist()
        vals = g["value"].tolist()
        start, last, n, val = None, None, 0, 0.0
        for ts_s, v in zip(secs, vals):
            if last is not None and ts_s - last > 1800:
                twin[(uid, start)] = (last, n, val)
                start, n, val = None, 0, 0.0
            if start is None:
                start = ts_s
            n += 1
            val += v
            last = ts_s
        if start is not None and last + 1800 <= t0 + 20000 - 7200:
            twin[(uid, start)] = (last, n, val)
    assert got == twin
