"""Structured Streaming faces of the engine's batch semantics.

The reference's "streaming" is a Kafka micro-batch pump with
manual-ack redelivery (SURVEY.md §2.8) — no event-time windows, no
watermarks — and the north rule demands pure batch transforms, which
is why the ENGINE's core is batch with lineage-table resume.  These
adapters exist for pipelines that want the same semantics driven by a
stream:

- ``streaming_windowed_counts``: event-time tumbling window + late-
  data watermark over an events stream; its batch twin is
  ``contract_ops.q_events_windowed`` (tested equal on the same rows).
- ``stream_index_documents``: ``foreachBatch`` -> ``append_documents``
  — each micro-batch becomes one LSM generation, deduped via the
  content-sha anti-join, exactly the idempotent redelivery behavior
  the reference gets from url-hash existence checks
  (LinkDiscoveryConsumer.java:62-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_windowed_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window x event_type with late-data bound."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, "
    "n_events long, session_value double"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, value double"


def streaming_sessionize(
    events_stream: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """CUSTOM STATEFUL operator via ``applyInPandasWithState``: gap-
    based sessionization whose per-user open session survives ACROSS
    micro-batches (the semantics the lag+cumsum batch twin
    ``contract_ops.q_sessionize`` computes in one pass).

    Per user_id the state is the open session (start, last, n, value):
    each micro-batch's events extend it or close it on a > ``gap_sec``
    silence (closed sessions are EMITTED immediately — append mode);
    an event-time timeout at ``last + gap_sec`` past the watermark
    closes and emits a session no further events will ever join, so
    state size stays bounded by the number of currently-active users —
    the property that matters at 100 TB of events (state is sharded by
    the groupBy key; Spark checkpoints it per micro-batch).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    es = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark)

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        if state.hasTimedOut:
            start, last, n, value = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user], "session_start": [start],
                    "session_end": [last], "n_events": [n],
                    "session_value": [value],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        secs = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
        vals = rows["value"].astype(float).tolist()
        if state.exists:
            start, last, n, value = state.get
        else:
            start = last = None  # type: ignore[assignment]
            n, value = 0, 0.0
        closed = []
        for ts_s, v in zip(secs, vals):
            if last is not None and ts_s - last > gap_sec:
                closed.append((user, start, last, n, value))
                start, n, value = ts_s, 0, 0.0
            if start is None:
                start = ts_s
            n += 1
            value += v
            last = ts_s
        state.update((int(start), int(last), int(n), float(value)))
        # close once the watermark passes the session's gap horizon;
        # must be strictly ahead of the current watermark
        state.setTimeoutTimestamp(
            max((last + gap_sec) * 1000, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "session_value",
            ],
        )

    return es.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def stream_index_documents(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    compact_every: int = 0,
):
    """writeStream.foreachBatch -> incremental LSM index generations.

    Each micro-batch appends one generation (deduped against all
    previously indexed content); optional compaction every N batches.
    Returns the StreamingQuery (caller stops it / awaits).
    """
    from search_engine_spark.indexer.build import append_documents

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        compact = compact_every > 0 and (epoch_id + 1) % compact_every == 0
        append_documents(spark, index_dir, batch_df, compact=compact)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
