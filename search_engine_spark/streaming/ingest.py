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
# state = ALL not-yet-final sessions for the user, as parallel arrays
# of disjoint gap-separated runs sorted by start (usually length 1)
SESSION_STATE_SCHEMA = (
    "starts array<long>, lasts array<long>, "
    "ns array<long>, vals array<double>"
)


def streaming_sessionize(
    events_stream: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """CUSTOM STATEFUL operator via ``applyInPandasWithState``: gap-
    based sessionization with EXACT batch parity (the lag+cumsum twin
    ``contract_ops.q_sessionize``) for every event the watermark
    admits, including out-of-order arrival across micro-batches.

    Per user_id the state is the list of sessions that are not yet
    final — a session is final only once the watermark passes
    ``last + gap_sec``, because until then a late (but in-watermark)
    event could still extend it, prepend to it, or bridge it with a
    neighbouring run.  Each micro-batch merges its events into that
    list with one sorted linear pass over "atoms" (existing runs +
    new single-event runs): consecutive atoms whose gap is <=
    ``gap_sec`` coalesce, which reproduces the batch twin's gap split
    of the fully sorted event sequence regardless of arrival order.
    Sessions whose horizon the watermark has passed are emitted
    (append mode) and dropped from state; an event-time timeout at
    the earliest kept horizon guarantees emission when no further
    events arrive.  State stays bounded by the number of sessions
    inside one watermark window per active user — the property that
    matters at 100 TB of events (state is sharded by the groupBy key;
    Spark checkpoints it per micro-batch).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    es = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark)

    def split_final(sessions, wm_ms):
        """Partition runs into (final, kept) by the watermark horizon."""
        final = [s for s in sessions if (s[1] + gap_sec) * 1000 <= wm_ms]
        kept = [s for s in sessions if (s[1] + gap_sec) * 1000 > wm_ms]
        return final, kept

    def emit(user, sessions):
        return pd.DataFrame(
            [(user, s[0], s[1], s[2], s[3]) for s in sessions],
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "session_value",
            ],
        )

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        wm_ms = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            starts, lasts, ns, vals = state.get
            sessions = list(zip(starts, lasts, ns, vals))
            final, kept = split_final(sessions, wm_ms)
            if kept:
                state.update(
                    (
                        [int(s[0]) for s in kept],
                        [int(s[1]) for s in kept],
                        [int(s[2]) for s in kept],
                        [float(s[3]) for s in kept],
                    )
                )
                state.setTimeoutTimestamp(
                    max(
                        min((s[1] + gap_sec) * 1000 for s in kept) - 1,
                        wm_ms + 1,
                    )
                )
            else:
                state.remove()
            yield emit(user, final)
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        secs = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
        vals_in = rows["value"].astype(float).tolist()
        atoms = [(ts_s, ts_s, 1, float(v)) for ts_s, v in zip(secs, vals_in)]
        if state.exists:
            starts, lasts, ns, vals = state.get
            atoms.extend(zip(starts, lasts, ns, vals))
        # one linear coalesce over atoms sorted by (start, last):
        # identical to the batch twin's gap split of the sorted stream
        atoms.sort(key=lambda a: (a[0], a[1]))
        sessions = []
        for a in atoms:
            if sessions and a[0] - sessions[-1][1] <= gap_sec:
                s = sessions[-1]
                sessions[-1] = (
                    s[0], max(s[1], a[1]), s[2] + a[2], s[3] + a[3]
                )
            else:
                sessions.append(a)
        final, kept = split_final(sessions, wm_ms)
        if kept:
            state.update(
                (
                    [int(s[0]) for s in kept],
                    [int(s[1]) for s in kept],
                    [int(s[2]) for s in kept],
                    [float(s[3]) for s in kept],
                )
            )
            # fire once the watermark reaches the EARLIEST kept horizon
            # (Spark fires on timeout < watermark, strictly — hence the
            # -1 ms); must be strictly ahead of the current watermark
            state.setTimeoutTimestamp(
                max(min((s[1] + gap_sec) * 1000 for s in kept) - 1,
                    wm_ms + 1)
            )
        else:
            state.remove()
        yield emit(user, final)

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
