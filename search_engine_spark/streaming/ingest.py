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
