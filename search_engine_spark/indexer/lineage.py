"""Per-slab lineage/metrics checkpointing — the resume mechanism.

Plays the role of the reference's crawl frontier status machine
(crawl_urls.status PENDING/IN_PROGRESS/COMPLETED,
V1__initial_schema.sql:13) and Kafka manual-ack redelivery
(SURVEY.md §2.8): the slab is the unit of work; a build wave writes
its slabs' segments, then appends COMPLETED lineage rows; a re-run
(resume=True) skips every slab already COMPLETED.  Segment writes use
dynamic partition overwrite, so re-processing a slab (crash between
write and lineage append, or speculative re-execution) is idempotent:
identical deterministic bytes replace themselves.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "slab int, gen int, status string, rows long, bytes long, "
    "started_at double, finished_at double, input_sha string"
)


def lineage_path(index_dir: str) -> str:
    return f"{index_dir}/lineage"


def _store(index_dir: str):
    from search_engine_spark.catalog import store_for

    return store_for(index_dir)


def append_lineage(
    spark: SparkSession,
    index_dir: str,
    entries: list[dict],
) -> None:
    if not entries:
        return
    df = spark.createDataFrame(
        [
            (
                int(e["slab"]),
                int(e.get("gen", 0)),
                e.get("status", "COMPLETED"),
                int(e.get("rows", 0)),
                int(e.get("bytes", 0)),
                float(e.get("started_at", time.time())),
                float(e.get("finished_at", time.time())),
                str(e.get("input_sha", "")),
            )
            for e in entries
        ],
        schema=LINEAGE_SCHEMA,
    )
    _store(index_dir).write(df, "lineage", mode="append")


def read_lineage(spark: SparkSession, index_dir: str) -> DataFrame | None:
    try:
        return _store(index_dir).read(spark, "lineage")
    except Exception:
        return None


def completed_slabs(spark: SparkSession, index_dir: str, gen: int = 0) -> set[int]:
    lin = read_lineage(spark, index_dir)
    if lin is None:
        return set()
    rows = (
        lin.filter((F.col("status") == "COMPLETED") & (F.col("gen") == gen))
        .select("slab")
        .distinct()
        .collect()
    )
    return {r["slab"] for r in rows}


def build_status(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Count-by-status rollup (reference GetCrawlStatusUseCase, A6)."""
    lin = read_lineage(spark, index_dir)
    if lin is None:
        return None
    return lin.groupBy("status").agg(
        F.count("*").alias("n_slabs"),
        F.sum("rows").alias("rows"),
        F.sum("bytes").alias("bytes"),
    )
