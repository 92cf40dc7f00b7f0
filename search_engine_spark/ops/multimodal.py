"""Multimodal column plumbing: opaque binary media + typed metadata.

The image/audio decode libraries are not in this container, so the
DECODE step is stubbed (NotImplementedError) or replaced by a
deterministic fake — but the Spark-side plumbing is real and tested:
binary columns flow through Arrow `mapInPandas` in bounded batches,
schemas are explicit, and the partitioning story (repartition by
media_type for codec-homogeneous tasks) is the one a 100 TB media
pipeline would use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, media binary, width int, "
    "height int, n_bytes long"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_mean double, "
    "byte_entropy double, histogram16 array<int>"
)


def synthesize_media(docs: DataFrame, id_col: str = "docid",
                     text_col: str = "content") -> DataFrame:
    """Deterministic fake media: the UTF-8 bytes of the text column act
    as an opaque payload with fake image dimensions."""
    n = F.length(text_col).cast("long")
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        (F.pmod(F.col(id_col), F.lit(640)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(480)) + 16).cast("int").alias("height"),
        n.alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Real decode requires PIL/libvips — not in this container."""
    raise NotImplementedError(
        "image decode stub: install pillow and replace this body with "
        "PIL.Image.open(io.BytesIO(payload)); the surrounding Spark "
        "plumbing (schema, batching, partitioning) is real and tested"
    )


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Byte-level feature extraction via Arrow mapInPandas.

    Stands in for decode+embed; numpy-vectorized per payload
    (frombuffer + bincount), no Python-level byte loops.  Repartition
    by media_type first so each task handles one codec — at scale
    that is how you keep decoder state/libraries hot per task.
    """

    def feats(it):
        for pdf in it:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["media"]
            ):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) == 0:
                    out.append((mid, mtype, 0, 0.0, 0.0, [0] * 16))
                    continue
                hist = np.bincount(arr >> 4, minlength=16)
                p = hist / hist.sum()
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                out.append(
                    (
                        mid,
                        mtype,
                        int(len(arr)),
                        float(arr.mean()),
                        ent,
                        hist.astype(int).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "n_bytes", "byte_mean",
                    "byte_entropy", "histogram16",
                ],
            )

    return (
        media.repartition("media_type")
        .select("media_id", "media_type", "media")
        .mapInPandas(feats, schema=FEATURE_SCHEMA)
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-type rollup over the typed metadata (never touches bytes)."""
    return (
        media.groupBy("media_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.round(F.avg("width"), 3).alias("avg_width"),
            F.round(F.avg("height"), 3).alias("avg_height"),
        )
        .orderBy("media_type")
    )
