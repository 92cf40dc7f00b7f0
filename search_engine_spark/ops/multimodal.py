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


def resize_image(payload: bytes, width: int, height: int):
    """Real resize requires PIL/libvips — not in this container."""
    raise NotImplementedError(
        "image resize stub: install pillow and replace this body with "
        "PIL.Image.open(...).resize((width, height)); fake_thumbnail "
        "below exercises the identical Spark plumbing"
    )


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(
    media: DataFrame, frame_bytes: int = 4096, every_n: int = 10
) -> DataFrame:
    """Video frame sampling plumbing: one media row fans out to many
    (media_id, frame_idx, frame) rows — every ``every_n``-th
    fixed-size slice of the payload.  With a real container parser
    the slicing becomes keyframe offsets; the Spark shape (mapInPandas
    row fan-out, binary frames, downstream repartition by media_id
    for per-video locality) is exactly the production one.
    """

    def frames(it):
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                buf = bytes(payload)
                n_frames = max(1, len(buf) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    blobs.append(buf[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": blobs}
            )

    return (
        media.filter(F.col("media_type") == "video/mp4")
        .select("media_id", "media")
        .mapInPandas(frames, schema=FRAME_SCHEMA)
    )


AUDIO_WINDOW_SCHEMA = (
    "media_id long, window_idx int, rms double, peak int"
)


def audio_windows(
    media: DataFrame, win_bytes: int = 1024, hop_bytes: int = 512
) -> DataFrame:
    """Audio windowing plumbing: overlapping fixed-width windows with
    per-window RMS/peak over the raw bytes (numpy sliding-window
    strides — zero Python byte loops).  A real pipeline swaps the
    byte view for decoded PCM; window math and fan-out are identical.
    """

    def wins(it):
        for pdf in it:
            ids, idxs, rms, peak = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) < win_bytes:
                    arr = np.pad(arr, (0, win_bytes - len(arr)))
                n_win = 1 + (len(arr) - win_bytes) // hop_bytes
                idx = (
                    np.arange(win_bytes)[None, :]
                    + hop_bytes * np.arange(n_win)[:, None]
                )
                w = arr[idx].astype(np.float64)
                ids.extend([mid] * n_win)
                idxs.extend(range(n_win))
                rms.extend(np.sqrt((w * w).mean(axis=1)).tolist())
                peak.extend(w.max(axis=1).astype(int).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "window_idx": idxs, "rms": rms,
                 "peak": peak}
            )

    return (
        media.filter(F.col("media_type") == "audio/wav")
        .select("media_id", "media")
        .mapInPandas(wins, schema=AUDIO_WINDOW_SCHEMA)
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
