"""Multimodal binary-column plumbing: schema, batching, features."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import corpus_df
from search_engine_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = corpus_df(spark, 120, partitions=4).withColumn(
        "docid", F.xxhash64("repo", "path")
    )
    return mm.synthesize_media(docs).cache()


def test_media_schema_and_stats(media):
    assert dict(media.dtypes)["media"] == "binary"
    stats = {r["media_type"]: r["n"] for r in mm.media_stats(media).collect()}
    assert set(stats) == {"image/png", "audio/wav", "video/mp4"}
    assert sum(stats.values()) == 120


def test_decode_entropy_codecs_still_raise():
    # lossy VP8 stays behind the documented stub (no pillow here);
    # PNG (r4), baseline JPEG, GIF and lossless-VP8L (r5) no longer
    # do.
    import struct

    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        mm.decode_image(lossy)
    with pytest.raises(NotImplementedError):
        mm.resize_image(lossy, 64, 64)
    with pytest.raises(NotImplementedError):  # unknown magic entirely
        mm.decode_image(b"\x00unknown-magic" + b"\x00" * 32)
    # truncated baseline JPEG / garbage GIF / chunkless-WebP bodies
    # are ValueErrors (quarantined row-wise), not hard
    # NotImplementedErrors
    with pytest.raises(ValueError):
        mm.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89a" + b"\x00" * 32)
    with pytest.raises(ValueError):
        mm.decode_image(b"RIFFxxxxWEBP" + b"\x00" * 32)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 7) % 256, (y * 13) % 256, (x + y) % 256],
                    axis=-1).astype(np.uint8)


def test_ppm_roundtrip_and_comments():
    img = _gradient(5, 9)
    assert np.array_equal(mm.decode_image(mm.encode_ppm(img)), img)
    # whitespace/comment-tolerant header
    hdr = b"P6 # a comment\n# another\n 9\t5 # w h\n255\n"
    assert np.array_equal(mm.decode_image(hdr + img.tobytes()), img)
    gray = img[:, :, 0]
    assert np.array_equal(mm.decode_image(mm.encode_ppm(gray)), gray)


def _make_bmp(img, bottom_up=True, bpp=24):
    """Hand-rolled BI_RGB BMP writer (test-only twin of the decoder)."""
    h, w = img.shape[:2]
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for yy in order:
        px = b"".join(
            bytes([img[yy, xx, 2], img[yy, xx, 1], img[yy, xx, 0]])
            + (b"\xff" if nb == 4 else b"")
            for xx in range(w)
        )
        rows.append(px + b"\x00" * (stride - w * nb))
    data = b"".join(rows)
    off = 14 + 40
    header = (
        b"BM" + (off + len(data)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (h if bottom_up else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 20
    )
    return header + data


def test_bmp_decode_24_and_32_bit_both_orientations():
    img = _gradient(4, 6)
    for bottom_up in (True, False):
        for bpp in (24, 32):
            got = mm.decode_image(_make_bmp(img, bottom_up, bpp))
            assert np.array_equal(got, img), (bottom_up, bpp)
    with pytest.raises(NotImplementedError):
        mm.decode_image(_make_bmp(img)[:30] + b"\x01" + _make_bmp(img)[31:])


def test_png_roundtrip_all_filters_and_color_types():
    """encode_png writes every scanline with one chosen filter, so
    each reconstruction path of _decode_png (None/Sub/Up/Average/
    Paeth) is exercised against ground truth, for gray / gray+alpha /
    RGB / RGBA."""
    rgb = _gradient(7, 5)
    imgs = {
        1: rgb[:, :, 0],                                   # gray
        2: np.dstack([rgb[:, :, 0], rgb[:, :, 1]]),        # gray+alpha
        3: rgb,                                            # RGB
        4: np.dstack([rgb, (rgb[:, :, 0] ^ 0xFF)]),        # RGBA
    }
    for ch, img in imgs.items():
        for ft in range(5):
            got = mm.decode_image(mm.encode_png(img, filter_type=ft))
            assert np.array_equal(got, img), (ch, ft)


def test_png_palette_decode():
    import struct
    import zlib

    # 4x3 indexed image over a 4-color palette, filter 0 rows
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 11, 13]], np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 0]], np.uint8)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))

    def chunk(typ, payload):
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    buf = (
        mm.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image(buf), pal[idx])


def test_png_out_of_scope_variants_raise():
    import struct
    import zlib

    img = _gradient(3, 3)
    good = mm.encode_png(img)

    def rebuild(depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 3, 3, depth, 2, 0, 0, interlace)
        return (
            mm.PNG_SIG
            + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
            + (zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
            + good[8 + 25:]
        )

    with pytest.raises(NotImplementedError):
        mm.decode_image(rebuild(depth=16))
    with pytest.raises(NotImplementedError):
        mm.decode_image(rebuild(interlace=1))
    with pytest.raises(ValueError):  # truncated IDAT -> size mismatch
        mm.decode_image(
            mm.encode_png(img[:2]).replace(
                struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0),
                struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0),
            )
        )


def test_png_resize_drops_alpha():
    rgb = _gradient(4, 4)
    rgba = np.dstack([rgb, np.full((4, 4), 9, np.uint8)])
    out = mm.decode_image(mm.resize_image(mm.encode_png(rgba), 2, 2))
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, mm.resize_nearest(rgb, 2, 2))
    ga = np.dstack([rgb[:, :, 0], rgb[:, :, 1]])
    out2 = mm.decode_image(mm.resize_image(mm.encode_png(ga), 2, 2))
    assert out2.shape == (2, 2)
    assert np.array_equal(out2, mm.resize_nearest(rgb[:, :, 0], 2, 2))


def test_resize_nearest_exact():
    img = np.array([[[0, 0, 0], [10, 10, 10]],
                    [[20, 20, 20], [30, 30, 30]]], dtype=np.uint8)
    up = mm.resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    # 2x upscale of 2x2 with center mapping = each pixel repeated 2x2
    assert np.array_equal(up[:2, :2, 0], np.zeros((2, 2)))
    assert np.array_equal(up[2:, 2:, 0], np.full((2, 2), 30))
    out = mm.decode_image(mm.resize_image(mm.encode_ppm(img), 4, 4))
    assert np.array_equal(out, up)


def test_decode_features_spark_end_to_end(spark):
    docs = spark.range(40).select(F.col("id").alias("docid"))
    media = mm.synthesize_ppm_media(docs)
    feats = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert len(feats) == 40 and all(f["ok"] for f in feats.values())
    for did in (0, 7, 23):
        w, h = 8 + did % 9, 8 + did % 7
        f = feats[did]
        assert (f["width"], f["height"], f["channels"]) == (w, h, 3)
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([(x * 3 + did) % 256, (y * 5 + did * 7) % 256,
                        (x + y + did * 11) % 256], axis=-1)
        want = (img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587
                + img[:, :, 2] * 0.114).mean()
        assert f["mean_luma"] == pytest.approx(float(want), rel=1e-9)


def test_decode_features_quarantines_bad_rows(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "media_type": ["image/x-ppm", "image/png", "image/png"],
            "media": [
                mm.encode_ppm(_gradient(3, 3)),
                b"\x89PNG\r\n junk",           # bad signature
                mm.PNG_SIG + b"\x00\x00\x00\x0dIHDR" + b"\x07" * 21
                + b"\x00\x00\x00\x04IDAT junk",  # valid sig, rotten body
            ],
            "width": [3, 0, 0], "height": [3, 0, 0], "n_bytes": [0, 0, 0],
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert rows[1]["ok"] and not rows[2]["ok"] and not rows[3]["ok"]
    assert rows[2]["width"] is None


def test_decode_features_png_spark_end_to_end(spark):
    import pandas as pd

    imgs = {i: _gradient(4 + i % 3, 5 + i % 4) for i in range(12)}
    pdf = pd.DataFrame(
        {
            "media_id": list(imgs),
            "media_type": ["image/png"] * len(imgs),
            "media": [
                mm.encode_png(img, filter_type=i % 5)
                for i, img in imgs.items()
            ],
            "width": [img.shape[1] for img in imgs.values()],
            "height": [img.shape[0] for img in imgs.values()],
            "n_bytes": [0] * len(imgs),
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert len(feats) == len(imgs) and all(f["ok"] for f in feats.values())
    for i, img in imgs.items():
        f = feats[i]
        assert (f["width"], f["height"], f["channels"]) == (
            img.shape[1], img.shape[0], 3,
        )
        want = (img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587
                + img[:, :, 2] * 0.114).mean()
        assert f["mean_luma"] == pytest.approx(float(want), rel=1e-9)


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, frame_bytes=512, every_n=3).collect()
    assert frames, "video rows must fan out to frames"
    vids = {r["media_id"]: bytes(r["media"])
            for r in media.filter(F.col("media_type") == "video/mp4")
            .select("media_id", "media").collect()}
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)
    for mid, rs in by_vid.items():
        idxs = sorted(r["frame_idx"] for r in rs)
        assert idxs == list(range(0, max(1, len(vids[mid]) // 512), 3))
        for r in rs:
            off = r["frame_idx"] * 512
            assert bytes(r["frame"]) == vids[mid][off:off + 512]


def test_audio_windows_match_numpy(media):
    wins = mm.audio_windows(media, win_bytes=256, hop_bytes=128).collect()
    assert wins
    auds = {r["media_id"]: bytes(r["media"])
            for r in media.filter(F.col("media_type") == "audio/wav")
            .select("media_id", "media").collect()}
    by_id = {}
    for r in wins:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == set(auds)
    for mid, rs in list(by_id.items())[:5]:
        arr = np.frombuffer(auds[mid], dtype=np.uint8)
        if len(arr) < 256:
            arr = np.pad(arr, (0, 256 - len(arr)))
        for r in sorted(rs, key=lambda x: x["window_idx"])[:4]:
            w = arr[r["window_idx"] * 128:r["window_idx"] * 128 + 256]
            w = w.astype(np.float64)
            assert r["rms"] == pytest.approx(float(np.sqrt((w * w).mean())),
                                             rel=1e-12)
            assert r["peak"] == int(w.max())


def test_feature_extraction_matches_numpy(media):
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    rows = media.select("media_id", "media").collect()
    assert len(feats) == len(rows)
    for r in rows[:20]:
        arr = np.frombuffer(bytes(r["media"]), dtype=np.uint8)
        f = feats[r["media_id"]]
        assert f["n_bytes"] == len(arr)
        assert f["byte_mean"] == pytest.approx(float(arr.mean()), rel=1e-12)
        hist = np.bincount(arr >> 4, minlength=16)
        assert list(f["histogram16"]) == hist.tolist()
        p = hist / hist.sum()
        ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
        assert f["byte_entropy"] == pytest.approx(ent, rel=1e-12)


# --- baseline JPEG (round 5: ops/jpeg.py) ----------------------------------

def test_jpeg_dc_exact_roundtrip():
    """With quant=1, per-block-constant images hit the DC-only path
    where FDCT -> quantize -> IDCT is EXACT (DC of a constant block is
    8*(c-128), all AC zero), so the lossy codec pins bit-exact here."""
    from search_engine_spark.ops import jpeg as J

    rng = np.random.RandomState(3)
    blocks = rng.randint(0, 256, (4, 5))
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(img)), img)
    # constant RGB in 4:4:4 AND 4:2:0 (box-subsampled constant chroma
    # stays constant, so still exact)
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[...] = (40, 90, 200)
    for sub in ("4:4:4", "4:2:0"):
        got = J.decode_jpeg(J.encode_jpeg(rgb, subsampling=sub))
        assert np.array_equal(got, rgb), sub


def test_jpeg_bounded_error_and_shapes():
    """Arbitrary content at quant=1: reconstruction error bounded by
    DCT rounding (<=2), including odd dimensions, 4:2:0 and restart
    markers."""
    from search_engine_spark.ops import jpeg as J

    rng = np.random.RandomState(4)
    for shape, kw in [
        ((13, 21), {}),
        ((40, 72), {"restart_interval": 3}),
        ((24, 40, 3), {"subsampling": "4:4:4"}),
    ]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        got = J.decode_jpeg(J.encode_jpeg(img, **kw))
        assert got.shape == img.shape
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2, kw
    # smooth gradient through the dispatch in multimodal.decode_image
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    got = mm.decode_image(J.encode_jpeg(img))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_progressive_pixel_identical_to_baseline():
    """The progressive twin's default scan script refines every
    coefficient bit down to Al=0 and both encoders quantize the SAME
    shared coefficient grids, so decoding the SOF2 stream must be
    PIXEL-IDENTICAL to decoding the baseline stream of the same image
    — across gray/RGB, 4:2:0 (including the padded-vs-coded block-grid
    divergence at 24x24), odd shapes, restart markers, and sparse
    high-quant coefficients (long EOB runs + ZRL refinement paths)."""
    from search_engine_spark.ops import jpeg as J

    rng = np.random.RandomState(11)
    cases = [
        (rng.randint(0, 256, (24, 17)).astype(np.uint8), {}),
        (rng.randint(0, 256, (33, 41, 3)).astype(np.uint8),
         {"quant": 2}),
        (rng.randint(0, 256, (24, 24, 3)).astype(np.uint8),
         {"quant": 2, "subsampling": "4:2:0"}),
        (rng.randint(0, 256, (25, 31, 3)).astype(np.uint8),
         {"quant": 4, "subsampling": "4:2:0"}),
    ]
    for img, kw in cases:
        base = J.decode_jpeg(J.encode_jpeg(img, **kw))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(img, **kw))
        assert np.array_equal(base, prog), kw
    # restart markers inside progressive scans (flushes EOB runs)
    img = cases[1][0]
    base = J.decode_jpeg(J.encode_jpeg(img, quant=2))
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(img, quant=2, restart_interval=3))
    assert np.array_equal(base, prog)
    # sparse coefficients: long EOBn spans and refinement ZRL
    x = np.linspace(0, 255, 72)
    smooth = np.clip(np.add.outer(x[:64] * 2, x) / 3, 0, 255) \
        .astype(np.uint8)
    smooth3 = np.stack([smooth] * 3, -1)
    q = np.full(64, 40)
    q[0] = 8
    base = J.decode_jpeg(J.encode_jpeg(smooth3, quant=q))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(smooth3, quant=q))
    assert np.array_equal(base, prog)
    # DC-only exactness survives the progressive path at quant=1
    blocks = rng.randint(0, 256, (3, 4))
    dc = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(dc)), dc)
    # the dispatch seam recognizes SOF2 payloads
    assert np.array_equal(
        mm.decode_image(J.encode_jpeg_progressive(dc)), dc)


def test_jpeg_progressive_custom_script_and_errors():
    """Non-interleaved DC scans, two-step successive approximation,
    and restart intervals in a custom script all reconstruct the
    baseline image; truncated/invalid progressive streams raise
    ValueError (the quarantine contract)."""
    from search_engine_spark.ops import jpeg as J

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (19, 23, 3)).astype(np.uint8)
    script = [
        ([0], 0, 0, 0, 2), ([1], 0, 0, 0, 2), ([2], 0, 0, 0, 2),
        ([0], 1, 63, 0, 1), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
        ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
        ([1], 0, 0, 2, 1), ([1], 0, 0, 1, 0),
        ([2], 0, 0, 2, 1), ([2], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
    ]
    base = J.decode_jpeg(J.encode_jpeg(img, quant=2))
    for ri in (0, 2):
        prog = J.decode_jpeg(J.encode_jpeg_progressive(
            img, quant=2, scans=script, restart_interval=ri))
        assert np.array_equal(base, prog), ri
    enc = J.encode_jpeg_progressive(img, quant=2)
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[: len(enc) * 2 // 3] + b"\xff\xd9")
    # invalid scripts are rejected at the API boundary, before any
    # bytes are emitted
    for bad in [
        [([0, 1, 2], 1, 63, 0, 0)],  # multi-component AC scan
        [([0], 0, 5, 0, 0)],         # DC scan with Se != 0
        [([0], 1, 64, 0, 0)],        # Se out of range
        [([0], 0, 0, 1, 1)],         # refinement must have Ah == Al+1
        [([3], 0, 0, 0, 0)],         # missing component
    ]:
        with pytest.raises(ValueError):
            J.encode_jpeg_progressive(img, scans=bad)


def test_jpeg_crafted_dc_magnitude_quarantines():
    """A crafted DHT whose DC symbol demands a >15-bit magnitude (an
    unbounded predictor that would overflow the int32 coefficient
    store) raises ValueError on both the baseline and progressive
    paths — the quarantine contract, not OverflowError."""
    from search_engine_spark.ops import jpeg as J

    bits = [1] + [0] * 15  # one symbol, code '0' at length 1
    for sof_marker, sos_tail in [
        (0xC0, bytes([0, 63, 0])),   # baseline
        (0xC2, bytes([0, 0, 0])),    # progressive DC-first scan
    ]:
        out = bytearray(b"\xff\xd8")
        out += J._seg(0xDB, bytes([0]) + bytes([1] * 64))
        sof = bytes([8]) + (8).to_bytes(2, "big") \
            + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
        out += J._seg(sof_marker, sof)
        out += J._dht_seg(0, 0, bits, [20])  # DC magnitude 20: bogus
        out += J._dht_seg(1, 0, bits, [0])
        out += J._seg(0xDA, bytes([1, 1, 0x00]) + sos_tail)
        out += bytes(4) + b"\xff\xd9"
        with pytest.raises(ValueError):
            J.decode_jpeg(bytes(out))


def test_jpeg_progressive_fuzz_parity():
    """Seeded fuzz: random shapes/quants/subsampling/restart — the
    progressive stream always decodes pixel-identical to the baseline
    stream of the same image."""
    from search_engine_spark.ops import jpeg as J

    rng = np.random.RandomState(99)
    for i in range(12):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        c = int(rng.choice([0, 3]))
        shape = (h, w) if c == 0 else (h, w, 3)
        im = rng.randint(0, 256, shape).astype(np.uint8)
        qv = int(rng.randint(1, 30))
        sub = "4:2:0" if (c == 3 and rng.rand() < 0.5) else "4:4:4"
        ri = int(rng.choice([0, 1, 5]))
        b = J.decode_jpeg(J.encode_jpeg(im, quant=qv, subsampling=sub))
        p = J.decode_jpeg(J.encode_jpeg_progressive(
            im, quant=qv, subsampling=sub, restart_interval=ri))
        assert np.array_equal(b, p), (i, shape, qv, sub, ri)


def test_jpeg_out_of_scope_raises():
    from search_engine_spark.ops import jpeg as J

    img = np.zeros((8, 8), np.uint8)
    good = J.encode_jpeg(img)
    # SOF3 (lossless) / SOF9 (arithmetic) -> NotImplementedError
    for sof in (b"\xff\xc3", b"\xff\xc9"):
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(good.replace(b"\xff\xc0", sof, 1))
    # flipping SOF0 to SOF2 makes the baseline scan header invalid as
    # a progressive one (DC scan with Se=63) -> clean ValueError
    with pytest.raises(ValueError):
        J.decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # truncated entropy data -> ValueError (quarantinable)
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:-8] + b"\xff\xd9")


def test_jpeg_spark_end_to_end(spark):
    """JPEG payloads through the real mapInPandas feature extractor:
    decoded dims/luma match numpy; a corrupt body quarantines ok=false
    without failing the task."""
    import pandas as pd

    from search_engine_spark.ops import jpeg as J

    imgs = {i: _gradient(16 + i % 3, 17 + i % 4) for i in range(8)}
    payloads = [J.encode_jpeg(img) for img in imgs.values()]
    payloads[5] = payloads[5][:40]  # corrupt one body
    pdf = pd.DataFrame(
        {
            "media_id": list(imgs),
            "media_type": ["image/jpeg"] * len(imgs),
            "media": payloads,
            "width": [img.shape[1] for img in imgs.values()],
            "height": [img.shape[0] for img in imgs.values()],
            "n_bytes": [0] * len(imgs),
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert len(feats) == len(imgs)
    assert not feats[5]["ok"]
    for i, img in imgs.items():
        if i == 5:
            continue
        f = feats[i]
        assert f["ok"]
        assert (f["width"], f["height"], f["channels"]) == (
            img.shape[1], img.shape[0], 3,
        )
        dec = J.decode_jpeg(J.encode_jpeg(img))
        want = (dec[:, :, 0] * 0.299 + dec[:, :, 1] * 0.587
                + dec[:, :, 2] * 0.114).mean()
        assert f["mean_luma"] == pytest.approx(float(want), rel=1e-9)


# --- GIF (round 5: ops/gif.py) ----------------------------------------------

def _palettized(rng, h, w, n_colors):
    pal = np.unique(
        rng.randint(0, 256, (n_colors * 2, 3), dtype=np.uint8), axis=0
    )[:n_colors]
    return pal, pal[rng.randint(0, len(pal), (h, w))]


def test_gif_static_roundtrips_bit_exact():
    """GIF is lossless on palettized content, so unlike the JPEG twin
    these pins are BIT-EXACT: RGB, grayscale, interlaced, GIF87a, and
    the decode_image/resize_image dispatch seam."""
    from search_engine_spark.ops import gif as G

    rng = np.random.RandomState(7)
    pal, img = _palettized(rng, 23, 31, 7)
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)
    assert np.array_equal(mm.decode_image(G.encode_gif(img)), img)
    assert np.array_equal(
        mm.decode_image(G.encode_gif(img, version=b"GIF87a")), img)
    # interlaced: 4-pass row order inverts exactly
    assert np.array_equal(
        G.decode_gif(G.encode_gif(img, interlace=True)), img)
    # grayscale 2D input -> (H, W, 3)
    g = rng.randint(0, 256, (9, 14)).astype(np.uint8)
    assert np.array_equal(
        G.decode_gif(G.encode_gif(g)), np.stack([g] * 3, axis=2))
    # resize seam re-encodes as PPM
    out = mm.decode_image(mm.resize_image(G.encode_gif(img), 8, 6))
    assert out.shape == (6, 8, 3)


def test_gif_lzw_dictionary_reset(monkeypatch):
    """A 24k-pixel 256-color noise image overflows the 4096-entry LZW
    table, forcing the encoder's mid-stream CLEAR + the decoder's
    deferred-clear handling; the roundtrip stays bit-exact.  The
    monkeypatched counter pins that the reset path actually ran."""
    from search_engine_spark.ops import gif as G

    rng = np.random.RandomState(11)
    pal, big = _palettized(rng, 120, 200, 256)
    resets = []
    orig = G._LzwEncoder._reset
    monkeypatch.setattr(
        G._LzwEncoder, "_reset",
        lambda self: (resets.append(1), orig(self)) and None)
    enc = G.encode_gif(big)
    assert len(resets) > 1, "mid-stream LZW reset never fired"
    assert np.array_equal(G.decode_gif(enc), big)


def test_gif_animation_disposal_and_transparency():
    """Multi-frame compositing against a numpy reference compositor:
    disposal 0 (keep), 2 (restore background), 3 (restore previous),
    and a transparent color that leaves the canvas untouched."""
    from search_engine_spark.ops import gif as G

    rng = np.random.RandomState(13)
    pal, base = _palettized(rng, 10, 12, 7)
    patch = pal[rng.randint(0, len(pal), (4, 5))]
    tcolor = tuple(int(c) for c in pal[3])
    frames = [
        (base, 0, 0, 0, None),
        (patch, 3, 2, 2, tcolor),   # transparency + restore-background
        (patch, 1, 1, 3, None),     # restore-previous
        (patch, 6, 4, 0, None),     # keep
    ]
    out = G.decode_gif_frames(G.encode_gif(frames=frames, loop=0))
    assert out.shape == (4, 10, 12, 3)
    assert np.array_equal(out[0], base)
    # frame 1: patch at (top=2, left=3), transparent pixels keep base
    exp1 = base.copy()
    opaque = ~(patch == np.asarray(tcolor, np.uint8)).all(axis=2)
    exp1[2:6, 3:8][opaque] = patch[opaque]
    assert np.array_equal(out[1], exp1)
    # frame 2: disposal 2 restored frame 1's region to the background
    # color (palette row 0 = smallest packed color, bg_index 0), then
    # frame 2 drew at (1,1)
    bg = np.unique(
        np.concatenate([base.reshape(-1, 3), patch.reshape(-1, 3)]), axis=0
    )[0]
    canvas = exp1.copy()
    canvas[2:6, 3:8] = bg
    exp2 = canvas.copy()
    exp2[1:5, 1:6] = patch
    assert np.array_equal(out[2], exp2)
    # frame 3: disposal 3 on frame 2 restored the pre-frame-2 canvas
    exp3 = canvas.copy()
    exp3[4:8, 6:11] = patch
    assert np.array_equal(out[3], exp3)


def test_gif_out_of_scope_and_corrupt():
    from search_engine_spark.ops import gif as G

    rng = np.random.RandomState(17)
    # >256 distinct colors: quantization is out of scope on encode
    y, x = np.mgrid[0:32, 0:32]
    many = np.stack([y * 8, x * 8, (y + x) % 256], axis=-1).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        G.encode_gif(many)
    # corrupt bodies are quarantinable ValueErrors
    pal, img = _palettized(rng, 23, 31, 7)
    enc = G.encode_gif(img)
    with pytest.raises(ValueError):
        G.decode_gif(enc[: len(enc) // 2])   # truncated sub-blocks
    # the full-animation decode still demands the trailer; the
    # still-image view stops after a complete first frame and is
    # deliberately indifferent to tail truncation (lazy first-frame
    # semantics, like real decoders)
    with pytest.raises(ValueError):
        G.decode_gif_frames(enc[:-1])        # missing trailer
    assert G.decode_gif(enc[:-1]).shape[:2] == img.shape[:2]
    with pytest.raises(ValueError):
        G.decode_gif(b"NOTGIF" + enc[6:])    # bad magic


def test_gif_spark_end_to_end(spark):
    """GIF payloads through the real mapInPandas feature extractor:
    decoded dims/luma match numpy; a corrupt body quarantines ok=false
    without failing the task."""
    import pandas as pd

    from search_engine_spark.ops import gif as G

    rng = np.random.RandomState(19)
    imgs = {
        i: _palettized(rng, 16 + i % 3, 17 + i % 4, 5 + i)[1]
        for i in range(8)
    }
    payloads = [G.encode_gif(img) for img in imgs.values()]
    payloads[5] = payloads[5][:40]  # corrupt one body
    pdf = pd.DataFrame(
        {
            "media_id": list(imgs),
            "media_type": ["image/gif"] * len(imgs),
            "media": payloads,
            "width": [img.shape[1] for img in imgs.values()],
            "height": [img.shape[0] for img in imgs.values()],
            "n_bytes": [0] * len(imgs),
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert len(feats) == len(imgs)
    assert not feats[5]["ok"]
    for i, img in imgs.items():
        if i == 5:
            continue
        f = feats[i]
        assert f["ok"]
        assert (f["width"], f["height"], f["channels"]) == (
            img.shape[1], img.shape[0], 3,
        )
        want = (img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587
                + img[:, :, 2] * 0.114).mean()
        assert f["mean_luma"] == pytest.approx(float(want), rel=1e-9)


# --- WebP lossless / VP8L (round 5: ops/webp.py) -----------------------------

def test_vp8l_roundtrips_bit_exact():
    """VP8L is lossless, so every encoder-twin feature pins the
    decoder BIT-EXACT: plain literals, LZ77 runs, color cache,
    subtract-green, grayscale, RGBA alpha, and the decode_image
    dispatch/resize seam."""
    from search_engine_spark.ops import webp as W

    rng = np.random.RandomState(23)
    pal, img = _palettized(rng, 13, 17, 7)
    assert np.array_equal(W.decode_webp(W.encode_webp(img)), img)
    assert np.array_equal(mm.decode_image(W.encode_webp(img)), img)
    runs = np.repeat(img, 4, axis=1)
    assert np.array_equal(W.decode_webp(W.encode_webp(runs)), runs)
    assert np.array_equal(
        W.decode_webp(W.encode_webp(img, cache_bits=4)), img)
    assert np.array_equal(
        W.decode_webp(W.encode_webp(img, subtract_green=True)), img)
    g = rng.randint(0, 256, (9, 11)).astype(np.uint8)
    assert np.array_equal(
        W.decode_webp(W.encode_webp(g)), np.stack([g] * 3, axis=2))
    rgba = np.dstack([img, img[:, :, 0] ^ 0x5A])
    assert np.array_equal(W.decode_webp(W.encode_webp(rgba)), rgba)
    out = mm.decode_image(mm.resize_image(W.encode_webp(rgba), 8, 6))
    assert out.shape == (6, 8, 3)  # resize drops alpha for PPM
    # full-color noise (every prefix tree non-trivial, >256 colors)
    noise = rng.randint(0, 256, (21, 19, 3)).astype(np.uint8)
    assert np.array_equal(W.decode_webp(W.encode_webp(noise)), noise)


def test_vp8l_palette_all_bundling_widths():
    """COLOR_INDEXING with sub-byte bundling: 1/2/4-bit indices and
    the unbundled >16-color form, via the delta-coded palette."""
    from search_engine_spark.ops import webp as W

    rng = np.random.RandomState(29)
    for n in (2, 3, 4, 9, 16, 17, 200):
        pal, img = _palettized(rng, 11, 23, n)
        got = W.decode_webp(W.encode_webp(img, palette=True))
        assert np.array_equal(got, img), n
    # width not divisible by the bundling unit
    pal, img = _palettized(rng, 5, 13, 2)
    assert np.array_equal(
        W.decode_webp(W.encode_webp(img, palette=True)), img)


def test_vp8l_predictor_all_modes():
    """PREDICTOR transform: the twin's tile grid cycles through all
    14 spatial predictors ((tx+ty) % 14 at size_bits=2 over a
    37x41 image covers every mode), composed with subtract-green and
    the color cache."""
    from search_engine_spark.ops import webp as W

    y, x = np.mgrid[0:37, 0:41]
    grad = np.stack([(x * 5 + y) % 256, (x + y * 7) % 256,
                     (x * 3 + y * 3) % 256], axis=-1).astype(np.uint8)
    for kw in (
        {"predictor_size_bits": 2},
        {"predictor_size_bits": 4},
        {"predictor_size_bits": 2, "subtract_green": True,
         "cache_bits": 6},
    ):
        got = W.decode_webp(W.encode_webp(grad, **kw))
        assert np.array_equal(got, grad), kw
    rng = np.random.RandomState(31)
    noise = rng.randint(0, 256, (21, 19, 4)).astype(np.uint8)
    got = W.decode_webp(W.encode_webp(noise, predictor_size_bits=3))
    assert np.array_equal(got, noise)


def test_vp8l_cross_color_roundtrips_bit_exact():
    """CROSS_COLOR transform (RFC 9649 §4.2.1): the twin's per-tile
    multipliers sweep the signed-byte range (37/59/73-step lattices
    mod 256 hit negative int8 values), and the forward transform uses
    the ORIGINAL red for the red_to_blue term while the decoder uses
    the restored red — roundtripping bit-exact proves the two orders
    agree, alone and composed with subtract-green / predictor /
    color-cache."""
    from search_engine_spark.ops import webp as W

    rng = np.random.RandomState(43)
    img = rng.randint(0, 256, (37, 29, 3)).astype(np.uint8)
    for kw in (
        {"cross_color_size_bits": 2},
        {"cross_color_size_bits": 9},   # one tile covers the image
        {"cross_color_size_bits": 3, "subtract_green": True},
        {"cross_color_size_bits": 2, "subtract_green": True,
         "predictor_size_bits": 3, "cache_bits": 5},
    ):
        got = W.decode_webp(W.encode_webp(img, **kw))
        assert np.array_equal(got, img), kw
    rgba = rng.randint(0, 256, (11, 13, 4)).astype(np.uint8)
    got = W.decode_webp(W.encode_webp(rgba, cross_color_size_bits=2))
    assert np.array_equal(got, rgba)
    # the delta math itself against scalar int8 semantics
    m = np.array([0x80, 0xFF, 0x7F, 0x01], np.uint32)  # -128,-1,127,1
    c = np.array([0xFF, 0x80, 0x7F, 0x40], np.uint32)  # -1,-128,127,64
    got = W._ct_delta(m, c)
    want = [(-128 * -1) >> 5, (-1 * -128) >> 5, (127 * 127) >> 5,
            (1 * 64) >> 5]
    assert got.tolist() == want


def test_vp8l_edge_shapes_and_containers():
    from search_engine_spark.ops import webp as W
    import struct

    one = np.array([[[7, 8, 9]]], np.uint8)
    assert np.array_equal(W.decode_webp(W.encode_webp(one)), one)
    big = np.zeros((70, 70, 3), np.uint8)  # run longer than LZ77 cap
    big[0, 0] = (1, 2, 3)
    assert np.array_equal(W.decode_webp(W.encode_webp(big)), big)
    # VP8X extended container wrapping the VP8L chunk
    rng = np.random.RandomState(37)
    pal, img = _palettized(rng, 9, 7, 5)
    enc = W.encode_webp(img)
    vp8l_chunk = enc[enc.index(b"VP8L"):]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    wrapped = (b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk))
               + b"WEBP" + vp8x + vp8l_chunk)
    assert np.array_equal(W.decode_webp(wrapped), img)
    assert np.array_equal(mm.decode_image(wrapped), img)


def test_vp8l_out_of_scope_and_corrupt():
    from search_engine_spark.ops import webp as W
    import struct

    rng = np.random.RandomState(41)
    pal, img = _palettized(rng, 9, 7, 5)
    enc = W.encode_webp(img)
    with pytest.raises(ValueError):
        W.decode_webp(enc[: len(enc) // 2])
    with pytest.raises(ValueError):
        W.decode_webp(b"XIFF" + enc[4:])
    # cross-color transform (type 1) header that truncates before its
    # tile image: a clean ValueError, not a hang or a numpy error
    bw = W._BitWriter()
    bw.bits(6, 14); bw.bits(4, 14); bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(1, 1); bw.bits(1, 2)
    payload = b"\x2f" + bw.done()
    cc = (b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP"
          + b"VP8L" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(ValueError):
        W.decode_webp(cc)
    # >256 colors on palette encode
    y, x = np.mgrid[0:32, 0:32]
    many = np.stack([y * 8, x * 8, (y + x) % 256], axis=-1).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        W.encode_webp(many, palette=True)


def test_vp8l_spark_end_to_end(spark):
    """VP8L payloads through the real mapInPandas feature extractor:
    decoded dims/luma match numpy; a corrupt body quarantines
    ok=false without failing the task."""
    import pandas as pd

    from search_engine_spark.ops import webp as W

    rng = np.random.RandomState(43)
    imgs = {
        i: _palettized(rng, 16 + i % 3, 17 + i % 4, 5 + i)[1]
        for i in range(8)
    }
    payloads = [
        W.encode_webp(img, cache_bits=3 if i % 2 else 0)
        for i, img in imgs.items()
    ]
    payloads[5] = payloads[5][:40]  # corrupt one body
    pdf = pd.DataFrame(
        {
            "media_id": list(imgs),
            "media_type": ["image/webp"] * len(imgs),
            "media": payloads,
            "width": [img.shape[1] for img in imgs.values()],
            "height": [img.shape[0] for img in imgs.values()],
            "n_bytes": [0] * len(imgs),
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.decode_features(media).collect()}
    assert len(feats) == len(imgs)
    assert not feats[5]["ok"]
    for i, img in imgs.items():
        if i == 5:
            continue
        f = feats[i]
        assert f["ok"]
        assert (f["width"], f["height"], f["channels"]) == (
            img.shape[1], img.shape[0], 3,
        )
        want = (img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587
                + img[:, :, 2] * 0.114).mean()
        assert f["mean_luma"] == pytest.approx(float(want), rel=1e-9)


# --- WAV PCM + MP4 container (round 5: ops/wav.py, ops/mp4.py) ---------------

def test_wav_roundtrips_bit_exact():
    """RIFF/WAVE PCM is a lossless container: 8/16/24/32-bit int and
    float32, mono and multi-channel, pin bit-exact; normalization
    maps to [-1, 1) with the documented per-width scale."""
    from search_engine_spark.ops import wav as W

    rng = np.random.RandomState(47)
    s16 = rng.randint(-32768, 32768, (500, 2)).astype(np.int16)
    dec, rate = W.decode_wav(W.encode_wav(s16, 44100))
    assert rate == 44100 and np.array_equal(dec, s16)
    u8 = rng.randint(0, 256, 300).astype(np.uint8)
    assert np.array_equal(
        W.decode_wav(W.encode_wav(u8))[0].reshape(-1), u8)
    s32 = rng.randint(-2**31, 2**31, (100, 3),
                      dtype=np.int64).astype(np.int32)
    assert np.array_equal(W.decode_wav(W.encode_wav(s32))[0], s32)
    f32 = (rng.rand(200, 2).astype(np.float32) * 2 - 1)
    assert np.array_equal(W.decode_wav(W.encode_wav(f32))[0], f32)
    s24 = (rng.randint(-2**23, 2**23, (150, 2), dtype=np.int64)
           << 8).astype(np.int32)
    assert np.array_equal(
        W.decode_wav(W.encode_wav(s24, bits=24))[0], s24)
    # normalization endpoints
    n, _ = W.decode_wav_normalized(
        W.encode_wav(np.array([0, 128, 255], np.uint8)))
    assert n.reshape(-1).tolist() == [-1.0, 0.0, 127 / 128]
    n, _ = W.decode_wav_normalized(
        W.encode_wav(np.array([-32768, 0, 32767], np.int16)))
    assert n.reshape(-1).tolist() == [-1.0, 0.0, 32767 / 32768]


def test_wav_extensible_and_errors():
    import struct

    from search_engine_spark.ops import wav as W

    rng = np.random.RandomState(53)
    s16 = rng.randint(-32768, 32768, (60, 2)).astype(np.int16)
    # WAVE_FORMAT_EXTENSIBLE resolving to PCM via the SubFormat GUID
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4, 4, 16)
           + struct.pack("<HHI", 22, 16, 3)
           + struct.pack("<H", 1) + b"\x00" * 14)
    data = s16.astype("<i2").tobytes()
    buf = (b"RIFF" + struct.pack("<I", 4 + 16 + len(fmt) + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    dec, rate = W.decode_wav(buf)
    assert rate == 44100 and np.array_equal(dec, s16)
    enc = W.encode_wav(s16)
    with pytest.raises(ValueError):
        W.decode_wav(enc[:30])
    with pytest.raises(ValueError):
        W.decode_wav(b"RIFFxxxxWEBP" + b"\x00" * 20)
    adpcm = enc[:20] + struct.pack("<H", 2) + enc[22:]
    with pytest.raises(NotImplementedError):
        W.decode_wav(adpcm)


def test_mp4_parse_and_sample_extraction():
    """The builder twin writes real stts/stsc/stsz/stco/stss tables;
    the parser's chunk-run offset arithmetic must hand back every
    sample payload bit-exact, keyframes per stss."""
    from search_engine_spark.ops import mp4 as M

    rng = np.random.RandomState(59)
    samples = [
        bytes(rng.randint(0, 256, rng.randint(5, 40)).astype(np.uint8))
        for _ in range(11)
    ]
    buf = M.build_mp4(samples, width=64, height=48, samples_per_chunk=3,
                      sync_every=4)
    info = M.parse_mp4(buf)
    assert info["brand"] == "isom"
    t = info["tracks"][0]
    assert (t["handler"], t["width"], t["height"]) == ("vide", 64.0, 48.0)
    assert t["sync_samples"] == [1, 5, 9]
    assert t["stsc_runs"] == [(1, 3, 1), (4, 2, 1)]
    got = M.extract_samples(buf, t)
    assert [p for _, _, p in got] == samples
    assert [s for _, s, _ in got] == [i % 4 == 0 for i in range(11)]
    kf = M.extract_samples(buf, t, keyframes_only=True)
    assert [i for i, _, _ in kf] == [0, 4, 8]
    assert all(samples[i] == p for i, _, p in kf)
    assert [i for i, _, _ in
            M.extract_samples(buf, t, every_n=3)] == [0, 3, 6, 9]
    # chunk-boundary counts
    for n in (1, 3, 6):
        b2 = M.build_mp4(samples[:n])
        t2 = M.parse_mp4(b2)["tracks"][0]
        assert [p for _, _, p in
                M.extract_samples(b2, t2)] == samples[:n], n
    with pytest.raises(ValueError):
        M.parse_mp4(buf[:40])
    with pytest.raises(ValueError):
        M.parse_mp4(buf[: len(buf) // 3])  # moov truncated away


def test_audio_windows_pcm_spark(spark):
    """Real WAV decode through mapInPandas: window RMS/peak over
    normalized PCM matches numpy; a corrupt payload quarantines as
    one ok=false row."""
    import pandas as pd

    from search_engine_spark.ops import wav as W

    rng = np.random.RandomState(61)
    waves = {i: rng.randint(-32768, 32768,
                            (600 + 40 * i, 2)).astype(np.int16)
             for i in range(4)}
    payloads = [W.encode_wav(w, 8000) for w in waves.values()]
    payloads[2] = payloads[2][:25]
    pdf = pd.DataFrame(
        {
            "media_id": list(waves),
            "media_type": ["audio/wav"] * len(waves),
            "media": payloads,
            "width": [0] * len(waves),
            "height": [0] * len(waves),
            "n_bytes": [len(p) for p in payloads],
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    rows = mm.audio_windows_pcm(media, win_frames=128,
                                hop_frames=64).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["ok"] for r in by_id[2]] == [False]
    for mid, wave in waves.items():
        if mid == 2:
            continue
        got = sorted(by_id[mid], key=lambda r: r["window_idx"])
        assert all(r["ok"] and r["sample_rate"] == 8000
                   and r["n_channels"] == 2 for r in got)
        flat = wave.astype(np.float64).reshape(-1) / 32768.0
        wb, hb = 128 * 2, 64 * 2
        n_win = 1 + (len(flat) - wb) // hb
        assert len(got) == n_win
        for wi in (0, n_win // 2, n_win - 1):
            w = flat[wi * hb: wi * hb + wb]
            assert got[wi]["rms"] == pytest.approx(
                float(np.sqrt((w * w).mean())), rel=1e-12)
            assert got[wi]["peak"] == pytest.approx(
                float(np.abs(w).max()), rel=1e-12)


def test_sample_frames_mp4_spark(spark):
    """Real container parse through mapInPandas: per-video keyframe
    fan-out at true stco/stsz offsets; a corrupt payload quarantines
    as one ok=false row."""
    import pandas as pd

    from search_engine_spark.ops import mp4 as M

    rng = np.random.RandomState(67)
    vids = {}
    for i in range(4):
        vids[i] = [
            bytes(rng.randint(0, 256, 10 + j).astype(np.uint8))
            for j in range(5 + i)
        ]
    payloads = [M.build_mp4(s, sync_every=3) for s in vids.values()]
    payloads[1] = payloads[1][:30]
    pdf = pd.DataFrame(
        {
            "media_id": list(vids),
            "media_type": ["video/mp4"] * len(vids),
            "media": payloads,
            "width": [64] * len(vids),
            "height": [48] * len(vids),
            "n_bytes": [len(p) for p in payloads],
        }
    )
    media = spark.createDataFrame(pdf, schema=mm.MEDIA_SCHEMA)
    rows = mm.sample_frames_mp4(media).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["ok"] for r in by_id[1]] == [False]
    for mid, samples in vids.items():
        if mid == 1:
            continue
        got = sorted(by_id[mid], key=lambda r: r["frame_idx"])
        assert [bytes(r["frame"]) for r in got] == samples
        assert [r["is_sync"] for r in got] == [
            i % 3 == 0 for i in range(len(samples))
        ]
    kf = mm.sample_frames_mp4(media, keyframes_only=True).collect()
    kf0 = sorted((r for r in kf if r["media_id"] == 0),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in kf0] == [0, 3]
    assert [bytes(r["frame"]) for r in kf0] == [vids[0][0], vids[0][3]]


# --- review-pass regressions (round 5) ---------------------------------------

def test_gif_lzw_eoi_width_regression():
    """The LZW flush code grows the decoder's table (and may bump its
    width) BEFORE EOI is read; the encoder must mirror that or EOI
    goes out one bit short.  The 1x11 stream below used to land the
    decoder table exactly on a power of two at the final data code
    and fail to decode; plus a seeded fuzz over small palettized
    images."""
    from search_engine_spark.ops import gif as G

    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]],
                   np.uint8)
    img = pal[np.array([[0, 0, 1, 0, 2, 0, 3, 1, 1, 2, 1]], np.uint8)]
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)
    rng = np.random.RandomState(99)
    for _ in range(400):
        n = rng.randint(2, 9)
        h, w = rng.randint(1, 6), rng.randint(1, 30)
        p = np.unique(rng.randint(0, 256, (n * 2, 3), dtype=np.uint8),
                      axis=0)[:n]
        im = p[rng.randint(0, len(p), (h, w))]
        assert np.array_equal(G.decode_gif(G.encode_gif(im)), im)


def test_mp4_corrupt_structures_raise_value_error():
    """Undersized box bodies and absurd count fields must surface as
    quarantinable ValueErrors, never struct.error/IndexError/OOM."""
    import struct

    from search_engine_spark.ops import mp4 as M

    # mvhd body shorter than the v0 layout
    short_mvhd = (M._box(b"ftyp", b"isom" + b"\x00" * 8)
                  + M._box(b"moov", M._fullbox(b"mvhd", 0, 0, b"\x00" * 4)))
    with pytest.raises(ValueError):
        M.parse_mp4(short_mvhd)
    # stsz fixed-size with a 50M count in a tiny file
    stbl = M._box(b"stbl", M._fullbox(
        b"stsz", 0, 0, struct.pack(">II", 1, 50_000_000)))
    bomb = (M._box(b"ftyp", b"isom" + b"\x00" * 8)
            + M._box(b"moov", M._fullbox(b"mvhd", 0, 0, b"\x00" * 96)
                     + M._box(b"trak", M._box(
                         b"mdia", M._box(b"minf", stbl)))))
    with pytest.raises(ValueError):
        M.parse_mp4(bomb)
    # stts claiming more samples than the file has bytes
    stbl2 = M._box(b"stbl", M._fullbox(
        b"stts", 0, 0, struct.pack(">III", 1, 50_000_000, 1)))
    bomb2 = bomb.replace(stbl, stbl2)
    with pytest.raises(ValueError):
        M.parse_mp4(bomb2)


def test_mp4_every_n_composes_with_keyframes():
    """every_n strides the SELECTED sequence: with keyframes_only it
    means every n-th keyframe, independent of sync alignment."""
    from search_engine_spark.ops import mp4 as M

    samples = [bytes([i]) * 4 for i in range(20)]
    buf = M.build_mp4(samples, sync_every=3)  # keyframes 0,3,6,...,18
    t = M.parse_mp4(buf)["tracks"][0]
    got = M.extract_samples(buf, t, every_n=2, keyframes_only=True)
    assert [i for i, _, _ in got] == [0, 6, 12, 18]  # every 2nd keyframe
    # n smaller than samples_per_chunk writes a spec-consistent stsc
    b2 = M.build_mp4(samples[:2], samples_per_chunk=3)
    t2 = M.parse_mp4(b2)["tracks"][0]
    assert t2["stsc_runs"] == [(1, 2, 1)]
    assert [p for _, _, p in M.extract_samples(b2, t2)] == samples[:2]


def test_webp_oversize_and_wav_bits_guards():
    from search_engine_spark.ops import wav as WV
    from search_engine_spark.ops import webp as W

    with pytest.raises(ValueError, match="16384"):
        W.encode_webp(np.zeros((1, 16385, 3), np.uint8))
    with pytest.raises(ValueError, match="bits"):
        WV.encode_wav(np.zeros(8, np.int16), bits=8)
    # explicit matching bits is fine
    WV.encode_wav(np.zeros(8, np.int16), bits=16)
