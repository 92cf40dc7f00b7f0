"""Cross-codec robustness: decode bombs and mutation fuzz.

At 100 TB some fraction of every media column is corrupt or
adversarial; the pipeline contract is that a bad payload becomes a
quarantined row, never a task-killing OOM, a hang, or an exception
class outside the quarantine tuple ``decode_features`` catches
(multimodal.py): NotImplementedError / ValueError / IndexError /
zlib.error / struct.error.

Two properties pinned here:

1. **Decode-bomb caps** (`ops/codec_limits.py`): a few crafted header
   bytes claiming huge dimensions must raise ValueError BEFORE any
   proportional allocation — including the PNG zlib inflation bomb,
   where the header is honest but the compressed stream isn't.
2. **Mutation fuzz**: seeded byte flips and truncations over valid
   payloads from every encoder twin either decode to an ndarray or
   raise inside the quarantine tuple.  (Runtime is bounded by
   construction: every decoder's loops are bounded by declared pixel
   counts, which are themselves bounded by the pixel budget.)
"""

import struct
import zlib

import numpy as np
import pytest

from search_engine_spark.ops import codec_limits
from search_engine_spark.ops import multimodal as mm

QUARANTINE = (NotImplementedError, ValueError, IndexError,
              zlib.error, struct.error)


def _patch_u16be(buf: bytes, off: int, val: int) -> bytes:
    return buf[:off] + val.to_bytes(2, "big") + buf[off + 2:]


def test_decode_bomb_headers_raise_before_allocating():
    from search_engine_spark.ops import gif as G
    from search_engine_spark.ops import jpeg as J
    from search_engine_spark.ops import webp as W

    img = np.full((8, 8), 65, np.uint8)

    # JPEG: patch SOF0 dims to 60000 x 60000 (3.6G pixels)
    enc = J.encode_jpeg(img)
    sof = enc.index(b"\xff\xc0")
    bomb = _patch_u16be(_patch_u16be(enc, sof + 5, 60000), sof + 7, 60000)
    with pytest.raises(ValueError, match="pixel budget"):
        J.decode_jpeg(bomb)

    # GIF: patch the logical screen descriptor to 65000 x 65000
    enc = G.encode_gif(np.stack([img] * 3, -1))
    bomb = enc[:6] + struct.pack("<HH", 65000, 65000) + enc[10:]
    with pytest.raises(ValueError, match="pixel budget"):
        G.decode_gif(bomb)

    # VP8L: 5 header bytes claiming 16384 x 16384 (268M pixels)
    bw = W._BitWriter()
    bw.bits(16383, 14)
    bw.bits(16383, 14)
    bw.bits(0, 4)
    payload = b"\x2f" + bw.done()
    bomb = (b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(ValueError, match="pixel budget"):
        W.decode_webp(bomb)

    # PNM: a 30-byte textual header claiming 100000 x 100000
    with pytest.raises(ValueError, match="pixel budget"):
        mm.decode_image(b"P5 100000 100000 255\n")

    # BMP: 32-bit dims field claiming 70000 x 70000
    enc = bytearray(b"B" + b"M" + bytes(16))
    enc[10:14] = (54).to_bytes(4, "little")
    enc = bytes(enc[:18]) + struct.pack("<ii", 70000, 70000) \
        + bytes(2) + struct.pack("<HI", 24, 0) + bytes(200)
    with pytest.raises(ValueError, match="pixel budget"):
        mm.decode_image(b"BM" + enc[2:])

    # PNG: IHDR claiming 50000 x 50000
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 0, 0, 0, 0)
    png = (mm.PNG_SIG
           + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + bytes(4)
           + struct.pack(">I", 4) + b"IDAT" + zlib.compress(b"x")[:4]
           + bytes(4)
           + struct.pack(">I", 0) + b"IEND" + bytes(4))
    with pytest.raises(ValueError, match="pixel budget"):
        mm.decode_image(png)


def test_gif_frame_count_bomb_is_capped():
    """A small GIF whose frame COUNT times its canvas exceeds the
    budget must fail before materializing frames x canvas of output
    (every composited frame is a full canvas copy)."""
    from search_engine_spark.ops import gif as G

    img = np.zeros((64, 64, 3), np.uint8)
    n = 8
    enc = G.encode_gif(frames=[(img, 0, 0, 0, None)] * n)
    assert G.decode_gif_frames(enc).shape[0] == n  # legit at default
    old = codec_limits.MAX_PIXELS
    try:
        codec_limits.MAX_PIXELS = 64 * 64 * 3  # budget: 3 frames
        with pytest.raises(ValueError, match="pixel budget"):
            G.decode_gif_frames(enc)
        assert G.decode_gif(enc) is not None  # first frame still fine
    finally:
        codec_limits.MAX_PIXELS = old


def test_png_zlib_inflation_bomb_is_capped():
    """An honest 4x4 IHDR whose IDAT inflates to 10 MB must fail with
    the scanline-mismatch ValueError without materializing the
    inflated stream (the decompressobj cap stops at expected+1)."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb_idat = zlib.compress(bytes(10 * 1024 * 1024))  # ~10 KB on wire
    png = (mm.PNG_SIG
           + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + bytes(4)
           + struct.pack(">I", len(bomb_idat)) + b"IDAT" + bomb_idat
           + bytes(4)
           + struct.pack(">I", 0) + b"IEND" + bytes(4))
    with pytest.raises(ValueError, match="scanline"):
        mm.decode_image(png)


def test_pixel_budget_is_configurable():
    from search_engine_spark.ops import gif as G

    img = np.full((16, 16, 3), 7, np.uint8)
    enc = G.encode_gif(img)
    old = codec_limits.MAX_PIXELS
    try:
        codec_limits.MAX_PIXELS = 100  # below 16*16
        with pytest.raises(ValueError, match="pixel budget"):
            G.decode_gif(enc)
    finally:
        codec_limits.MAX_PIXELS = old
    assert np.array_equal(G.decode_gif(enc), img)


def _valid_payloads():
    """One small valid payload per image codec, via the twins."""
    from search_engine_spark.ops import gif as G
    from search_engine_spark.ops import jpeg as J
    from search_engine_spark.ops import webp as W

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (13, 11, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (9, 14)).astype(np.uint8)
    pal = np.repeat(np.repeat(
        rng.randint(0, 4, (4, 4)) * 80, 3, 0), 3, 1).astype(np.uint8)
    return {
        "ppm": mm.encode_ppm(rgb),
        "png": mm.encode_png(rgb, filter_type=4),
        "jpeg": J.encode_jpeg(rgb, quant=2),
        "jpeg_prog": J.encode_jpeg_progressive(gray, quant=2),
        "gif": G.encode_gif(np.stack([pal] * 3, -1)
                            if pal.ndim == 2 else pal),
        "webp": W.encode_webp(rgb, subtract_green=True, cache_bits=3),
    }


def test_mutation_fuzz_image_codecs_never_escape_quarantine():
    rng = np.random.RandomState(17)
    for name, payload in _valid_payloads().items():
        # the unmutated payload must decode
        assert mm.decode_image(payload) is not None, name
        n = len(payload)
        cases = []
        # truncations at assorted depths (headers, mid-entropy, tail)
        for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
            cases.append(payload[: int(n * frac)])
        # seeded single/multi byte corruptions
        for _ in range(40):
            b = bytearray(payload)
            for _ in range(int(rng.randint(1, 4))):
                b[int(rng.randint(0, n))] = int(rng.randint(0, 256))
            cases.append(bytes(b))
        # bit flips
        for _ in range(20):
            b = bytearray(payload)
            i = int(rng.randint(0, n))
            b[i] ^= 1 << int(rng.randint(0, 8))
            cases.append(bytes(b))
        for i, c in enumerate(cases):
            try:
                out = mm.decode_image(c)
                assert isinstance(out, np.ndarray), (name, i)
            except QUARANTINE:
                pass  # the contract: quarantinable, nothing else


def test_mutation_fuzz_av_containers_never_escape_quarantine():
    from search_engine_spark.ops import mp4 as M
    from search_engine_spark.ops import wav as WV

    rng = np.random.RandomState(23)
    wav = WV.encode_wav(
        (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16))
    frames = [bytes([i] * (20 + i)) for i in range(12)]
    mp4 = M.build_mp4(frames)

    def drive_wav(buf):
        WV.decode_wav_normalized(buf)

    def drive_mp4(buf):
        meta = M.parse_mp4(buf)
        for tr in meta["tracks"]:
            M.extract_samples(buf, tr, keyframes_only=False)

    for payload, drive in ((wav, drive_wav), (mp4, drive_mp4)):
        n = len(payload)
        cases = [payload[: int(n * f)]
                 for f in (0.2, 0.5, 0.8, 0.97)]
        for _ in range(40):
            b = bytearray(payload)
            b[int(rng.randint(0, n))] = int(rng.randint(0, 256))
            cases.append(bytes(b))
        for i, c in enumerate(cases):
            try:
                drive(c)
            except QUARANTINE:
                pass
