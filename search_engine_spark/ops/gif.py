"""GIF codec (GIF87a/GIF89a) in pure Python + numpy (no PIL/giflib).

Closes the GIF half of the remaining codec scope boundary (VERDICT r4
missing-item 3 / COVERAGE multimodal row): the reference decodes no
images at all, but the LLM-pipeline brief asks for multimodal columns
and web corpora carry GIFs.  Implemented from the public GIF89a
specification:

- header + logical screen descriptor, global AND local color tables
- variable-width LZW decompression (3..12-bit codes, CLEAR/EOI,
  table growth one step behind the encoder, deferred-clear safe,
  output bounded by the declared pixel count)
- 4-pass interlaced row order
- graphic control extension: transparency index + disposal methods
  0/1 (keep), 2 (restore to background), 3 (restore to previous)
- multi-frame compositing onto the logical screen (``decode_gif``
  returns the first composited frame as (H, W, 3) uint8 RGB;
  ``decode_gif_frames`` returns every composited frame (F, H, W, 3))
- comment / plain-text / application extensions skipped as opaque
  sub-blocks

and the matching encoder (``encode_gif``: exact-palette quantization,
LZW with mid-stream dictionary reset at 4096, optional interlace,
per-frame transparency + disposal, NETSCAPE loop block) so tests can
pin the decoder against payloads built from first principles — the
same twin strategy as ``encode_png``/``encode_jpeg``.  GIF is
LOSSLESS on palettized content, so single-frame roundtrips pin
BIT-EXACT (unlike the JPEG twin's bounded-error pin).

Out of scope, behind explicit errors: >256 distinct colors on encode
(color quantization is a modeling choice, not a codec feature), and
sort-flag/aspect-ratio metadata is ignored (display hints only).

The per-code LZW loop is Python and therefore the slow path; it
exists for correctness and plumbing tests.  In a production cluster
the dispatch seam in ``decode_image`` (ops/multimodal.py) swaps in
pillow without touching any Spark-side code.
"""

from __future__ import annotations

import struct

import numpy as np

# (row offset, row step) of the four GIF interlace passes
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))
_MAX_CODE_SIZE = 12  # LZW codes never exceed 12 bits (GIF89a App. F)


def _interlaced_row_order(height: int) -> np.ndarray:
    """Destination row index for each stored row of an interlaced image."""
    return np.concatenate([
        np.arange(off, height, step) for off, step in _INTERLACE_PASSES
    ])


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes over the
    concatenated sub-block bytes.  The decoder table grows one entry
    behind the encoder (hence the ``code == len(table)`` case) and the
    code width bumps when the table fills the current width; at 4096
    entries growth stops until a CLEAR arrives (deferred clear)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) != n_pixels:
                    raise ValueError(
                        f"LZW stream ended at {len(out)} of "
                        f"{n_pixels} pixels"
                    )
                return bytes(out)
            if prev is None:
                if code >= clear:
                    raise ValueError("first LZW code after clear not literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < (1 << _MAX_CODE_SIZE):
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                if len(table) < (1 << _MAX_CODE_SIZE):
                    table.append(entry)
            else:
                raise ValueError(f"LZW code {code} out of range")
            out += entry
            if len(out) > n_pixels:
                raise ValueError("LZW output exceeds declared image size")
            prev = entry
            if len(table) == (1 << code_size) and code_size < _MAX_CODE_SIZE:
                code_size += 1
    raise ValueError("LZW stream truncated (no end-of-information code)")


class _LzwEncoder:
    """Streaming GIF-LZW encoder (the exact mirror of ``_lzw_decode``:
    width bumps when ``next_code - 1`` fills the current width, which
    is the decoder's table length at the same point in the stream)."""

    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()
        self._emit(self.clear)

    def _reset(self) -> None:
        self.table = {bytes([i]): i for i in range(self.clear)}
        self.next_code = self.eoi + 1
        self.code_size = self.min + 1

    def _emit(self, code: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += self.code_size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def encode(self, indices: bytes) -> bytes:
        w = b""
        for k in indices:
            wk = w + bytes([k])
            if wk in self.table:
                w = wk
                continue
            self._emit(self.table[w])
            self.table[wk] = self.next_code
            self.next_code += 1
            if (self.next_code - 1 == (1 << self.code_size)
                    and self.code_size < _MAX_CODE_SIZE):
                self.code_size += 1
            if self.next_code == (1 << _MAX_CODE_SIZE):
                self._emit(self.clear)
                self._reset()
            w = bytes([k])
        if w:
            self._emit(self.table[w])
            # the decoder appends a table entry for this final code
            # (and may bump its width) BEFORE reading EOI — mirror
            # that bookkeeping or EOI goes out one bit short
            self.next_code += 1
            if (self.next_code - 1 == (1 << self.code_size)
                    and self.code_size < _MAX_CODE_SIZE):
                self.code_size += 1
        self._emit(self.eoi)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _sub_blocks(payload: bytes) -> bytes:
    """Split a byte stream into <=255-byte length-prefixed sub-blocks
    plus the 0x00 terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_color_table(buf: bytes, pos: int, size_field: int):
    n = 2 << size_field  # 2^(field+1) entries
    end = pos + 3 * n
    if end > len(buf):
        raise ValueError("color table truncated")
    table = np.frombuffer(buf[pos:end], dtype=np.uint8).reshape(n, 3)
    return table, end


def _skip_sub_blocks(buf: bytes, pos: int) -> int:
    while True:
        if pos >= len(buf):
            raise ValueError("sub-blocks truncated")
        n = buf[pos]
        pos += 1 + n
        if n == 0:
            return pos


def _collect_sub_blocks(buf: bytes, pos: int):
    parts = []
    while True:
        if pos >= len(buf):
            raise ValueError("image data sub-blocks truncated")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(buf[pos:pos + n])
        if len(parts[-1]) != n:
            raise ValueError("image data sub-blocks truncated")
        pos += n


def decode_gif_frames(buf: bytes, max_frames: int | None = None) \
        -> np.ndarray:
    """Decode every frame of a GIF (or the first ``max_frames``),
    composited onto the logical screen per the GIF89a disposal rules.
    Returns (F, H, W, 3) uint8 RGB.  The canvas starts as the
    background color (global color table at the background index;
    black without a global table); transparent pixels leave the
    underlying canvas untouched.  Corrupt/truncated payloads raise
    ValueError (quarantinable)."""
    try:
        return _decode_gif_frames(buf, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF structure: {e}") from e


def _decode_gif_frames(buf: bytes, max_frames: int | None = None) \
        -> np.ndarray:
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(buf) < 13:
        raise ValueError("GIF header truncated")
    width, height, packed, bg_index, _aspect = struct.unpack(
        "<HHBBB", buf[6:13])
    from .codec_limits import check_pixels
    check_pixels(width, height, "GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(buf, pos, packed & 0x07)
    if gct is not None and bg_index < len(gct):
        background = gct[bg_index]
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(background, (height, width, 3)).copy()

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(buf):
            raise ValueError("GIF stream truncated (no trailer)")
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("extension truncated")
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                n = buf[pos]
                if n != 4:
                    raise ValueError("bad graphic control block size")
                gc_packed = buf[pos + 1]
                t_index = buf[pos + 4]
                disposal = (gc_packed >> 2) & 0x07
                transparent = t_index if gc_packed & 0x01 else None
                pos = _skip_sub_blocks(buf, pos)
            else:  # comment / plain text / application: opaque
                pos = _skip_sub_blocks(buf, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", buf[pos:pos + 9])
        pos += 9
        if left + w > width or top + h > height:
            raise ValueError("frame exceeds logical screen")
        palette = gct
        if ipacked & 0x80:
            palette, pos = _read_color_table(buf, pos, ipacked & 0x07)
        if palette is None:
            raise ValueError("frame has neither local nor global palette")
        min_code_size = buf[pos]
        pos += 1
        data, pos = _collect_sub_blocks(buf, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, data, w * h), dtype=np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:  # interlaced: stored rows -> display rows
            dest = np.empty_like(idx)
            dest[_interlaced_row_order(h)] = idx
            idx = dest
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("pixel index outside palette")

        # every composited frame is a full canvas copy, so the frame
        # COUNT is part of the decode-bomb surface too: a ~2 KB GIF
        # with hundreds of 1-px frames on a large canvas must not get
        # to materialize frames x canvas worth of output
        from .codec_limits import MAX_PIXELS
        if (len(frames) + 1) * width * height > MAX_PIXELS:
            raise ValueError(
                "GIF: total animation pixels exceed the decoder "
                "pixel budget"
            )
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + h, left:left + w]
        if transparent is None:
            region[:] = palette[idx]
        else:
            opaque = idx != transparent
            region[opaque] = palette[idx[opaque]]
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return np.stack(frames)
        if disposal == 2:
            canvas[top:top + h, left:left + w] = background
        elif disposal == 3:
            canvas = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)


def decode_gif(buf: bytes) -> np.ndarray:
    """First composited frame of a GIF as (H, W, 3) uint8 RGB — the
    still-image view ``decode_image`` dispatches to.  Stops decoding
    after frame 1 (an animation's later frames cost LZW work and
    canvas copies the still view never reads)."""
    return decode_gif_frames(buf, max_frames=1)[0]


# ---------------------------------------------------------------------------
# encode (the test twin)
# ---------------------------------------------------------------------------

def _as_rgb(img: np.ndarray) -> np.ndarray:
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (H, W) gray or (H, W, 3) RGB")
    return a


def _build_palette(colors: np.ndarray, reserve_transparent: bool):
    """Exact palette from the distinct colors (sorted for determinism),
    padded to the next power of two >= 2.  When a transparent slot is
    needed it takes the first padding entry (or forces a size bump)."""
    uniq = np.unique(colors.reshape(-1, 3), axis=0)
    n_needed = len(uniq) + (1 if reserve_transparent else 0)
    if n_needed > 256:
        raise ValueError(
            f"{len(uniq)} distinct colors: exact-palette GIF encode caps at "
            "256 (color quantization is out of scope)"
        )
    size = 2
    while size < n_needed:
        size *= 2
    palette = np.zeros((size, 3), dtype=np.uint8)
    palette[:len(uniq)] = uniq
    t_index = len(uniq) if reserve_transparent else None
    return palette, t_index, len(uniq)


def _indices_for(img: np.ndarray, palette: np.ndarray,
                 n_colors: int) -> np.ndarray:
    """Map each pixel to its palette index via a searchsorted on the
    packed 24-bit color key.  Only the first ``n_colors`` palette rows
    are real (sorted-unique from np.unique); the padding rows behind
    them are zeros and must not enter the search."""
    key = (palette[:, 0].astype(np.int64) << 16) \
        | (palette[:, 1].astype(np.int64) << 8) | palette[:, 2]
    px = (img[:, :, 0].astype(np.int64) << 16) \
        | (img[:, :, 1].astype(np.int64) << 8) | img[:, :, 2]
    return np.searchsorted(key[:n_colors], px).astype(np.uint8)


def encode_gif(
    img: np.ndarray | None = None,
    *,
    frames: list | None = None,
    interlace: bool = False,
    loop: int | None = None,
    version: bytes = b"GIF89a",
) -> bytes:
    """Encode a static GIF (``img``) or an animation (``frames``: a
    list of ``(img, left, top, disposal, transparent_color)`` tuples
    where ``transparent_color`` is an RGB triple whose pixels are
    written as the transparent index, or None).  One global
    exact-color palette covers every frame; >256 distinct colors
    raises.  ``loop`` writes the NETSCAPE application extension."""
    if (img is None) == (frames is None):
        raise ValueError("pass exactly one of img= or frames=")
    if frames is None:
        frames = [(img, 0, 0, 0, None)]
    rgb_frames = [
        (_as_rgb(f), int(left), int(top), int(disp), tcol)
        for f, left, top, disp, tcol in frames
    ]
    height, width = rgb_frames[0][0].shape[:2]
    if rgb_frames[0][1] or rgb_frames[0][2]:
        raise ValueError("first frame must cover the logical screen at 0,0")
    need_transparent = any(t is not None for *_, t in rgb_frames)
    palette, t_index, n_colors = _build_palette(
        np.concatenate([f.reshape(-1, 3) for f, *_ in rgb_frames]),
        need_transparent,
    )
    size_field = int(np.log2(len(palette))) - 1

    out = bytearray()
    out += version
    out += struct.pack("<HHBBB", width, height, 0x80 | size_field, 0, 0)
    out += palette.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += _sub_blocks(struct.pack("<BH", 1, loop))
    for frame, left, top, disposal, tcol in rgb_frames:
        h, w = frame.shape[:2]
        if left + w > width or top + h > height:
            raise ValueError("frame exceeds logical screen")
        idx = _indices_for(frame, palette, n_colors)
        if tcol is not None:
            tcol = np.asarray(tcol, dtype=np.uint8)
            idx = np.where((frame == tcol).all(axis=2), t_index, idx)
            idx = idx.astype(np.uint8)
        gc_packed = (disposal & 0x07) << 2
        t_byte = 0
        if tcol is not None:
            gc_packed |= 0x01
            t_byte = t_index
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, gc_packed, 0,
                           t_byte, 0)
        ipacked = 0x40 if interlace else 0
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, ipacked)
        if interlace:
            idx = idx[_interlaced_row_order(h)]
        min_code_size = max(2, size_field + 1)
        out.append(min_code_size)
        out += _sub_blocks(_LzwEncoder(min_code_size).encode(idx.tobytes()))
    out.append(0x3B)
    return bytes(out)
