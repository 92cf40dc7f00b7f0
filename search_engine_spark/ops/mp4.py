"""Minimal MP4 (ISO-BMFF) container parser + builder twin, pure
Python.

Makes the video half of the multimodal story real:
``sample_frames`` (ops/multimodal.py) documents that "with a real
container parser the slicing becomes keyframe offsets" —
``sample_frames_mp4`` now does exactly that through this parser.
Implemented from the public ISO/IEC 14496-12 box structure:

- box walk (u32be size + 4cc, container boxes recursed, 64-bit
  ``size == 1`` large boxes and ``size == 0`` to-end boxes handled)
- ``ftyp`` brand, ``mvhd`` movie timescale/duration, per-track
  ``tkhd`` (id, 16.16 fixed width/height), ``mdhd`` (media
  timescale/duration), ``hdlr`` (vide/soun)
- the sample tables that locate frames inside ``mdat``: ``stsz``
  (sizes), ``stco``/``co64`` (chunk offsets), ``stsc``
  (samples-per-chunk runs), ``stss`` (sync/keyframe numbers),
  ``stts`` (decode deltas)
- ``extract_samples``: the standard stsc run expansion mapping every
  sample to its absolute (offset, size), with ``keyframes_only``
  selecting the ``stss`` set

Codec payloads stay OPAQUE bytes — entropy-decoding H.264/H.265/AV1
is explicitly out of scope (that is what the pillow/pyav seam is
for); what this parser makes real is the container math a 100 TB
video pipeline runs BEFORE any codec: find the frames, slice the
frames, keep per-video locality.

The builder twin (``build_mp4``) writes the same subset (ftyp + mdat
+ moov with one video track and real stts/stsc/stsz/stco/stss
tables), so tests pin the parser's offset arithmetic BIT-EXACT
against known sample payloads.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"dinf", b"mvex", b"udta"}


def parse_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """-> list of (type, header_end_offset, body_size, children) with
    children recursed for container boxes (None for leaves)."""
    if end is None:
        end = len(buf)
    out = []
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("MP4 box header truncated")
        size = struct.unpack(">I", buf[pos:pos + 4])[0]
        typ = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4 large box header truncated")
            size = struct.unpack(">Q", buf[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {typ!r} overruns container")
        body_start = pos + hdr
        body_size = size - hdr
        children = None
        if typ in _CONTAINERS:
            children = parse_boxes(buf, body_start, pos + size)
        out.append((typ, body_start, body_size, children))
        pos += size
    return out


def _find(boxes, typ: bytes):
    for b in boxes or ():
        if b[0] == typ:
            return b
    return None


def _full(buf: bytes, off: int):
    version = buf[off]
    return version, off + 4


def parse_mp4(buf: bytes) -> dict:
    """-> {brand, timescale, duration, tracks: [{track_id, width,
    height, handler, media_timescale, media_duration, sample_sizes,
    chunk_offsets, stsc_runs, sync_samples, sample_deltas}]}.
    Corrupt/truncated payloads raise ValueError (quarantinable)."""
    try:
        return _parse_mp4(bytes(buf))
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt MP4 structure: {e}") from e


def _parse_mp4(buf: bytes) -> dict:
    boxes = parse_boxes(buf)
    ftyp = _find(boxes, b"ftyp")
    if ftyp is None:
        raise ValueError("MP4 without ftyp")
    brand = buf[ftyp[1]:ftyp[1] + 4].decode("latin-1")
    moov = _find(boxes, b"moov")
    if moov is None:
        raise ValueError("MP4 without moov (streaming-fragmented "
                         "files are out of scope)")
    out = {"brand": brand, "timescale": 0, "duration": 0, "tracks": []}
    mvhd = _find(moov[3], b"mvhd")
    if mvhd is not None:
        version, p = _full(buf, mvhd[1])
        if version == 0:
            out["timescale"], out["duration"] = struct.unpack(
                ">II", buf[p + 8:p + 16])
        else:  # version 1: 64-bit times
            out["timescale"] = struct.unpack(">I", buf[p + 16:p + 20])[0]
            out["duration"] = struct.unpack(">Q", buf[p + 20:p + 28])[0]
    for trak in (b for b in moov[3] if b[0] == b"trak"):
        t: dict = {"track_id": 0, "width": 0.0, "height": 0.0,
                   "handler": "", "media_timescale": 0,
                   "media_duration": 0, "sample_sizes": [],
                   "chunk_offsets": [], "stsc_runs": [],
                   "sync_samples": None, "sample_deltas": []}
        tkhd = _find(trak[3], b"tkhd")
        if tkhd is not None:
            version, p = _full(buf, tkhd[1])
            if version == 0:
                t["track_id"] = struct.unpack(">I", buf[p + 8:p + 12])[0]
                geo = p + 20 + 8 + 8 + 36  # duration..matrix (v0)
            else:
                t["track_id"] = struct.unpack(">I", buf[p + 16:p + 20])[0]
                geo = p + 32 + 8 + 8 + 36
            w16, h16 = struct.unpack(">II", buf[geo:geo + 8])
            t["width"], t["height"] = w16 / 65536.0, h16 / 65536.0
        mdia = _find(trak[3], b"mdia")
        if mdia is None:
            out["tracks"].append(t)
            continue
        mdhd = _find(mdia[3], b"mdhd")
        if mdhd is not None:
            version, p = _full(buf, mdhd[1])
            if version == 0:
                t["media_timescale"], t["media_duration"] = struct.unpack(
                    ">II", buf[p + 8:p + 16])
            else:
                t["media_timescale"] = struct.unpack(
                    ">I", buf[p + 16:p + 20])[0]
                t["media_duration"] = struct.unpack(
                    ">Q", buf[p + 20:p + 28])[0]
        hdlr = _find(mdia[3], b"hdlr")
        if hdlr is not None:
            _, p = _full(buf, hdlr[1])
            t["handler"] = buf[p + 4:p + 8].decode("latin-1")
        minf = _find(mdia[3], b"minf")
        stbl = _find(minf[3], b"stbl") if minf else None
        if stbl is not None:
            stsz = _find(stbl[3], b"stsz")
            if stsz is not None:
                _, p = _full(buf, stsz[1])
                fixed, count = struct.unpack(">II", buf[p:p + 8])
                if count > len(buf):
                    # a 4-byte count field cannot describe more
                    # samples than the file has bytes — reject
                    # instead of allocating gigabytes from a tiny
                    # crafted payload
                    raise ValueError("stsz sample count exceeds file size")
                if fixed:
                    t["sample_sizes"] = [fixed] * count
                else:
                    t["sample_sizes"] = list(np.frombuffer(
                        buf[p + 8:p + 8 + 4 * count], dtype=">u4"
                    ).astype(np.int64))
            stco = _find(stbl[3], b"stco")
            co64 = _find(stbl[3], b"co64")
            if stco is not None:
                _, p = _full(buf, stco[1])
                count = struct.unpack(">I", buf[p:p + 4])[0]
                t["chunk_offsets"] = list(np.frombuffer(
                    buf[p + 4:p + 4 + 4 * count], dtype=">u4"
                ).astype(np.int64))
            elif co64 is not None:
                _, p = _full(buf, co64[1])
                count = struct.unpack(">I", buf[p:p + 4])[0]
                t["chunk_offsets"] = list(np.frombuffer(
                    buf[p + 4:p + 4 + 8 * count], dtype=">u8"
                ).astype(np.int64))
            stsc = _find(stbl[3], b"stsc")
            if stsc is not None:
                _, p = _full(buf, stsc[1])
                count = struct.unpack(">I", buf[p:p + 4])[0]
                vals = np.frombuffer(
                    buf[p + 4:p + 4 + 12 * count], dtype=">u4"
                ).reshape(count, 3)
                t["stsc_runs"] = [tuple(int(x) for x in row)
                                  for row in vals]
            stss = _find(stbl[3], b"stss")
            if stss is not None:
                _, p = _full(buf, stss[1])
                count = struct.unpack(">I", buf[p:p + 4])[0]
                t["sync_samples"] = list(np.frombuffer(
                    buf[p + 4:p + 4 + 4 * count], dtype=">u4"
                ).astype(np.int64))
            stts = _find(stbl[3], b"stts")
            if stts is not None:
                _, p = _full(buf, stts[1])
                count = struct.unpack(">I", buf[p:p + 4])[0]
                vals = np.frombuffer(
                    buf[p + 4:p + 4 + 8 * count], dtype=">u4"
                ).reshape(count, 2)
                if int(vals[:, 0].sum()) > len(buf):
                    raise ValueError("stts sample count exceeds file size")
                deltas = []
                for n, d in vals:
                    deltas.extend([int(d)] * int(n))
                t["sample_deltas"] = deltas
        out["tracks"].append(t)
    return out


def sample_locations(track: dict):
    """Expand stsc/stco/stsz to one absolute (offset, size) per
    sample, in sample order — the standard chunk-run expansion."""
    sizes = track["sample_sizes"]
    offsets = track["chunk_offsets"]
    runs = track["stsc_runs"]
    if not sizes or not offsets or not runs:
        raise ValueError("track missing sample tables")
    per_chunk = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(offsets)
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != len(offsets):
        raise ValueError("stsc runs disagree with stco chunk count")
    locs = []
    si = 0
    for ci, base in enumerate(offsets):
        off = base
        for _ in range(per_chunk[ci]):
            if si >= len(sizes):
                break
            locs.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError("sample count disagrees with chunk layout")
    return locs


def extract_samples(buf: bytes, track: dict, *, every_n: int = 1,
                    keyframes_only: bool = False):
    """-> list of (sample_idx_0based, is_sync, payload bytes).
    ``every_n`` strides over the SELECTED sequence, so with
    ``keyframes_only`` it means "every n-th keyframe", not
    keyframes whose absolute index happens to divide by n."""
    buf = bytes(buf)
    locs = sample_locations(track)
    sync = track["sync_samples"]
    sync_set = set(sync) if sync is not None else None
    out = []
    selected = 0
    for i, (off, size) in enumerate(locs):
        is_sync = sync_set is None or (i + 1) in sync_set
        if keyframes_only and not is_sync:
            continue
        if selected % every_n == 0:
            if off + size > len(buf):
                raise ValueError("sample overruns file")
            out.append((i, is_sync, buf[off:off + size]))
        selected += 1
    return out


# ---------------------------------------------------------------------------
# builder twin
# ---------------------------------------------------------------------------

def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _fullbox(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + body)


def build_mp4(
    samples,
    *,
    width: int = 64,
    height: int = 48,
    timescale: int = 600,
    sample_delta: int = 20,
    samples_per_chunk: int = 3,
    sync_every: int = 4,
) -> bytes:
    """Test twin: one video track whose samples are the given opaque
    byte payloads, chunked ``samples_per_chunk`` at a time with real
    stts/stsc/stsz/stco/stss tables; every ``sync_every``-th sample
    (1-based sample 1, 1+sync_every, ...) is a keyframe."""
    samples = [bytes(s) for s in samples]
    n = len(samples)
    if n == 0:
        raise ValueError("build_mp4 needs at least one sample")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(samples)
    mdat_off = len(ftyp) + 8  # absolute offset of the first sample
    # chunk layout
    chunk_offsets = []
    pos = mdat_off
    for ci in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(len(s) for s in samples[ci:ci + samples_per_chunk])
    duration = n * sample_delta
    sync = list(range(1, n + 1, sync_every))

    mvhd = _fullbox(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _fullbox(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0))  # 'und' language
    hdlr = _fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                    + b"twin\x00")
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1)
                    + _box(b"raw ", b"\x00" * 8))
    stts = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, n,
                                               sample_delta))
    stsc_runs = [(1, min(n, samples_per_chunk), 1)]
    tail = n % samples_per_chunk
    if tail and n > samples_per_chunk:
        stsc_runs.append((len(chunk_offsets), tail, 1))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                    + b"".join(struct.pack(">III", *r)
                               for r in stsc_runs))
    stsz = _fullbox(b"stsz", 0, 0, struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(s))
                               for s in samples))
    stco = _fullbox(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">I", o)
                               for o in chunk_offsets))
    stss = _fullbox(b"stss", 0, 0, struct.pack(">I", len(sync))
                    + b"".join(struct.pack(">I", s) for s in sync))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    vmhd = _fullbox(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _fullbox(b"dref", 0, 0, struct.pack(">I", 1)
                    + _fullbox(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov
