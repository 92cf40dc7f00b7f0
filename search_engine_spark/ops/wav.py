"""WAV (RIFF/WAVE) PCM codec in pure Python + numpy.

Makes the audio half of the multimodal story real: ``audio_windows``
(ops/multimodal.py) documents that "a real pipeline swaps the byte
view for decoded PCM" — ``audio_windows_pcm`` (ops/multimodal.py)
now does exactly that through this decoder.  Implemented from the
public RIFF/WAVE format (the canonical fmt/data chunk layout):

- RIFF container walk (chunk padding honored, unknown chunks skipped)
- ``fmt `` parse: PCM (format 1) at 8-bit unsigned / 16-bit /
  24-bit / 32-bit signed little-endian, and IEEE float32 (format 3);
  WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through the SubFormat GUID
- ``data`` -> (n_frames, n_channels) arrays; samples normalized to
  float64 in [-1, 1) by ``decode_wav_normalized`` with the exact
  per-width scale the encoder twin inverts

Compressed codecs (ADPCM, MP3-in-WAV, a-law/mu-law) raise a
documented NotImplementedError; corrupt/truncated payloads raise
ValueError (quarantined row-wise by the Spark-side callers).

The encoder twin (``encode_wav``) writes the same subset so tests
pin the decoder BIT-EXACT on integer PCM (lossless container).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE
# first 2 bytes of the EXTENSIBLE SubFormat GUID carry the real format
_DTYPES = {
    (_PCM, 8): np.uint8,
    (_PCM, 16): np.dtype("<i2"),
    (_PCM, 32): np.dtype("<i4"),
    (_IEEE_FLOAT, 32): np.dtype("<f4"),
}


def _walk_chunks(buf: bytes):
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"WAV chunk {tag!r} truncated")
        yield tag, body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned


def decode_wav(payload: bytes):
    """-> (samples, sample_rate).  samples is (n_frames, n_channels)
    in the stream's native dtype (uint8 / int16 / int32 / float32;
    24-bit widens to int32 with the 24-bit value in the high bytes,
    i.e. ``value << 8`` — the encoder twin inverts exactly)."""
    fmt = None
    data = None
    for tag, body in _walk_chunks(bytes(payload)):
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
            if fmt is not None:
                break
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk too short")
    (audio_format, n_channels, sample_rate, _byte_rate, block_align,
     bits) = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format == _EXTENSIBLE:
        if len(fmt) < 26:
            raise ValueError("EXTENSIBLE fmt chunk too short")
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    if audio_format not in (_PCM, _IEEE_FLOAT):
        raise NotImplementedError(
            f"WAV format {audio_format}: compressed codecs (ADPCM/"
            "MP3/a-law/mu-law) need an external decoder"
        )
    if n_channels < 1:
        raise ValueError("WAV with zero channels")
    if audio_format == _PCM and bits == 24:
        if block_align != 3 * n_channels:
            raise ValueError("bad 24-bit block alignment")
        n = len(data) // 3
        if n % n_channels:
            raise ValueError("WAV data not frame-aligned")
        b = np.frombuffer(data[: n * 3], dtype=np.uint8).reshape(n, 3)
        vals = (
            b[:, 0].astype(np.int32) << 8
        ) | (b[:, 1].astype(np.int32) << 16) \
            | (b[:, 2].astype(np.int32) << 24)
        return vals.reshape(-1, n_channels), sample_rate
    dtype = _DTYPES.get((audio_format, bits))
    if dtype is None:
        raise NotImplementedError(
            f"WAV {bits}-bit format-{audio_format} samples not in "
            "this subset"
        )
    width = np.dtype(dtype).itemsize
    n = len(data) // width
    if n % n_channels:
        raise ValueError("WAV data not frame-aligned")
    arr = np.frombuffer(data[: n * width], dtype=dtype)
    return arr.reshape(-1, n_channels), sample_rate


_SCALE = {np.dtype(np.uint8): (128.0, -1.0), np.dtype("<i2"): (32768.0, 0.0),
          np.dtype("<i4"): (2147483648.0, 0.0)}


def decode_wav_normalized(payload: bytes):
    """-> (float64 samples in [-1, 1), sample_rate): uint8 maps via
    (x/128 - 1), signed ints via x / 2^(bits-1), float32 passes
    through."""
    samples, rate = decode_wav(payload)
    if samples.dtype == np.dtype("<f4"):
        return samples.astype(np.float64), rate
    scale, off = _SCALE[samples.dtype]
    return samples.astype(np.float64) / scale + off, rate


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               bits: int | None = None) -> bytes:
    """Encoder twin: (n,) or (n_frames, n_channels) uint8/int16/
    int32/float32 -> canonical RIFF/WAVE.  24-bit is requested with
    ``bits=24`` over int32 input whose low byte is zero (the
    ``value << 8`` convention ``decode_wav`` returns)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (n,) or (n_frames, n_channels)")
    n_channels = a.shape[1]
    if bits is not None and bits != 24 and bits != a.dtype.itemsize * 8:
        raise ValueError(
            f"bits={bits} conflicts with {a.dtype} samples: pass "
            "bits=24 over int32, or let the dtype set the width"
        )
    if bits == 24:
        if a.dtype != np.int32:
            raise ValueError("24-bit encode expects int32 (value << 8)")
        if np.any(a.astype(np.uint32) & 0xFF):
            raise ValueError("24-bit encode: low byte must be zero")
        u = a.astype(np.uint32).reshape(-1)
        data = np.stack([(u >> 8) & 0xFF, (u >> 16) & 0xFF,
                         (u >> 24) & 0xFF], axis=1).astype(np.uint8) \
            .tobytes()
        audio_format, width = _PCM, 3
    elif a.dtype == np.uint8:
        data, audio_format, width = a.tobytes(), _PCM, 1
    elif a.dtype == np.int16:
        data, audio_format, width = a.astype("<i2").tobytes(), _PCM, 2
    elif a.dtype == np.int32:
        data, audio_format, width = a.astype("<i4").tobytes(), _PCM, 4
    elif a.dtype == np.float32:
        data, audio_format, width = (a.astype("<f4").tobytes(),
                                     _IEEE_FLOAT, 4)
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    bits_out = bits if bits == 24 else width * 8
    block_align = width * n_channels
    fmt = struct.pack(
        "<HHIIHH", audio_format, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits_out,
    )
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
