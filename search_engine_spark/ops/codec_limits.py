"""Shared decode-bomb guard for the pure-numpy codecs.

A corrupt or adversarial payload can claim enormous dimensions in a
few header bytes (JPEG SOF and GIF screen descriptors are 16-bit per
axis -> 4G pixels; PNG/BMP are 32-bit) and make the decoder allocate
gigabytes before any pixel data is even read.  In a 100 TB media
pipeline that is a task-killing OOM, not a quarantinable row.  Every
image decoder therefore checks its parsed dimensions against one
process-wide pixel budget BEFORE allocating, and raises the ordinary
quarantine ValueError instead.

``MAX_PIXELS`` defaults to 64M pixels (8192 x 8192 RGB ~= 192 MB of
uint8 output, comfortably inside an executor's per-task headroom);
pipelines that genuinely decode larger imagery raise it explicitly:

    from search_engine_spark.ops import codec_limits
    codec_limits.MAX_PIXELS = 1 << 30
"""

from __future__ import annotations

MAX_PIXELS = 64 * 1024 * 1024


def check_pixels(w: int, h: int, codec: str) -> None:
    """Raise the quarantine ValueError if a (w, h) claim exceeds the
    decode budget (or is non-positive, another crafted-header shape)."""
    if w <= 0 or h <= 0:
        raise ValueError(f"{codec}: bad dimensions {w}x{h}")
    if w * h > MAX_PIXELS:
        raise ValueError(
            f"{codec}: {w}x{h} exceeds the decoder pixel budget "
            f"({MAX_PIXELS} px) — raise ops.codec_limits.MAX_PIXELS "
            "to decode larger imagery"
        )
