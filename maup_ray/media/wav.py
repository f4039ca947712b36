"""From-scratch RIFF/WAVE codec (PCM 16-bit) — stdlib + numpy only.

The container is the audio sibling of media/avi.py's RIFF handling:
a `RIFF....WAVE` header followed by chunks; `fmt ` (PCM format tag 1)
describes the stream, `data` carries little-endian interleaved int16
samples. The parser walks chunks generically (unknown chunks are
skipped, odd-sized chunks consume their pad byte) so WAVs written by
other tools — which often carry `LIST`/`fact`/`cue ` chunks — decode
too, not just our own output.

Encoding is byte-deterministic: same samples + rate → same bytes, so
content-hash dedup over encoded payloads is stable.

ref: reference has no media layer; this extends the repo's
image/video multimodal family (SURVEY.md beyond-§2) to audio.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM 16-bit WAV bytes from ``samples`` — shape (n,) mono or
    (n, ch) interleaved-on-write. Values must already be int16."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()  # row-major = interleaved
    block_align = ch * 2
    byte_rate = rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples of shape (n, ch), sample rate).

    Accepts any chunk layout; requires PCM (format tag 1) 16-bit."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        payload = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size % 2)  # skip pad byte of odd chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, _brate, _align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit supported (tag={tag}, bits={bits})"
        )
    n = len(data) // (2 * ch)
    s = np.frombuffer(data[: n * 2 * ch], dtype="<i2").reshape(n, ch)
    return s.astype(np.int16, copy=False), rate
