"""Pure-stdlib RIFF/WAVE PCM codec (graft extra; NOT in the reference).

Closes the audio modality the same way png.py/jpeg.py closed images: a
REAL wire format, zero external dependencies, so the multimodal audio
plumbing (multimodal.audio_features) decodes genuine bytes in executors
instead of a sandbox stand-in.

Scope: canonical RIFF/WAVE with 16-bit integer PCM (format tag 1), any
channel count and sample rate.  The chunk walk is STRUCTURAL — chunks
are skipped by their declared size (plus the RIFF odd-size pad byte),
never found by byte-scanning, because chunk payloads (LIST/INFO text,
cue sheets) are arbitrary bytes and may contain the ASCII string
"data".  Float PCM (tag 3) and compressed tags raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, channels) — as a
    canonical RIFF/WAVE file (fmt chunk then data chunk)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("encode_wav: samples must be (n,) or (n, channels)")
    n, ch = s.shape
    if ch < 1 or ch > 64:
        raise ValueError(f"encode_wav: unreasonable channel count {ch}")
    data = s.astype("<i2").tobytes()  # interleaved little-endian frames
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
    )  # PCM, channels, rate, byte-rate, block align, bits/sample
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:  # RIFF: odd-sized chunks carry one pad byte
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM16 file to (rate, samples) with samples
    shaped (n, channels), int16.  Walks chunks structurally; unknown
    chunks (LIST, cue, fact, ...) are skipped by size, and the mandatory
    odd-size pad byte is honored."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE file: missing RIFF/WAVE header")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_end = pos + 8 + csize
        if body_end > end:
            raise ValueError(f"WAVE: chunk {cid!r} overruns the file")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("WAVE: fmt chunk too short")
            tag, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
            if tag != 1:
                raise ValueError(
                    f"WAVE: only integer PCM (tag 1) supported, got {tag}"
                )
            if bits != 16:
                raise ValueError(f"WAVE: only 16-bit PCM supported, got {bits}")
            if ch < 1:
                raise ValueError("WAVE: zero channels")
            fmt = (ch, rate)
        elif cid == b"data":
            raw = data[pos + 8 : body_end]
        pos = body_end + (csize % 2)  # pad byte after odd-sized chunks
    if fmt is None or raw is None:
        raise ValueError("WAVE: missing fmt or data chunk")
    ch, rate = fmt
    frame = ch * 2
    usable = len(raw) - (len(raw) % frame)
    samples = np.frombuffer(raw[:usable], dtype="<i2").reshape(-1, ch)
    return rate, samples.astype(np.int16)
