"""Deterministic image codec + perceptual hash (graft image path).

Real image libraries (PIL/libjpeg) are not available in this container, so
the corpus uses two clearly-fake-but-deterministic codecs with the same
*shape* as real ones — one lossless, one lossy — behind the same interface
a real decoder would use.  The Spark-side plumbing (binary column, typed
metadata, vectorized decode in mapInPandas, PSNR invariant) is real and
tested; swapping in libjpeg is a pure codec swap.

  fmt="raw" — lossless: header + native uint8 pixels.
  fmt="qnt" — lossy: 6-bit quantization (max abs error 2 → PSNR ≈ 46 dB,
              satisfying the ≥ 40 dB invariant from BASELINE.json).

Real-format decode is stubbed explicitly (decode_real) and gated behind an
import-try, as required for this sandbox.

pHash: classic 64-bit DCT hash — 32×32 resample → 2-D DCT-II (numpy matmul
with the orthonormal DCT matrix) → top-left 8×8 minus DC → median
threshold.  Deterministic, pure numpy.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

MAGIC_RAW = b"LRAW"
MAGIC_QNT = b"LQNT"


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w) uint8 grayscale → bytes per fmt ∈ {raw, qnt}."""
    h, w = pixels.shape
    header = struct.pack("<HH", w, h)
    if fmt == "raw":
        return MAGIC_RAW + header + pixels.tobytes()
    if fmt == "qnt":
        return MAGIC_QNT + header + (pixels >> 2).astype(np.uint8).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """bytes → (h, w) uint8 pixels; inverse of encode_image (lossy for qnt)."""
    magic, (w, h) = data[:4], struct.unpack("<HH", data[4:8])
    body = np.frombuffer(data[8:], dtype=np.uint8).reshape(h, w)
    if magic == MAGIC_RAW:
        return body.copy()
    if magic == MAGIC_QNT:
        return np.minimum(body.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
    raise ValueError(f"unknown magic {magic!r}")


def decode_real(data: bytes, fmt: str) -> np.ndarray:
    """Decode a real image format (png/jpeg/webp).  STUB: the image
    libraries are not installed in this environment; on a real cluster this
    dispatches to PIL/libvips inside the same mapInPandas plumbing."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"real codec for {fmt!r} requires an image library not present "
            "in this sandbox; use fmt in {'raw','qnt'} (codec.py docstring)"
        ) from exc
    raise NotImplementedError("real-codec path intentionally stubbed")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


@lru_cache(maxsize=4)
def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a grayscale image (DCT-median)."""
    img = pixels.astype(np.float64)
    # resample to 32×32 by block-mean (fallback: simple resize via repeat)
    target = 32
    h, w = img.shape
    ys = (np.arange(target) * h // target).clip(0, h - 1)
    xs = (np.arange(target) * w // target).clip(0, w - 1)
    small = img[np.ix_(ys, xs)]
    d = _dct_matrix(target)
    freq = d @ small @ d.T
    block = freq[:8, :8].flatten()
    vals = block[1:]  # drop DC
    med = np.median(vals)
    bits = vals > med
    out = 0
    for idx, bit in enumerate(bits):
        if bit:
            out |= 1 << idx
    return out - (1 << 63) if out >= (1 << 63) else out


def phash64_batch(pixel_list: list[np.ndarray]) -> np.ndarray:
    return np.array([phash64(p) for p in pixel_list], dtype=np.int64)
