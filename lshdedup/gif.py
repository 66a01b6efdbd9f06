"""Pure-stdlib GIF87a/89a codec (graft extra; NOT in the reference).

Grayscale-palette GIF encode + full LZW decode, zero external
dependencies — the animated sibling of png.py/jpeg.py/wav.py.  GIF is
lossless (palette indices round-trip bit-exactly), so decoded frames are
value-exact against their source, and an animated GIF is a real video
container for multimodal.sample_video_frames.

Scope and wire fidelity:
- LZW per the GIF89a specification: variable code width starting at
  min_code_size+1, CLEAR/END codes, dictionary growth with width
  increase when the next free slot reaches 2**width (no "early change"),
  table reset at 4096 codes.  The encoder builds a real compression
  dictionary (multi-symbol codes), not the literal-only "uncompressed
  GIF" trick, so the decoder's table path is exercised on every stream.
- The block walk is STRUCTURAL: extensions are skipped via their
  size-prefixed sub-block chains (payload bytes are arbitrary and may
  contain the image-separator 0x2C or trailer 0x3B — byte-scanning is
  wrong), image data via the same sub-block chain.
- Frames composite per disposal-method-1 semantics (draw over the
  previous canvas at the frame's x/y offset); partial frames supported.
- Luma conversion from palette entries is the exact integer ITU-R 601
  fold (r*299 + g*587 + b*114) // 1000 — deterministic for oracles.
- Refused loudly (ValueError), never misread: interlaced frames,
  missing color tables, truncated streams.
"""

from __future__ import annotations

import struct

import numpy as np


def _gray_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Real GIF-LZW compression (dictionary of (prefix_code, byte))."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()

    def reset():
        return {}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    data = indices.tolist()
    if not data:
        bw.write(end, width)
        return bw.finish()
    cur = data[0]
    for c in data[1:]:
        key = (cur, c)
        if key in table:
            cur = table[key]
            continue
        bw.write(cur, width)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            bw.write(clear, width)
            table, next_code, width = reset()
        cur = c
    bw.write(cur, width)
    bw.write(end, width)
    return bw.finish()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF-LZW decompression to exactly n_expected palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_expected, np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0

    base = [bytes([i]) for i in range(clear)]

    def reset():
        return base + [b"", b""], min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream ended without END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF: first LZW code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK special case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} beyond table")
        # the decoder's table lags the encoder's by exactly one entry (the
        # entry for the code just read is appended on the NEXT read), so
        # it must widen one slot early: at 2**width - 1, where the encoder
        # widens at 2**width — the classic GIF-LZW off-by-one
        if prev is not None and len(table) == (1 << width) - 1 and width < 12:
            width += 1
        if n_out + len(entry) > n_expected:
            raise ValueError("GIF: LZW produced more pixels than the frame")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
    if n_out != n_expected:
        raise ValueError(
            f"GIF: LZW produced {n_out} pixels, frame declares {n_expected}"
        )
    return out


def _sub_blocks(payload: bytes) -> bytes:
    """Package bytes as GIF size-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _walk_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Collect a sub-block chain starting at pos; return (payload, end)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("GIF: truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("GIF: truncated sub-block")
        out += data[pos : pos + size]
        pos += size


def encode_gif(
    frames: list[np.ndarray] | np.ndarray, delay_cs: int = 4
) -> bytes:
    """Encode grayscale uint8 frames — each (h, w), all same shape — as an
    animated GIF89a with a 256-entry grayscale global palette (pixel
    value == palette index == luma, so the encode is lossless)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 2:
        frames = [frames]
    fs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not fs or any(f.ndim != 2 for f in fs):
        raise ValueError("encode_gif: frames must be a list of (h, w) uint8")
    h, w = fs[0].shape
    if any(f.shape != (h, w) for f in fs):
        raise ValueError("encode_gif: all frames must share one shape")
    out = bytearray(b"GIF89a")
    # logical screen: global color table, 8 bits, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _gray_palette()
    for f in fs:
        # graphic control extension: disposal 1 (leave in place), delay
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # descriptor
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(f.reshape(-1)))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> list[np.ndarray]:
    """Decode a GIF87a/89a to its composited (h, w) uint8 luma frames.
    Structural walk: extensions skipped via sub-block chains, image data
    decompressed with full LZW; partial frames composite onto the
    running canvas (disposal-1 semantics)."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: missing GIF87a/89a signature")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("GIF: truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    luma_of = lambda tab: (  # noqa: E731 — exact integer ITU-R 601 fold
        (
            tab[:, 0].astype(np.int64) * 299
            + tab[:, 1].astype(np.int64) * 587
            + tab[:, 2].astype(np.int64) * 114
        )
        // 1000
    ).astype(np.uint8)
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w), np.uint8)
    n_data = len(data)
    while True:
        if pos >= n_data:
            raise ValueError("GIF: stream ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain, skipped
            if pos >= n_data:
                raise ValueError("GIF: truncated extension")
            pos += 1  # label byte
            _, pos = _walk_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block introducer 0x{block:02X}")
        if pos + 9 > n_data:
            raise ValueError("GIF: truncated image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fpacked & 0x40:
            raise ValueError("GIF: interlaced frames unsupported")
        tab = gct
        if fpacked & 0x80:  # local color table
            n = 2 << (fpacked & 0x07)
            if pos + 3 * n > n_data:
                raise ValueError("GIF: truncated local color table")
            tab = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if tab is None:
            raise ValueError("GIF: frame has no color table")
        if fx + fw > w or fy + fh > h:
            raise ValueError("GIF: frame rectangle outside logical screen")
        if pos >= n_data:
            raise ValueError("GIF: missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"GIF: bad LZW minimum code size {min_code}")
        payload, pos = _walk_sub_blocks(data, pos)
        idx = _lzw_decode(payload, min_code, fw * fh).reshape(fh, fw)
        if int(idx.max(initial=0)) >= len(tab):
            raise ValueError("GIF: pixel index beyond color table")
        canvas[fy : fy + fh, fx : fx + fw] = luma_of(tab)[idx]
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF: no image data")
    return frames
