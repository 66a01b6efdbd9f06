"""Baseline JPEG (JFIF) codec in pure stdlib + numpy — no libjpeg/PIL.

Implements the baseline sequential DCT process of the public ITU-T T.81
spec: 8×8 forward/inverse DCT (the orthonormal DCT matrix from codec.py
is exactly the T.81 FDCT), IJG-style quality-scaled quantization of the
Annex K.1 luminance table, zigzag ordering, differential DC + run-length
AC Huffman entropy coding with the Annex K.3/K.5 typical tables, JFIF
markers, byte stuffing, and optional restart intervals.

Scope (documented, tested):
  encode_jpeg — (h, w) uint8 grayscale → 1-component JPEG, or
                (h, w, 3) uint8 RGB → 3-component YCbCr at 4:4:4 or
                4:2:0 (2×2 box-mean chroma downsample).
  decode_jpeg — any baseline (SOF0/SOF1) single-interleaved-scan JPEG,
                arbitrary sampling factors 1-4, per-component quant +
                Huffman table ids, restart markers → (h, w) uint8 LUMA
                plane (chroma is entropy-decoded to keep the bitstream
                in sync but not reconstructed — the dedup pipeline is
                grayscale end-to-end, same contract as decode_png).
                Progressive (SOF2) raises with a clear message.

Like the PNG codec this generalizes the reference's binary sink/scan
rows (dna_benchmark.h:113-166) to a real wire format; it is driver/UDF
-side code with no Spark dependency, dispatched from codec.decode_real
inside the same mapInPandas plumbing as every other format.

The multimodal DRIVER query corpus intentionally excludes fmt="jpeg":
JPEG is lossy, and that query's DuckDB oracle re-derives decode
arithmetic value-exactly (only raw/qnt/png rows keep that possible).
JPEG correctness is pinned here by pytest round-trip PSNR (≥ 40 dB, the
BASELINE.json lossy invariant) and exactness checks at quality=100.
"""

from __future__ import annotations

import struct

import numpy as np

from lshdedup.codec import _dct_matrix

# Zigzag scan: ZIGZAG[k] = natural (row-major) index of the k-th
# zigzag-ordered coefficient (T.81 Figure 5).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance quantization table (natural order).
_BASE_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K.3 / K.5 typical luminance Huffman tables: (BITS[1..16], HUFFVAL).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _quality_qt(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K.1 table (natural order)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    sf = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((_BASE_QT * sf + 50) // 100, 1, 255)


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Byte-align by padding with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0


def _plane_to_zigzag_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) plane (multiples of 8) → (H/8, W/8, 64) quantized zigzag
    coefficients.  DCT + quantization vectorized over every block at
    once; only entropy coding is per-block Python."""
    h, w = plane.shape
    d = _dct_matrix(8)
    blocks = (
        plane.astype(np.float64).reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        - 128.0
    )
    freq = np.einsum("ij,abjk,lk->abil", d, blocks, d)
    quant = np.round(freq / qt.reshape(8, 8)).astype(np.int32)
    return quant.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]


def _encode_block(zz: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict,
                  bw: _BitWriter) -> int:
    """Entropy-encode one zigzag block (T.81 F.1.2); returns the new DC
    predictor.  Negative magnitudes use the one's-complement encoding."""
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    bw.write(*dc_tab[s])
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bw.write(*ac_tab[0xF0])  # ZRL
            run -= 16
        s = abs(v).bit_length()
        bw.write(*ac_tab[run * 16 + s])
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.write(*ac_tab[0x00])  # EOB
    return dc


def _rgb_to_ycbcr(rgb: np.ndarray) -> list[np.ndarray]:
    """JFIF RGB → full-range YCbCr, rounded to uint8 planes."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 95,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels as baseline JFIF JPEG.

    (h, w) grayscale → one component; (h, w, 3) RGB → YCbCr at
    ``subsampling`` ("4:4:4" or "4:2:0").  All components share the
    quality-scaled Annex K.1 quant table and the K.3/K.5 Huffman tables
    (table id 0 — legal, and what a single-table encoder emits).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's resync path)."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects (h, w) or (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    qt = _quality_qt(quality)

    if pixels.ndim == 2:
        planes, samp = [pixels], [(1, 1)]
    else:
        if pixels.shape[2] != 3:
            raise ValueError("color input must have 3 channels (RGB)")
        y, cb, cr = _rgb_to_ycbcr(pixels)
        if subsampling == "4:4:4":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "4:2:0":
            pad_h, pad_w = (-h) % 16, (-w) % 16
            y2 = np.pad(y, ((0, pad_h), (0, pad_w)), mode="edge")
            sub = [
                np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge")
                .reshape(y2.shape[0] // 2, 2, y2.shape[1] // 2, 2)
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
                for p in (cb, cr)
            ]
            planes, samp = [y2, *sub], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        comp_blocks.append(_plane_to_zigzag_blocks(p, qt))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(int(v) for v in qt[ZIGZAG])
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        out += struct.pack(">BBB", i + 1, (sh << 4) | sv, 0)
    for cls, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)),
                              (1, (_AC_BITS, _AC_VALS))):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), cls << 4)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += struct.pack(">BB", i + 1, 0x00)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    dc_tab = _build_encode_table(_DC_BITS, _DC_VALS)
    ac_tab = _build_encode_table(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bytes(bw.buf)
            bw = _BitWriter()
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) % 8
            preds = [0] * nc
        my, mx = divmod(m, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                    preds[ci] = _encode_block(zz, preds[ci], dc_tab,
                                              ac_tab, bw)
    bw.flush()
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over one destuffed entropy-coded segment."""

    def __init__(self, seg: bytes) -> None:
        self.d = seg
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("JPEG: truncated entropy-coded data")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict) -> np.ndarray:
    zz = np.zeros(64, np.int32)
    s = _decode_huff(br, dc_tab)
    zz[0] = _extend(br.bits(s), s) if s else 0
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past end of block")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz


def _split_entropy(data: bytes, start: int) -> list[bytes]:
    """Destuff the entropy-coded stream and split on RSTn markers;
    stops at the first non-RST marker (normally EOI)."""
    segs, cur, i, n = [], bytearray(), start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = data[i + 1]
        if nxt == 0x00:  # stuffed 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker — end of scan
            break
    segs.append(bytes(cur))
    return segs


def _parse_markers(data: bytes, pos: int, qts: dict, huff: dict):
    """Walk marker segments up to (and including) SOS; fills qts/huff in
    place, returns (pos_after_sos, frame, restart_interval, scan)."""
    frame, ri, scan = None, 0, None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at byte {pos}")
        while data[pos + 1] == 0xFF:  # optional fill bytes before a marker
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT — possibly several tables per segment
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                if len(body) < off + 65:
                    raise ValueError("JPEG: truncated DQT segment")
                qts[tq] = np.frombuffer(
                    body[off + 1 : off + 65], np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                if len(bits) < 16 or len(vals) < nvals:
                    raise ValueError("JPEG: truncated DHT segment")
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                off += 17 + nvals
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            precision, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:
            raise ValueError(
                "JPEG: progressive (SOF2) not supported by this baseline "
                "decoder"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            break
        # else: APPn / COM / others — skipped via their length
    return pos, frame, ri, scan


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to its (h, w) uint8 luma plane (first SOF
    component; chroma blocks are entropy-decoded but not reconstructed).
    Supports SOF0/SOF1, one interleaved scan, arbitrary 1-4 sampling
    factors, per-component DQT/DHT ids, and restart intervals."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    try:
        pos, frame, ri, scan = _parse_markers(data, 2, qts, huff)
    except (IndexError, struct.error) as exc:
        raise ValueError("JPEG: truncated or corrupt marker segment") from exc
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")
    if len(scan) != len(frame["comps"]):
        raise ValueError("JPEG: only single interleaved scans supported")
    by_id = {c["id"]: c for c in frame["comps"]}
    for s in scan:
        if s["id"] not in by_id:
            raise ValueError(f"JPEG: scan references unknown component "
                             f"{s['id']}")
        by_id[s["id"]].update(td=s["td"], ta=s["ta"])
    comps = [by_id[s["id"]] for s in scan]

    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luma = comps[0]  # JFIF: first SOF component is Y
    ly_blocks = np.zeros(
        (mcus_y * luma["v"], mcus_x * luma["h"], 64), np.float64
    )
    segs = _split_entropy(data, pos)
    seg_i = 0
    br = _BitReader(segs[0])
    preds = {c["id"]: 0 for c in comps}
    for m in range(mcus_x * mcus_y):
        if ri and m and m % ri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG: missing restart segment")
            br = _BitReader(segs[seg_i])
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            try:
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                qt = qts[c["tq"]]
            except KeyError as exc:
                raise ValueError("JPEG: scan references a missing "
                                 "quant/Huffman table") from exc
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = _decode_block(br, dc_tab, ac_tab)
                    preds[c["id"]] += int(zz[0])
                    zz[0] = preds[c["id"]]
                    if c is luma:
                        nat = np.zeros(64, np.float64)
                        nat[ZIGZAG] = zz * qt  # DQT is zigzag-ordered
                        ly_blocks[my * c["v"] + by, mx * c["h"] + bx] = nat
    d = _dct_matrix(8)
    nby, nbx, _ = ly_blocks.shape
    freq = ly_blocks.reshape(nby, nbx, 8, 8)
    spatial = np.einsum("ji,abjk,kl->abil", d, freq, d) + 128.0
    plane = (
        spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    )
    # luma plane covers ceil(h / (8*vmax)) * v * 8 rows; crop to frame
    return np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split a concatenated baseline-JPEG stream into its frames.

    "MJPEG" on the wire (multipart HTTP streams, AVI 'MJPG' chunks with
    the container stripped) is exactly a concatenation of standalone
    baseline JPEGs, so the split IS the container parse.  The walk is
    STRUCTURAL — marker segments are skipped by their declared length and
    the entropy-coded scan by its stuffing rules — because a naive scan
    for the EOI byte pair 0xFFD9 is wrong: DQT/DHT/APPn/COM segment
    payloads are arbitrary bytes and may contain 0xFFD9 (only the
    entropy-coded stream guarantees 0xFF is followed by 0x00 or RSTn).

    Each returned element is a complete SOI..EOI frame decodable by
    decode_jpeg.  Raises ValueError on truncation, a missing SOI, or a
    multi-scan frame (this baseline family is always single-scan).
    """
    frames: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG: expected SOI at byte {pos}")
        p = pos + 2
        while True:  # marker segments up to SOS / EOI
            if p + 2 > n or data[p] != 0xFF:
                raise ValueError(f"MJPEG: expected marker at byte {p}")
            while p + 2 <= n and data[p + 1] == 0xFF:  # optional fill bytes
                p += 1
            if p + 2 > n:
                raise ValueError("MJPEG: truncated at marker fill bytes")
            marker = data[p + 1]
            if marker == 0xD9:  # EOI before SOS: degenerate empty frame
                p += 2
                break
            if p + 4 > n:
                raise ValueError("MJPEG: truncated marker segment")
            (seg_len,) = struct.unpack(">H", data[p + 2 : p + 4])
            p += 2 + seg_len
            if marker != 0xDA:  # not SOS: next marker segment
                continue
            while True:  # entropy-coded scan: FF00 stuffing, RSTn inside
                if p >= n:
                    raise ValueError("MJPEG: truncated entropy scan")
                if data[p] != 0xFF:
                    p += 1
                    continue
                if p + 1 >= n:
                    raise ValueError("MJPEG: truncated marker in scan")
                nxt = data[p + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    p += 2
                    continue
                break
            if data[p + 1] != 0xD9:
                raise ValueError(
                    f"MJPEG: unexpected in-frame marker 0xFF{data[p + 1]:02X}"
                    " (multi-scan frames unsupported)"
                )
            p += 2
            break
        frames.append(data[pos:p])
        pos = p
    return frames
