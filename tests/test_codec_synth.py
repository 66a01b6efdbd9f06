"""Codec invariants + synthetic corpus determinism (FIXTURES.md F1)."""

import numpy as np
import pytest

from lshdedup.codec import (
    decode_image,
    decode_png,
    decode_real,
    encode_image,
    encode_png,
    phash64,
    psnr,
)
from lshdedup.synth import (
    SynthConfig,
    corpus_local,
    splitmix64_scalar,
    synth_corpus,
    truth_clusters_local,
    truth_pairs_local,
)


def test_raw_roundtrip_lossless():
    rng = np.random.Generator(np.random.PCG64(7))
    px = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert (decode_image(encode_image(px, "raw")) == px).all()


def test_qnt_roundtrip_psnr():
    """Lossy codec must satisfy the PSNR ≥ 40 dB invariant (input_hint)."""
    rng = np.random.Generator(np.random.PCG64(7))
    px = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    dec = decode_image(encode_image(px, "qnt"))
    assert psnr(px, dec) >= 40.0


def test_decode_real_webp_is_stubbed():
    """PNG and baseline JPEG are now real stdlib paths (decode_png,
    jpeg.decode_jpeg); only formats needing external libs (webp/video)
    remain stubbed in this sandbox."""
    with pytest.raises(NotImplementedError):
        decode_real(b"RIFF\x00\x00\x00\x00WEBP", "webp")


class TestPngCodec:
    """Real-wire-format PNG path (VERDICT r4 item 2): pure stdlib zlib +
    the five RFC 2083 scanline filters.  Generalizes the reference's
    binary sink/scan rows (dna_benchmark.h:113-166) to a genuine format."""

    def _px(self, h=24, w=17, seed=7):
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, (h, w), dtype=np.uint8)

    def test_roundtrip_lossless_all_filters(self):
        px = self._px()
        for ft in range(5):
            data = encode_png(px, filter_type=ft)
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            dec = decode_png(data)
            assert dec.dtype == np.uint8
            assert (dec == px).all(), f"filter {ft} not lossless"
            assert psnr(px, dec) == float("inf")

    def test_encode_image_dispatch_and_decode_real(self):
        px = self._px(16, 16)
        data = encode_image(px, "png")
        assert (decode_real(data, "png") == px).all()
        assert (decode_png(encode_png(px)) == px).all()

    def test_gradients_compress_and_roundtrip(self):
        # smooth image: Sub/Paeth filters produce near-zero residuals —
        # the compressed stream must be smaller than filter-0
        y, x = np.mgrid[0:64, 0:64]
        px = ((x + y) % 256).astype(np.uint8)
        flat = encode_png(px, filter_type=0)
        sub = encode_png(px, filter_type=1)
        assert len(sub) < len(flat)
        assert (decode_png(sub) == px).all()

    def test_rgb_and_rgba_luma_decode(self):
        # hand-build color PNGs (filter 0 rows) and check BT.601 luma
        import struct
        import zlib as _z

        from lshdedup.codec import _png_chunk

        rng = np.random.Generator(np.random.PCG64(11))
        h, w = 9, 13
        for ctype, ch in ((2, 3), (6, 4), (4, 2)):
            px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            scan = np.concatenate(
                [np.zeros((h, 1), np.uint8), px.reshape(h, w * ch)], axis=1
            )
            data = (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
                + _png_chunk(b"IDAT", _z.compress(scan.tobytes()))
                + _png_chunk(b"IEND", b"")
            )
            dec = decode_png(data)
            if ctype == 4:
                exp = px[:, :, 0]
            else:
                r, g, b = (px[:, :, i].astype(np.int64) for i in range(3))
                exp = ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
            assert (dec == exp).all(), f"color type {ctype}"

    def test_rejects_corruption_and_unsupported(self):
        px = self._px(8, 8)
        data = bytearray(encode_png(px))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"NOTAPNG!" + bytes(data[8:]))
        data[40] ^= 0xFF  # flip a byte inside IDAT → CRC must catch it
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))
        with pytest.raises(ValueError, match="filter type"):
            encode_png(px, filter_type=9)
        # interlaced header → explicit unsupported error
        import struct
        import zlib as _z

        from lshdedup.codec import _png_chunk

        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1))
            + _png_chunk(b"IDAT", _z.compress(b"\x00" * 72))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            decode_png(bad)


def test_phash_stability_and_locality():
    rng = np.random.Generator(np.random.PCG64(3))
    px = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # small perturbation → small hamming
    noisy = px.copy()
    noisy[0, 0] ^= 3
    d = bin((h1 ^ phash64(noisy)) & ((1 << 64) - 1)).count("1")
    assert d <= 8
    other = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    d_far = bin((h1 ^ phash64(other)) & ((1 << 64) - 1)).count("1")
    assert d_far > d


def test_splitmix_scalar_matches_vector():
    from lshdedup.hashing import splitmix64

    xs = np.array([0, 1, 42, 2**63], dtype=np.uint64)
    vec = splitmix64(xs)
    for x, v in zip(xs, vec):
        assert splitmix64_scalar(int(x)) == int(v)


def test_corpus_deterministic_and_distributed_equal(spark):
    scfg = SynthConfig(n_rows=64)
    local = corpus_local(scfg)
    dist = (
        synth_corpus(spark, scfg, partitions=5)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert list(local["image_id"]) == list(dist["image_id"])
    assert list(local["caption"]) == list(dist["caption"])
    assert list(local["phash"]) == list(dist["phash"])
    assert all(bytes(a) == bytes(b) for a, b in zip(local["bytes"], dist["bytes"]))


def test_planted_invariants():
    """Per-row invariants (input_hint): exact dups have equal captions and
    decoded pixels within PSNR ≥ 40 dB; stored phash matches stored bytes."""
    scfg = SynthConfig(n_rows=128)
    pdf = corpus_local(scfg).set_index("image_id")
    pairs = truth_pairs_local(scfg)
    exact = pairs[pairs.level >= 1.0]
    assert len(exact) > 0
    for _, row in exact.iterrows():
        a, b = pdf.loc[row.id_a], pdf.loc[row.id_b]
        assert a.caption == b.caption
        pa = decode_image(bytes(a["bytes"]))
        pb = decode_image(bytes(b["bytes"]))
        assert psnr(pa, pb) >= 40.0
    for img_id, row in pdf.iterrows():
        assert phash64(decode_image(bytes(row["bytes"]))) == row["phash"]


def test_truth_tables_consistent():
    scfg = SynthConfig(n_rows=80)
    clusters = truth_clusters_local(scfg)
    pairs = truth_pairs_local(scfg)
    cmap = dict(zip(clusters.image_id, clusters.cluster_id))
    for _, r in pairs.iterrows():
        assert cmap[r.id_a] == cmap[r.id_b]


class TestJpegCodec:
    """Real-wire-format baseline JPEG path (round 5): pure stdlib+numpy
    ITU-T T.81 encoder/decoder (lshdedup/jpeg.py).  Same reference
    lineage as PNG — the binary sink/scan rows (dna_benchmark.h:113-166)
    generalized to a genuine lossy format with the BASELINE.json
    PSNR ≥ 40 dB invariant."""

    def _px(self, h=48, w=80, seed=7):
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, (h, w), dtype=np.uint8)

    def test_noise_roundtrip_psnr(self):
        """White noise is JPEG's worst case; the ≥ 40 dB lossy invariant
        must hold even there at the default quality."""
        from lshdedup.jpeg import decode_jpeg, encode_jpeg

        px = self._px()
        data = encode_jpeg(px)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        dec = decode_jpeg(data)
        assert dec.shape == px.shape and dec.dtype == np.uint8
        assert psnr(px, dec) >= 40.0

    def test_smooth_image_near_lossless(self):
        from lshdedup.jpeg import decode_jpeg, encode_jpeg

        gx = (np.add.outer(np.arange(64), np.arange(96)) % 256).astype(
            np.uint8
        )
        assert psnr(gx, decode_jpeg(encode_jpeg(gx, quality=95))) > 55.0

    def test_quality_100_max_error_one(self):
        """q100 → all-ones quant table: the only loss is DCT rounding."""
        from lshdedup.jpeg import decode_jpeg, encode_jpeg

        px = self._px()
        dec = decode_jpeg(encode_jpeg(px, quality=100))
        assert int(np.abs(px.astype(int) - dec.astype(int)).max()) <= 1

    def test_non_multiple_of_eight_dimensions(self):
        from lshdedup.jpeg import decode_jpeg, encode_jpeg

        px = self._px(13, 21)
        dec = decode_jpeg(encode_jpeg(px, quality=95))
        assert dec.shape == (13, 21)
        assert psnr(px, dec) >= 40.0

    def test_color_444_and_420_luma(self):
        """Color encode exercises the decoder's multi-component MCU path
        (4:4:4) and non-trivial sampling factors (4:2:0, Y is 2×2 per
        MCU); output is the luma plane."""
        from lshdedup.jpeg import _rgb_to_ycbcr, decode_jpeg, encode_jpeg

        rng = np.random.Generator(np.random.PCG64(11))
        rgb = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        y = _rgb_to_ycbcr(rgb)[0]
        for ss in ("4:4:4", "4:2:0"):
            dec = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling=ss))
            assert dec.shape == y.shape
            assert psnr(y, dec) >= 40.0

    def test_restart_markers_do_not_change_pixels(self):
        """DRI/RSTn only resegment the entropy stream; quantized
        coefficients are identical, so decoded pixels must be too."""
        from lshdedup.jpeg import decode_jpeg, encode_jpeg

        px = self._px()
        plain = decode_jpeg(encode_jpeg(px, quality=90))
        rst = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=2))
        assert (plain == rst).all()

    def test_zigzag_matches_independent_derivation(self):
        """Re-derive the zigzag order with the standard diagonal walk
        (independent of the hand-copied table) — catches a transposed
        table that a same-table round trip could never see."""
        from lshdedup.jpeg import ZIGZAG

        order = []
        for d in range(15):
            rng = range(max(0, d - 7), min(d, 7) + 1)
            # even diagonals run bottom-left→top-right, odd the reverse
            for i in (rng if d % 2 else reversed(rng)):
                order.append(i * 8 + (d - i))
        assert list(ZIGZAG) == order

    def test_quality_50_is_annex_k_table(self):
        from lshdedup.jpeg import _BASE_QT, _quality_qt

        assert (_quality_qt(50) == _BASE_QT).all()

    def test_constant_block_golden_bitstream(self):
        """A single 8×8 constant-128 block encodes (level shift → all
        zeros) as DC category 0 (K.3: 2-bit code 00) + EOB (K.5: 4-bit
        code 1010), padded with 1s → exactly one byte 0x2B.  Pins the
        Huffman table construction and MSB-first bit order to the public
        spec values independently of the decoder."""
        from lshdedup.jpeg import encode_jpeg

        data = encode_jpeg(np.full((8, 8), 128, np.uint8), quality=50)
        sos = data.find(b"\xff\xda")
        # 1-component SOS: marker (2) + length field 8 (self + 6 body)
        entropy = data[sos + 10 : -2]
        assert entropy == b"\x2b"

    def test_dispatch_via_codec_interface(self):
        px = self._px(16, 16)
        data = encode_image(px, "jpeg")
        dec = decode_real(data, "jpeg")
        assert psnr(px, dec) >= 40.0
        assert psnr(px, decode_real(data, "jpg")) >= 40.0

    def test_error_paths(self):
        from lshdedup.jpeg import decode_jpeg, encode_jpeg

        px = self._px(16, 16)
        data = bytearray(encode_jpeg(px))
        with pytest.raises(ValueError, match="missing SOI"):
            decode_jpeg(b"\x89PNG" + bytes(data[4:]))
        with pytest.raises(ValueError, match="progressive"):
            bad = bytes(data).replace(b"\xff\xc0", b"\xff\xc2", 1)
            decode_jpeg(bad)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data[: len(data) // 4]))
        with pytest.raises(ValueError, match="quality"):
            encode_jpeg(px, quality=0)
        with pytest.raises(ValueError):
            encode_jpeg(px.astype(np.int32))
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(
                np.zeros((8, 8, 3), np.uint8), subsampling="4:1:1"
            )
