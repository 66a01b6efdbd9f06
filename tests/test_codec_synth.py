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


def test_decode_real_jpeg_is_stubbed():
    """PNG is now a real stdlib path (decode_png); only formats needing
    external libs (jpeg/webp) remain stubbed in this sandbox."""
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0", "jpeg")


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
