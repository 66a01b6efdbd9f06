"""Codec invariants + synthetic corpus determinism (FIXTURES.md F1)."""

import numpy as np
import pytest

from lshdedup.codec import decode_image, decode_real, encode_image, phash64, psnr
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


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG...", "png")


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
