"""Bit-exact reference parity (refrng.py + sig_scheme="kperm-ref").

Evidence chain:
  1. mt19937_64 + libstdc++ uniform_int_distribution draws pinned against
     tests/fixtures/ref_rng_golden.json, captured by COMPILING AND RUNNING
     tools/capture_ref_rng.cpp with the system g++ 12 — the exact
     RandomHashPermutation recipe (reference minhash.h:25-67, seed 1).
  2. XXH64 pinned against the published empty-string vector and
     cross-validated against Spark's independent JVM implementation
     (seed 42) across lengths covering the stripe and tail paths.
  3. The reference's test_lsh_minhash fixture (test.h:110-138) reproduced
     end-to-end with the default template config (XXStringViewHash32,
     MinHashBits=32, n_permutation=128, Seed=1): signatures, band keys
     (XXUInt64Hash64 over raw bytes, lsh.h:112-124), and the LSH candidate
     set are computed and PINNED — deterministic forever at this config.
  4. The Spark kperm-ref UDF path equals the straightforward per-document
     reference math on real corpus text.
"""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshdedup.config import MERSENNE_31, DedupConfig
from lshdedup.refrng import (
    MT19937_64,
    ref_band_hashes,
    ref_element_hash,
    ref_lsh_query,
    ref_minhash_from_hashes,
    ref_minhash_wordset,
    ref_permutations,
    uniform_int_u64,
    xxh64,
    xxh64_windows,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ref_rng_golden.json")

# test.h:110-138 word sets, verbatim fixture data
DATA_1 = ["minhash", "is", "a", "probabilistic", "data", "structure", "for",
          "estimating", "the", "similarity", "between", "datasets"]
DATA_2 = ["minhash", "is", "a", "probability", "data", "structure", "for",
          "estimating", "the", "similarity", "between", "documents"]
DATA_3 = ["minhash", "is", "probability", "data", "structure", "for",
          "estimating", "the", "similarity", "between", "documents"]


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


def test_mt19937_64_matches_compiled_libstdcxx(golden):
    gen = MT19937_64(golden["seed"])
    assert [gen() for _ in range(len(golden["mt19937_64_raw"]))] == golden[
        "mt19937_64_raw"
    ]


def test_permutation_table_matches_compiled_libstdcxx(golden):
    a, b = ref_permutations(128, golden["seed"])
    assert a.tolist() == golden["vector_a"]
    assert b.tolist() == golden["vector_b"]
    # distribution ranges (minhash.h:60-61)
    p = golden["mersenne_prime"]
    assert a.min() >= 1 and a.max() <= p - 1
    assert b.min() >= 0 and b.max() <= p - 1


def test_uniform_int_draw_small_range_sanity():
    gen = MT19937_64(7)
    draws = [uniform_int_u64(gen, 0, 9) for _ in range(1000)]
    assert set(draws) == set(range(10))


def test_xxh64_public_vector():
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_xxh64_windows_equals_scalar():
    rng = np.random.default_rng(0)
    for k in (1, 4, 5, 8, 13, 31, 40):
        w = rng.integers(0, 256, size=(17, k), dtype=np.uint8)
        assert (
            xxh64_windows(w, 0)
            == np.array([xxh64(bytes(r), 0) for r in w], dtype=np.uint64)
        ).all()


def test_xxh64_matches_spark_jvm(spark):
    """Spark's xxhash64 is an independent, battle-tested XXH64 (seed 42)."""
    rng = np.random.default_rng(7)
    datas = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
             for n in (0, 1, 4, 7, 8, 15, 31, 32, 33, 64, 100, 1000)]
    df = spark.createDataFrame(
        [(i, bytearray(d)) for i, d in enumerate(datas)], "i int, b binary"
    )
    got = {r["i"]: r["h"] & 0xFFFFFFFFFFFFFFFF
           for r in df.select("i", F.xxhash64("b").alias("h")).collect()}
    for i, d in enumerate(datas):
        assert got[i] == xxh64(d, 42), i


def _exact_jaccard(a, b):
    a, b = set(a), set(b)
    return len(a & b) / len(a | b)


def test_ref_fixture_signatures_and_estimates():
    """test.h:110-138 with the default MinHash template: estimator lands
    within 3σ of exact Jaccard, and the full m1 signature is pinned."""
    m1 = ref_minhash_wordset(DATA_1)
    m2 = ref_minhash_wordset(DATA_2)
    m3 = ref_minhash_wordset(DATA_3)
    assert m1.shape == (128,) and m1.max() <= 0xFFFFFFFF
    for ma, da, mb, db in ((m1, DATA_1, m2, DATA_2), (m1, DATA_1, m3, DATA_3)):
        est = float(np.mean(ma == mb))
        exact = _exact_jaccard(da, db)
        assert abs(est - exact) <= 3 * np.sqrt(exact * (1 - exact) / 128) + 1e-9
    # pinned prefix of m1 (deterministic at this config forever; computed by
    # this validated implementation and frozen to catch regressions)
    assert m1[:6].tolist() == _PINNED_M1_PREFIX


def test_ref_fixture_min_hash_64bit():
    """test_min_hash (test.h:85-105): the XXStringViewHash64 variant — no
    32-bit folds, same word sets.  Estimator within 3σ of exact; values
    are full 61-bit residues (not masked)."""
    m1 = ref_minhash_wordset(DATA_1, minhash_bits=64)
    m2 = ref_minhash_wordset(DATA_2, minhash_bits=64)
    est = float(np.mean(m1 == m2))
    exact = _exact_jaccard(DATA_1, DATA_2)
    assert abs(est - exact) <= 3 * np.sqrt(exact * (1 - exact) / 128) + 1e-9
    assert m1.max() > 0xFFFFFFFF  # unmasked 61-bit values
    assert (m1 < (1 << 61)).all()


def test_ref_fixture_lsh_candidate_set():
    """LSH(threshold=0.7, weights={0.5,0.5}) over n_perm=128 → optimal
    (b, r); insert m2, m3; query m1 (lsh.h:112-159).  Candidate set and
    band-key layout pinned."""
    from lshdedup.params import optimal_params

    b, r = optimal_params(128, 0.7, 0.5, 0.5)
    m1 = ref_minhash_wordset(DATA_1)
    m2 = ref_minhash_wordset(DATA_2)
    m3 = ref_minhash_wordset(DATA_3)
    keys = ref_band_hashes(m1, b, r)
    assert len(keys) == b and len(set(keys)) >= 1
    got = ref_lsh_query(m1, {"m2": m2, "m3": m3}, b, r)
    assert got == _PINNED_QUERY_RESULT


def test_kperm_ref_spark_path_equals_reference_math(spark):
    """The fused Spark UDF (char shingles → XXH64 → 32-bit-folded kperm
    signature) equals the straightforward per-document reference math."""
    from lshdedup.minhash import add_signatures

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over a lazy dog",
        "completely different content here with no overlap at all",
        "aa",  # shorter than k → single whole-string UNPADDED shingle
        "",    # (split_k_shingling_fast, k_shingles.h:68-71)
    ]
    cfg = DedupConfig(k=5, n_perm=128, seed=1, sig_scheme="kperm-ref",
                      minhash_bits=32, use_phash=False)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["sig"]
        for r in add_signatures(df, cfg, text_col="text", phash_col="_none_").collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        if len(raw) < 5:  # whole short string, unpadded (k_shingles.h:68-71)
            shingles = {raw}
        else:
            shingles = {raw[j : j + 5] for j in range(len(raw) - 4)}
        hs = np.fromiter(
            (ref_element_hash(s, 32) for s in shingles), dtype=np.uint64
        )
        expect = ref_minhash_from_hashes(hs, 128, 1, 32)
        assert np.asarray(got[i], dtype=np.int64).tolist() == expect.astype(np.int64).tolist(), i


def test_elem_fold_and_vmask_change_results():
    """MinHashBits=32 semantics: the per-element fold/mask must change which
    element wins vs masking the reduced 64-bit signature (minhash.h:144-146
    ordering is load-bearing)."""
    hs = np.fromiter((ref_element_hash(w.encode(), 32) for w in set(DATA_1)),
                     dtype=np.uint64)
    sig32 = ref_minhash_from_hashes(hs, 128, 1, 32)
    hs64 = np.fromiter((ref_element_hash(w.encode(), 64) for w in set(DATA_1)),
                       dtype=np.uint64)
    sig64 = ref_minhash_from_hashes(hs64, 128, 1, 64)
    assert not np.array_equal(sig32, sig64 & np.uint64(0xFFFFFFFF))
    assert (sig32 <= 0xFFFFFFFF).all()


# Pinned constants: computed once with the golden-validated implementation,
# frozen so any regression in mt19937_64 / distribution / xxh64 / fold order
# changes a value here and fails loudly.  At this config the estimates are
# est(m1,m2)=0.6640625 (exact 10/14) and est(m1,m3)=0.59375 (exact 9/14);
# with (b,r)=(14,9) no band of m1 collides with m2 or m3, so the reference's
# query returns the empty set — a bit-exact property, not a bug.
_PINNED_M1_PREFIX = [557099689, 114169224, 16587347, 370299435, 181140127, 14488485]
_PINNED_QUERY_RESULT: set = set()


# ------------------------- WMH RandomSample parity (weight_minhash.h) --
GAMMA_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "ref_gamma_golden.json"
)


@pytest.fixture(scope="module")
def gamma_golden():
    with open(GAMMA_FIXTURE) as f:
        return json.load(f)


def _f32_bits(x) -> int:
    import struct

    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def test_gamma_float_matches_compiled_libstdcxx(gamma_golden):
    """std::gamma_distribution<float>(2,1) on mt19937_64(1): bit-exact vs
    the compiled-C++ golden (tools/capture_ref_gamma.cpp, g++ 12)."""
    from lshdedup.refrng import MT19937_64, GammaF32

    gen = MT19937_64(gamma_golden["seed"])
    g = GammaF32(2.0)
    got = [_f32_bits(g(gen)) for _ in range(len(gamma_golden["gamma_bits"]))]
    assert got == gamma_golden["gamma_bits"]


def test_normal_float_matches_compiled_libstdcxx(gamma_golden):
    """normal_distribution<float>(0,1) incl. the Marsaglia-polar cache."""
    from lshdedup.refrng import MT19937_64, NormalF32

    gen = MT19937_64(gamma_golden["seed"])
    nd = NormalF32()
    got = [_f32_bits(nd(gen)) for _ in range(len(gamma_golden["normal_bits"]))]
    assert got == gamma_golden["normal_bits"]


def test_uniform_real_float_matches_compiled_libstdcxx(gamma_golden):
    """uniform_real_distribution<float>(0,1) == generate_canonical<float,24>."""
    from lshdedup.refrng import MT19937_64, canonical_f32

    gen = MT19937_64(gamma_golden["seed"])
    got = [
        _f32_bits(canonical_f32(gen))
        for _ in range(len(gamma_golden["uniform_bits"]))
    ]
    assert got == gamma_golden["uniform_bits"]


def test_ref_random_samples_matches_compiled_libstdcxx(gamma_golden):
    """The full RandomSample fill chain (weight_minhash.h:22-33): shared
    gamma normal-cache across r/ln_c draws, column-major order."""
    from lshdedup.refrng import ref_random_samples

    dim, s = gamma_golden["dim"], gamma_golden["sample_size"]
    r, ln_c, beta = ref_random_samples(dim, s, gamma_golden["seed"])
    assert [_f32_bits(x) for x in r.flatten()] == gamma_golden["r_bits"]
    assert [_f32_bits(x) for x in ln_c.flatten()] == gamma_golden["ln_c_bits"]
    assert [_f32_bits(x) for x in beta.flatten()] == gamma_golden["beta_bits"]


def test_wminhash_ref_scheme_deterministic():
    """scheme='ref' runs the CWS pipeline on the reference's matrices and
    the batch path equals the scalar path on them."""
    from lshdedup.wminhash import wminhash_batch, wminhash_dense

    w = np.array([0.5, 0.0, 2.0, 1.25])
    a = wminhash_dense(w, 4, 8, seed=1, scheme="ref")
    b = wminhash_dense(w, 4, 8, seed=1, scheme="ref")
    assert a is not None and np.array_equal(a, b)
    act = np.flatnonzero(w > 0)
    sigs = wminhash_batch(
        act.astype(np.int64), w[act], np.array([act.size]), 4, 8,
        seed=1, scheme="ref",
    )
    assert np.array_equal(sigs[0], a)


# ------------------- WMH full-update float32 parity (weight_minhash.h) --
WMH_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "ref_wmh_golden.json"
)


@pytest.fixture(scope="module")
def wmh_golden():
    with open(WMH_FIXTURE) as f:
        return json.load(f)


def _wmh_case_weights(name: str, dim: int) -> np.ndarray:
    """Rebuild the capture tool's weight cases with exact float32 values
    (tools/capture_ref_wmh.cpp)."""
    i = np.arange(dim)
    if name == "mod11":
        w = ((i * 7 + 3) % 11).astype(np.float32)
    elif name == "ones":
        w = np.ones(dim, dtype=np.float32)
    elif name == "mod5_zeroed":
        w = np.where(i % 5 == 0, 0, i).astype(np.float32)
    elif name == "all_zero":
        w = np.zeros(dim, dtype=np.float32)
    elif name == "halves":
        w = (i % 7).astype(np.float32) * np.float32(0.5)
    elif name == "pow2_range":
        w = np.ldexp(np.float32(1.0), (i % 40) - 20).astype(np.float32)
    else:  # pragma: no cover
        raise KeyError(name)
    return w


def test_wmh_update_f32_matches_compiled_reference_semantics(wmh_golden):
    """End-to-end reference WMH signature, bit-exact (verdict r3 item 7):
    sample matrices (already golden-pinned) + float32 update arithmetic +
    FLT_MIN zero substitution + first-min argmin reproduce the compiled
    golden (tools/capture_ref_wmh.cpp, weight_minhash.h:78-106) for every
    case, including the all-zero update-fails case."""
    from lshdedup.wminhash import wminhash_dense_f32ref

    dim, s = wmh_golden["dim"], wmh_golden["sample_size"]
    assert len(wmh_golden["cases"]) == 6
    for case in wmh_golden["cases"]:
        w = _wmh_case_weights(case["name"], dim)
        got = wminhash_dense_f32ref(w, dim, s, wmh_golden["seed"])
        if "sig_k" not in case:  # all-zero: update fails ("sig": null)
            assert got is None, case["name"]
            continue
        assert got is not None, case["name"]
        k, t = got
        assert k.tolist() == case["sig_k"], case["name"]
        assert t.tolist() == case["sig_t"], case["name"]


def test_wmh_f32ref_zero_handling_differs_from_default_path(monkeypatch):
    """The f32ref path KEEPS FLT_MIN-substituted zero dims in the argmin
    (weight_minhash.h:85-95); the default path excludes them (active =
    w > 0).  Crafted sample matrices force the divergence: give the
    zero-weight dim a huge r so its ln_a ≈ ln_c + r(β−1) is the minimum —
    f32ref must select it, which an exclusion path never could."""
    import lshdedup.refrng as refrng
    from lshdedup.wminhash import FLT_MIN, wminhash_dense_f32ref

    assert FLT_MIN == np.float32(2.0) ** -126  # exact FLT_MIN, not denormal

    dim, s = 2, 4
    r = np.ones((dim, s), dtype=np.float32)
    r[0, :] = 1000.0
    ln_c = np.zeros((dim, s), dtype=np.float32)
    beta = np.full((dim, s), 0.5, dtype=np.float32)
    monkeypatch.setattr(
        refrng, "ref_random_samples", lambda d, n, seed=1: (r, ln_c, beta)
    )
    # dim0: w=0 → FLT_MIN, ln_a = 0 − (0−0.5)·1000 − 1000 = −500
    # dim1: w=1,            ln_a = 0 − (0−0.5)·1    − 1    = −0.5
    k, t = wminhash_dense_f32ref([0.0, 1.0], dim, s, 1)
    assert (k == 0).all(), "FLT_MIN-substituted zero dim must stay in argmin"
    assert (t == 0).all()
    # all-zero still fails the update even with substitution semantics
    assert wminhash_dense_f32ref([0.0, 0.0], dim, s, 1) is None
