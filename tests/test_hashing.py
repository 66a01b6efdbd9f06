"""Numpy-core semantics pins (SURVEY §5.2 item 1, §7.4 risks)."""

import numpy as np
import pytest

from lshdedup.hashing import (
    char_shingle_hashes,
    exact_jaccard_hashed,
    fnv1a_bytes,
    fnv1a_windows,
    generate_permutations,
    minhash_fixed,
    minhash_segments,
    phash_window_hashes,
    splitmix64,
)


def test_uint64_wrap_semantics():
    """numpy uint64 must wrap mod 2^64 like C++/Eigen uint64
    (minhash.h:143-144 comment; SURVEY §7.4)."""
    a = np.array([2**63, 2**64 - 1], dtype=np.uint64)
    assert ((a * np.uint64(2)) == np.array([0, 2**64 - 2], dtype=np.uint64)).all()
    assert ((a + a)[0]) == 0


def test_fnv_matches_scalar():
    data = b"abcdefgh"
    w = np.frombuffer(data, dtype=np.uint8)[None, :]
    assert fnv1a_windows(w)[0] == fnv1a_bytes(data)


def test_char_shingle_hashes_window_count():
    flat, bounds = char_shingle_hashes([b"abcdef", b"xyz"], 3)
    # "abcdef" -> 4 grams; "xyz" -> 1 gram
    assert (bounds[0, 1] - bounds[0, 0]) == 4
    assert (bounds[1, 1] - bounds[1, 0]) == 1
    # grams: hash("abc") must equal a directly computed window hash
    assert flat[bounds[0, 0]] == fnv1a_bytes(b"abc")


def test_short_string_single_shingle():
    """len < k → whole string as one (padded) shingle (k_shingles.h:74-77)."""
    flat, bounds = char_shingle_hashes([b"ab"], 4)
    assert bounds[0, 1] - bounds[0, 0] == 1
    # stable and distinct from a different short string
    flat2, _ = char_shingle_hashes([b"ac"], 4)
    assert flat[0] != flat2[0]
    flat3, _ = char_shingle_hashes([b"ab"], 4)
    assert flat[0] == flat3[0]


def test_minhash_set_semantics():
    """Duplicate elements never change the signature (weighted multiset →
    set semantics of unweighted MinHash, minhash.h:153-169)."""
    a, b = generate_permutations(64, 1)
    h = np.array([5, 7, 9], dtype=np.uint64)
    hdup = np.array([5, 5, 7, 9, 9, 9], dtype=np.uint64)
    s1 = minhash_segments(h, np.array([[0, 3]]), a, b)
    s2 = minhash_segments(hdup, np.array([[0, 6]]), a, b)
    assert (s1 == s2).all()


def test_minhash_below_mersenne():
    a, b = generate_permutations(128, 1)
    h = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    sig = minhash_segments(h, np.array([[0, 1000]]), a, b)
    assert sig.max() < (1 << 61)


def test_minhash_segment_independence():
    """Row signatures must not depend on batch neighbors."""
    a, b = generate_permutations(32, 1)
    flat, bounds = char_shingle_hashes([b"hello world", b"other text"], 3)
    both = minhash_segments(flat, bounds, a, b)
    f1, b1 = char_shingle_hashes([b"hello world"], 3)
    solo = minhash_segments(f1, b1, a, b)
    assert (both[0] == solo[0]).all()


def test_minhash_estimate_tolerance():
    """Estimate within binomial tolerance of exact Jaccard
    (test.h:86-103 analogue; n=512 → s.d. ≈ sqrt(J(1-J)/512) ≤ 0.023)."""
    a, b = generate_permutations(512, 1)
    t1 = b"the quick brown fox jumps over the lazy dog and runs far away home"
    t2 = b"the quick brown fox jumps over the lazy cat and runs far away home"
    flat, bounds = char_shingle_hashes([t1, t2], 5)
    sig = minhash_segments(flat, bounds, a, b)
    est = (sig[0] == sig[1]).mean()
    exact = exact_jaccard_hashed(
        flat[bounds[0, 0] : bounds[0, 1]], flat[bounds[1, 0] : bounds[1, 1]]
    )
    assert est == pytest.approx(exact, abs=0.1)


def test_minhash_fixed_matches_segments():
    a, b = generate_permutations(16, 1)
    h = np.array([[3, 8, 1], [9, 9, 2]], dtype=np.uint64)
    fixed = minhash_fixed(h, a, b)
    flat = h.reshape(-1)
    seg = minhash_segments(flat, np.array([[0, 3], [3, 6]]), a, b)
    assert (fixed == seg).all()


def test_phash_windows_locality():
    """Hamming-close phashes share most window shingles."""
    ph = np.array([0x123456789ABCDEF0, 0x123456789ABCDEF1], dtype=np.int64)
    w = phash_window_hashes(ph)
    shared = (w[0] == w[1]).mean()
    assert shared > 0.7
    far = phash_window_hashes(np.array([0x123456789ABCDEF0, -0x123456789ABCDEF0], dtype=np.int64))
    assert (far[0] == far[1]).mean() < shared


def test_splitmix_bijective_like():
    x = np.arange(10000, dtype=np.uint64)
    assert len(np.unique(splitmix64(x))) == 10000


# ----------------------------- one-permutation hashing (scale path) -----
def _oph_gramsets(n_docs=40, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(1, 2**62, size=400, dtype=np.uint64)
    sets, lens = [], []
    for i in range(n_docs):
        m = int(rng.integers(30, 120))
        sets.append(rng.choice(base, size=m, replace=False))
        lens.append(m)
    flat = np.concatenate(sets)
    return sets, flat, np.array(lens, dtype=np.int64)


def test_oph_estimator_tracks_exact_jaccard():
    from lshdedup.hashing import oph_signatures

    sets, flat, lens = _oph_gramsets()
    sig = oph_signatures(flat, lens, 128, seed=1)
    errs = []
    for i in range(0, 20, 2):
        ex = exact_jaccard_hashed(sets[i], sets[i + 1])
        est = float((sig[i] == sig[i + 1]).mean())
        errs.append(abs(ex - est))
    # 128 lanes -> sd <= 0.5/sqrt(128) ~ 0.044; allow 4 sd
    assert np.mean(errs) < 0.09


def test_oph_identical_sets_match_fully():
    from lshdedup.hashing import oph_signatures

    sets, flat, lens = _oph_gramsets()
    both = np.concatenate([sets[0], sets[0]])
    sig = oph_signatures(both, np.array([lens[0], lens[0]]), 128, seed=1)
    assert np.array_equal(sig[0], sig[1])


def test_oph_batch_split_determinism():
    from lshdedup.hashing import oph_signatures

    sets, flat, lens = _oph_gramsets()
    whole = oph_signatures(flat, lens, 128, seed=1)
    cut = int(lens[:7].sum())
    part = oph_signatures(flat[:cut], lens[:7], 128, seed=1)
    assert np.array_equal(whole[:7], part)


def test_oph_raw_merge_equals_union():
    """min of raw bucket matrices == raw matrix of the union set
    (the exact multi-channel blend used for caption+phash)."""
    from lshdedup.hashing import oph_densify, oph_raw

    sets, flat, lens = _oph_gramsets()
    a, b = sets[0], sets[1]
    ra = oph_raw(a, np.array([len(a)]), 128, seed=1)
    rb = oph_raw(b, np.array([len(b)]), 128, seed=1)
    union = np.concatenate([a, b])
    ru = oph_raw(union, np.array([len(union)]), 128, seed=1)
    assert np.array_equal(np.minimum(ra, rb), ru)
    assert np.array_equal(
        oph_densify(np.minimum(ra, rb), 128, 1), oph_densify(ru, 128, 1)
    )


def test_oph_empty_rows_deterministic_and_equal():
    from lshdedup.hashing import oph_signatures

    sig = oph_signatures(np.empty(0, dtype=np.uint64), np.array([0, 0]), 128, seed=1)
    assert np.array_equal(sig[0], sig[1])  # two empty docs are identical
    assert (sig < np.uint64(1 << 62)).all()


def test_scratch_shrinks_after_sustained_small_requests():
    import numpy as np

    from lshdedup.hashing import _SCRATCH, scratch

    key = "_test_shrink"
    big = scratch(key, (2_000_000,), np.uint64)  # 16 MB
    assert _SCRATCH[key].nbytes >= 16_000_000
    # one small request (a task's final partial batch) must NOT shrink
    scratch(key, (1000,), np.uint64)
    assert _SCRATCH[key].nbytes >= 16_000_000
    # sustained small working set DOES shrink
    for _ in range(8):
        scratch(key, (1000,), np.uint64)
    assert _SCRATCH[key].nbytes < 1_000_000
    # and correctness is unaffected
    buf = scratch(key, (1000,), np.uint64)
    buf[:] = 7
    assert (scratch(key, (1000,), np.uint64) == 7).all()
    _SCRATCH.pop(key, None)


def test_minhash_segments_unique_gather_path_equal():
    """The batch gram-dedup fast path (unique + gather) must be value-equal
    to the direct per-position math, with and without the 32-bit mask."""
    import numpy as np

    from lshdedup.hashing import generate_permutations, minhash_segments

    rng = np.random.default_rng(9)
    a, b = generate_permutations(32, 1)
    # heavy duplication → unique path triggers
    pool = rng.integers(0, 2**61, size=50, dtype=np.uint64)
    hashes = pool[rng.integers(0, 50, size=4000)]
    bounds = np.array([[0, 1500], [1500, 1501], [1501, 4000]], dtype=np.int64)
    # mostly-unique → direct path
    hashes_u = rng.integers(0, 2**61, size=4000, dtype=np.uint64)
    for hs in (hashes, hashes_u):
        for vmask in (None, 0xFFFFFFFF):
            got = minhash_segments(hs, bounds, a, b, vmask=vmask)
            # independent reference: per-segment full-matrix math
            for i, (s, e) in enumerate(bounds):
                t = (a[None, :] * hs[s:e, None] + b[None, :]) % np.uint64((1 << 61) - 1)
                if vmask is not None:
                    t = t & np.uint64(vmask)
                assert np.array_equal(got[i], t.min(axis=0)), (i, vmask)


def test_series_grams_matches_list_path():
    """Arrow-native series_grams (r5) must produce byte-identical gram
    hashes and bounds to the list-of-bytes path, including nulls (→ ""),
    <k zero-padding, unicode multibyte, and empty batches."""
    import pandas as pd

    from lshdedup.hashing import series_grams

    texts = ["hello world", None, "ab", "", "héllo wörld ünïcode", "exact", "x" * 500]
    k = 5
    as_bytes = [(t or "").encode("utf-8") for t in texts]
    flat_ref, bounds_ref = char_shingle_hashes(as_bytes, k)
    flat, bounds, data, offs = series_grams(pd.Series(texts), k)
    assert (bounds == bounds_ref).all()
    assert (flat == flat_ref).all()
    # data/offs expose original row bytes (for the kperm-ref <k fixup)
    for i, t in enumerate(as_bytes):
        assert data[offs[i] : offs[i + 1]].tobytes() == t
    # all-long batch takes the zero-copy path; still identical
    long_texts = ["abcdefgh", "12345678", "the quick brown fox"]
    f2r, b2r = char_shingle_hashes([t.encode() for t in long_texts], 3)
    f2, b2, _, _ = series_grams(pd.Series(long_texts), 3)
    assert (f2 == f2r).all() and (b2 == b2r).all()
    # empty batch
    f3, b3, _, _ = series_grams(pd.Series([], dtype=object), 4)
    assert f3.size == 0 and b3.shape == (0, 2)
    # all-empty-string batch (every row padded)
    f4, b4, _, _ = series_grams(pd.Series(["", None, ""]), 4)
    f4r, b4r = char_shingle_hashes([b"", b"", b""], 4)
    assert (f4 == f4r).all() and (b4 == b4r).all()
