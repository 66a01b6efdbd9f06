"""Bit-exact reference RNG + hash parity (`sig_scheme="kperm-ref"`).

The reference draws its MinHash permutation table with
``std::mt19937_64(1)`` through ``std::uniform_int_distribution<uint64_t>``
(RandomHashPermutation, minhash.h:25-67) and hashes elements with xxHash64
(hash.h:14-21, seed 0; the 32-bit variant folds ``% 2^31-1``,
hash.h:52-60).  This module reimplements all three from their public
specifications so the Spark engine can reproduce the reference's signatures
and LSH candidate sets bit-for-bit at identical config:

  * ``MT19937_64`` — the standardized Mersenne Twister (Matsumoto &
    Nishimura; parameters fixed by the C++ standard [rand.eng.mers]).
  * ``uniform_int_u64`` — libstdc++'s draw: for a 64-bit generator it uses
    Lemire's nearly-divisionless downscale ("Fast Random Integer Generation
    in an Interval", ACM TOMACS 2019) — the algorithm shipped since GCC 11.
    NOTE the C++ standard does NOT pin this mapping; the goldens in
    tests/fixtures/ref_rng_golden.json were captured by compiling
    tools/capture_ref_rng.cpp with the system g++ 12, and the pytest pins
    this implementation to those captured draws.
  * ``xxh64`` / ``xxh64_windows`` — XXH64 (Yann Collet, public spec),
    scalar + numpy-vectorized over fixed-width shingle windows; validated
    against the published empty-string vector and Spark's JVM xxhash64
    (seed 42) in tests/test_refparity.py.

The derived artifacts (``ref_permutations``, ``ref_minhash_wordset``,
``ref_band_hashes``) reproduce the reference's ``test_lsh_minhash`` fixture
(test.h:110-138): same (a,b) table, same 32-bit-folded signatures, same
band keys, same candidate set.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from lshdedup.config import MERSENNE_31, MERSENNE_61

_M64 = 0xFFFFFFFFFFFFFFFF

# ------------------------------------------------------------ mt19937_64 --
_N, _M = 312, 156
_MATRIX_A = 0xB5026F5AA96619E9
_UPPER = 0xFFFFFFFF80000000
_LOWER = 0x7FFFFFFF


class MT19937_64:
    """std::mt19937_64 ([rand.eng.mers] 64/312/156/31 engine)."""

    def __init__(self, seed: int = 1):
        mt = [0] * _N
        mt[0] = seed & _M64
        for i in range(1, _N):
            mt[i] = (6364136223846793005 * (mt[i - 1] ^ (mt[i - 1] >> 62)) + i) & _M64
        self._mt = mt
        self._idx = _N

    def _twist(self) -> None:
        mt = self._mt
        for i in range(_N):
            x = (mt[i] & _UPPER) | (mt[(i + 1) % _N] & _LOWER)
            mt[i] = mt[(i + _M) % _N] ^ (x >> 1) ^ (_MATRIX_A if x & 1 else 0)
        self._idx = 0

    def __call__(self) -> int:
        if self._idx >= _N:
            self._twist()
        y = self._mt[self._idx]
        self._idx += 1
        y ^= (y >> 29) & 0x5555555555555555
        y ^= (y << 17) & 0x71D67FFFEDA60000
        y ^= (y << 37) & 0xFFF7EEE000000000
        y ^= y >> 43
        return y & _M64


def uniform_int_u64(gen: MT19937_64, lo: int, hi: int) -> int:
    """libstdc++-12 ``uniform_int_distribution<uint64_t>(lo, hi)(gen)`` for
    a full-range 64-bit generator: Lemire downscale with 128-bit product
    (uniform_int_dist.h `_S_nd`, GCC >= 11)."""
    rng = hi - lo + 1  # < 2^64 for both reference distributions
    product = gen() * rng
    low = product & _M64
    if low < rng:
        threshold = (2**64 - rng) % rng  # -range % range in u64 arithmetic
        while low < threshold:
            product = gen() * rng
            low = product & _M64
    return (product >> 64) + lo


@lru_cache(maxsize=4)
def ref_permutations(n_perm: int = 128, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """The reference's exact (vector_a, vector_b): one mt19937_64(seed),
    dis_a(1, p-1) and dis_b(0, p-1) drawn alternately per index
    (minhash.h:58-66)."""
    gen = MT19937_64(seed)
    a = np.empty(n_perm, dtype=np.uint64)
    b = np.empty(n_perm, dtype=np.uint64)
    for i in range(n_perm):
        a[i] = uniform_int_u64(gen, 1, MERSENNE_61 - 1)
        b[i] = uniform_int_u64(gen, 0, MERSENNE_61 - 1)
    return a, b


# ----------------------------------------------------------------- XXH64 --
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 (public spec) — the reference's element hash family
    (xxh::xxhash<64>, hash.h:14-21)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


_U64 = np.uint64


def _rotl_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def xxh64_windows(windows: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of each row of an (n, k) uint8 matrix, k < 32 (the short-input
    path: no stripe accumulators), vectorized across all n rows — the
    batch form of hashing every k-shingle with the reference's hash family.
    Rows with k >= 32 fall back to the scalar implementation."""
    n, k = windows.shape
    if k >= 32:
        return np.fromiter(
            (xxh64(bytes(row), seed) for row in windows), count=n, dtype=_U64
        )
    h = np.full(n, (seed + _P5 + k) & _M64, dtype=_U64)
    i = 0
    while i + 8 <= k:
        w = np.ascontiguousarray(windows[:, i : i + 8]).view("<u8").ravel()
        k1 = _rotl_vec(w * _U64(_P2), 31) * _U64(_P1)
        h = _rotl_vec(h ^ k1, 27) * _U64(_P1) + _U64(_P4)
        i += 8
    if i + 4 <= k:
        w = np.ascontiguousarray(windows[:, i : i + 4]).view("<u4").ravel().astype(_U64)
        h = _rotl_vec(h ^ (w * _U64(_P1)), 23) * _U64(_P2) + _U64(_P3)
        i += 4
    while i < k:
        h = _rotl_vec(h ^ (windows[:, i].astype(_U64) * _U64(_P5)), 11) * _U64(_P1)
        i += 1
    h ^= h >> _U64(33)
    h *= _U64(_P2)
    h ^= h >> _U64(29)
    h *= _U64(_P3)
    h ^= h >> _U64(32)
    return h


# ------------------------------------------------- reference signature math --
def ref_element_hash(data: bytes, minhash_bits: int = 32) -> int:
    """XXStringViewHash32/64 (hash.h:52-60): xxh64 seed 0, folded
    ``% 2^31-1`` when the 32-bit variant is selected."""
    h = xxh64(data, 0)
    return h % MERSENNE_31 if minhash_bits == 32 else h


def ref_minhash_from_hashes(
    hashes: np.ndarray, n_perm: int = 128, seed: int = 1, minhash_bits: int = 32
) -> np.ndarray:
    """MinHash::update over a set of element hashes (minhash.h:135-169):
    lane j = min over elements of ``((a_j*h + b_j) mod 2^64 mod 2^61-1)
    & max_hash_range`` — the & 0xFFFFFFFF applies PER ELEMENT before the
    min when MinHashBits=32 (minhash.h:144-146), which changes which
    element wins; stored widened to uint64."""
    a, b = ref_permutations(n_perm, seed)
    h = np.asarray(hashes, dtype=_U64)
    t = a[None, :] * h[:, None]  # wraps mod 2^64
    t += b[None, :]
    t %= _U64(MERSENNE_61)
    if minhash_bits == 32:
        t &= _U64(0xFFFFFFFF)
    return t.min(axis=0)


def ref_minhash_wordset(
    words, n_perm: int = 128, seed: int = 1, minhash_bits: int = 32
) -> np.ndarray:
    """Signature of a set of strings with the reference's DEFAULT MinHash
    template (XXStringViewHash32, MinHashBits=32, n_permutation=128,
    Seed=1) — the test.h:110-138 fixture configuration."""
    hs = np.fromiter(
        (ref_element_hash(w.encode("utf-8"), minhash_bits) for w in set(words)),
        dtype=_U64,
    )
    return ref_minhash_from_hashes(hs, n_perm, seed, minhash_bits)


def ref_band_hashes(sig: np.ndarray, b: int, r: int) -> list[int]:
    """LSH band keys (lsh.h:112-124): XXUInt64Hash64 = xxh64 seed 0 over the
    raw little-endian bytes of hash_values[i*r : (i+1)*r]
    (hash.h:186-206)."""
    raw = np.asarray(sig, dtype="<u8").tobytes()
    return [xxh64(raw[i * r * 8 : (i + 1) * r * 8], 0) for i in range(b)]


def ref_lsh_query(query_sig: np.ndarray, corpus: dict, b: int, r: int) -> set:
    """LSH::query (lsh.h:146-159) over an in-memory corpus
    {label: signature}: labels sharing >= 1 band key with the query."""
    qk = set(ref_band_hashes(query_sig, b, r))
    out = set()
    for label, sig in corpus.items():
        if qk & set(ref_band_hashes(sig, b, r)):
            out.add(label)
    return out


# ------------------------------------------- libstdc++ <random> floats --
# Bit-exact reproduction of the float-distribution chain the reference's
# RandomSample (weight_minhash.h:12-35) draws from:
#   std::gamma_distribution<float>(2, 1)        (Marsaglia-Tsang)
#   std::normal_distribution<float>(0, 1)       (Marsaglia polar, cached)
#   std::uniform_real_distribution<float>(0, 1) (generate_canonical)
# as implemented by libstdc++ 12 (bits/random.tcc) compiled at default
# -O2 for baseline x86-64 (no FMA -> strict IEEE single ops; float ops
# emulated with np.float32 per-operation rounding, the C++ double
# promotions with Python floats, and std::log(float) with glibc logf via
# ctypes so every last ulp matches).  Goldens: tools/capture_ref_gamma.cpp
# -> tests/fixtures/ref_gamma_golden.json, pinned by test_refparity.py.

import ctypes
import ctypes.util as _ctypes_util

_F32 = np.float32
_TWO64_F = np.float32(18446744073709551616.0)
_ONE_MINUS_EPS_F = np.nextafter(np.float32(1.0), np.float32(0.0))


@lru_cache(maxsize=1)
def _libm_logf():
    libm = ctypes.CDLL(_ctypes_util.find_library("m") or "libm.so.6")
    fn = libm.logf
    fn.restype = ctypes.c_float
    fn.argtypes = [ctypes.c_float]
    return fn


def _logf(x) -> np.float32:
    """glibc logf — exactly std::log(float)."""
    return _F32(_libm_logf()(float(x)))


def canonical_f32(gen: MT19937_64) -> np.float32:
    """std::generate_canonical<float, 24, mt19937_64>: ONE raw draw,
    float(u64) / 2^64f, clamped below 1.0f (random.tcc:3354)."""
    s = np.uint64(gen()).astype(np.float32)  # direct u64->f32 C cast
    ret = _F32(s / _TWO64_F)
    return _ONE_MINUS_EPS_F if ret >= _F32(1.0) else ret


class NormalF32:
    """std::normal_distribution<float>(0,1): Marsaglia polar generating
    pairs, second value cached across calls (random.tcc:1808-1841)."""

    def __init__(self):
        self.saved: np.float32 | None = None

    def __call__(self, gen: MT19937_64) -> np.float32:
        if self.saved is not None:
            ret, self.saved = self.saved, None
            return ret
        while True:
            # 2.0f * canonical - 1.0 (double) stored to float == one
            # float rounding (the double intermediate is exact)
            x = _F32(_F32(_F32(2.0) * canonical_f32(gen)) - _F32(1.0))
            y = _F32(_F32(_F32(2.0) * canonical_f32(gen)) - _F32(1.0))
            r2 = _F32(_F32(x * x) + _F32(y * y))
            if not (r2 > _F32(1.0) or r2 == _F32(0.0)):
                break
        # sqrt(-2 * logf(r2) / r2): int(-2) promotes to float
        mult = _F32(np.sqrt(_F32(_F32(_F32(-2.0) * _logf(r2)) / r2)))
        self.saved = _F32(x * mult)
        return _F32(y * mult)


class GammaF32:
    """std::gamma_distribution<float>(alpha, 1) for alpha >= 1:
    Marsaglia-Tsang with the double-promoted acceptance comparisons of
    random.tcc:2360-2398.  Holds its own cached normal (as the C++ object
    does), so interleaving with other draws preserves the cache state."""

    def __init__(self, alpha: float = 2.0):
        assert alpha >= 1.0, "alpha<1 branch (pow) not needed by the reference"
        malpha = _F32(alpha)
        self.a1 = _F32(malpha - _F32(_F32(1.0) / _F32(3.0)))
        self.a2 = _F32(_F32(1.0) / _F32(np.sqrt(_F32(_F32(9.0) * self.a1))))
        self.nd = NormalF32()

    def __call__(self, gen: MT19937_64) -> np.float32:
        a1_d = float(self.a1)
        while True:
            while True:
                n = self.nd(gen)
                v = _F32(_F32(1.0) + _F32(self.a2 * n))
                if v > _F32(0.0):
                    break
            v = _F32(_F32(v * v) * v)
            u = canonical_f32(gen)
            n_d = float(n)
            cond1 = float(u) > 1.0 - 0.0331 * n_d * n_d * n_d * n_d
            if not cond1:
                break
            rhs = 0.5 * n_d * n_d + a1_d * ((1.0 - float(v)) + float(_logf(v)))
            if not (float(_logf(u)) > rhs):
                break
        return _F32(self.a1 * v)  # * beta(=1.0f)


def ref_random_samples(
    dim: int, sample_size: int, seed: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The reference RandomSample's exact (r_k, ln_c_k, beta_k) float32
    matrices (weight_minhash.h:22-33): one mt19937_64(seed), one shared
    gamma_distribution<float>(2,1) (its normal cache persists across the
    r and ln_c draws), one uniform_real_distribution<float>(0,1),
    column-major fill."""
    gen = MT19937_64(seed)
    gamma = GammaF32(2.0)
    r = np.empty((dim, sample_size), dtype=np.float32)
    ln_c = np.empty((dim, sample_size), dtype=np.float32)
    beta = np.empty((dim, sample_size), dtype=np.float32)
    for j in range(sample_size):
        for i in range(dim):
            r[i, j] = gamma(gen)
            ln_c[i, j] = _logf(gamma(gen))
            beta[i, j] = canonical_f32(gen)
    return r, ln_c, beta
