"""Weighted MinHash — Ioffe consistent weighted sampling (CWS).

Re-expresses the reference's WeightMinHash (weight_minhash.h):
  * RandomSample (weight_minhash.h:12-35): dense (dim × sample_size)
    matrices r ~ Gamma(2,1), ln_c ~ ln Gamma(2,1), beta ~ U(0,1), seeded —
    generated once driver-side and closed over / broadcast into the UDF;
  * update (weight_minhash.h:78-106): t_k = ⌊ln w / r_k + β⌋,
    ln_y = (t_k − β)·r_k, ln_a = ln_c − ln_y − r_k, k* = argmin ln_a,
    emit (k*, t_{k*}); zero-weight dims excluded; all-zero vector → null
    (the reference's update returns false);
  * estimator (weight_minhash.h:262-273): fraction of samples whose
    (k*, t) pairs match;
  * generalized Jaccard Σmin/Σmax (weight_minhash.h:284-319) as the oracle.

The sparse/set variant's order-dependent position map
(weight_minhash.h:165-168, 186-188) is deliberately NOT replicated — it is
irreproducible under partitioning; set inputs are positioned by a
content-derived hash instead (the reference's own TODO,
lsh_cosine_similarity.h:12-23, agrees).

Samples are (k*, t) pairs packed into one int64 (k in the high 32 bits,
zig-zagged t in the low 32) so a signature is a plain array<long> and the
estimator is lane equality — same comparison semantics as the pair.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# zero-weight stand-in (weight_minhash.h:85): numeric_limits<float>::min()
# = 2^-126 exactly (a truncated literal like 1.175494e-38 rounds to a
# DENORMAL below FLT_MIN and would break bit-parity)
FLT_MIN = np.finfo(np.float32).tiny


@lru_cache(maxsize=4)
def random_samples(dim: int, sample_size: int, seed: int = 1, scheme: str = "pcg64"):
    """Dense CWS sample matrices (weight_minhash.h:12-35).

    scheme="pcg64" (default): fast vectorized PCG64 draws — statistically
    equivalent, the scale path.
    scheme="ref": the reference's EXACT float32 matrices — mt19937_64 +
    libstdc++-12 gamma/normal/uniform_real<float> reproduced bit-for-bit
    (refrng.ref_random_samples, pinned against a compiled-C++ golden) and
    upcast to float64 for the CWS math.  Two (documented) differences
    from the reference remain on the default path: (1) update-arithmetic
    precision — the reference computes t/ln_a in Eigen float32, this
    engine in float64; (2) zero-weight handling — the reference
    substitutes FLT_MIN for zero weights and keeps those dims in the
    argmin (weight_minhash.h:85-95) while this engine excludes them
    (active = w > 0), so in pathological cases (extreme r draws,
    denormal-scale weights) k* could differ.  scheme="ref" therefore
    guarantees matrix parity, not full signature parity; use
    wminhash_dense_f32ref for bit-exact update semantics as well."""
    if scheme == "ref":
        from lshdedup.refrng import ref_random_samples

        r32, c32, b32 = ref_random_samples(dim, sample_size, seed)
        return (
            r32.astype(np.float64),
            c32.astype(np.float64),
            b32.astype(np.float64),
        )
    rng = np.random.Generator(np.random.PCG64(seed))
    r = rng.gamma(2.0, 1.0, size=(dim, sample_size))
    ln_c = np.log(rng.gamma(2.0, 1.0, size=(dim, sample_size)))
    beta = rng.uniform(0.0, 1.0, size=(dim, sample_size))
    return r, ln_c, beta


def _pack(k: np.ndarray, t: np.ndarray) -> np.ndarray:
    tz = (np.abs(t.astype(np.int64)) << 1) | (t < 0)  # zig-zag
    return (k.astype(np.int64) << 32) | tz


def wminhash_dense(
    weights: np.ndarray, dim: int, sample_size: int, seed: int = 1,
    scheme: str = "pcg64",
):
    """CWS signature of one dense weight vector → packed (k*, t) int64
    array, or None for an all-zero vector (update fails,
    weight_minhash.h:80-83).  scheme="ref" uses the reference's bit-exact
    sample matrices (see random_samples)."""
    r, ln_c, beta = random_samples(dim, sample_size, seed, scheme)
    w = np.asarray(weights, dtype=np.float64)
    active = np.flatnonzero(w > 0)
    if active.size == 0:
        return None
    lw = np.log(w[active])[:, None]
    ra, ca, ba = r[active], ln_c[active], beta[active]
    t = np.floor(lw / ra + ba)
    ln_y = (t - ba) * ra
    ln_a = ca - ln_y - ra
    k_star = np.argmin(ln_a, axis=0)
    cols = np.arange(sample_size)
    return _pack(active[k_star], t[k_star, cols])


def wminhash_dense_f32ref(
    weights, dim: int, sample_size: int, seed: int = 1
):
    """Bit-exact float32 realization of the reference's dense update
    (weight_minhash.h:78-106): zero weights → FLT_MIN substitution KEPT
    in the argmin (not excluded), every op in IEEE float32, log = glibc
    logf — the scalar-libm semantics pinned end-to-end by the compiled
    golden tools/capture_ref_wmh.cpp → tests/fixtures/ref_wmh_golden.json.
    Returns (k*, t) int64 arrays, or None for an all-zero vector (update
    returns false, weight_minhash.h:80-83).

    This is the parity-audit path; the scale path (wminhash_batch) keeps
    float64 + zero-exclusion.  Caveat: a reference binary built with
    Eigen SIMD packet-math log() could differ from glibc logf by ulps —
    the sample matrices are bit-exact either way."""
    from lshdedup.refrng import _logf, ref_random_samples

    r, ln_c, beta = ref_random_samples(dim, sample_size, seed)  # float32
    w = np.asarray(weights, dtype=np.float32)
    if not np.any(w != 0):
        return None
    w = np.where(w == 0, FLT_MIN, w)
    lw = np.array([_logf(x) for x in w], dtype=np.float32)[:, None]
    t = np.floor(lw / r + beta)          # all float32, matches Eigen ArrayXf
    ln_y = (t - beta) * r
    ln_a = ln_c - ln_y - r
    k = np.argmin(ln_a, axis=0)          # first-min, same as minCoeff
    cols = np.arange(sample_size)
    return k.astype(np.int64), t[k, cols].astype(np.int64)


def wminhash_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of matching samples (weight_minhash.h:262-273)."""
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))


def generalized_jaccard(w_a: np.ndarray, w_b: np.ndarray) -> float:
    """Σ min(a,b) / Σ max(a,b) on aligned vectors (weight_minhash.h:284-294)."""
    a = np.asarray(w_a, dtype=np.float64)
    b = np.asarray(w_b, dtype=np.float64)
    denom = np.maximum(a, b).sum()
    return float(np.minimum(a, b).sum() / denom) if denom > 0 else 1.0


def generalized_jaccard_maps(ma: dict, mb: dict) -> float:
    """Set/map variant (weight_minhash.h:301-319)."""
    keys = set(ma) | set(mb)
    num = sum(min(ma.get(k, 0), mb.get(k, 0)) for k in keys)
    den = sum(max(ma.get(k, 0), mb.get(k, 0)) for k in keys)
    return num / den if den else 1.0


def wminhash_batch(
    idx: np.ndarray,
    w: np.ndarray,
    lens: np.ndarray,
    dim: int,
    sample_size: int,
    seed: int = 1,
    chunk_rows: int = 64,
    scheme: str = "pcg64",
):
    """Batched CWS over a ragged sparse batch — the vectorized form of
    calling wminhash_dense per row (identical outputs, pinned by
    tests/test_wminhash.py).

    idx  : (total,) int64 — active dimension indices, rows concatenated
           (row i owns the slice after its predecessors' ``lens``);
    w    : (total,) float64 — weights > 0 aligned with ``idx``;
    lens : (n_rows,) int64 — active count per row (0 → None signature).

    Rows are padded to the chunk's max active count and the whole chunk's
    (rows, A_max, sample_size) CWS tensor is computed in one numpy pass;
    pad lanes carry ln_a = +inf so argmin never selects them.  Per-chunk
    tensors are bounded (chunk_rows × A_max × S) so worker memory stays
    flat regardless of batch size.
    """
    r_all, ln_c_all, beta_all = random_samples(dim, sample_size, seed, scheme)
    n = lens.shape[0]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out: list = [None] * n
    cols = np.arange(sample_size)
    for c0 in range(0, n, chunk_rows):
        c1 = min(c0 + chunk_rows, n)
        cl = lens[c0:c1]
        amax = int(cl.max()) if cl.size else 0
        if amax == 0:
            continue
        rows = c1 - c0
        pad_w = np.zeros((rows, amax), dtype=np.float64)
        pad_i = np.zeros((rows, amax), dtype=np.int64)
        rr = np.repeat(np.arange(rows), cl)
        cc = np.arange(int(cl.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(cl[:-1]))), cl
        )
        seg = slice(offs[c0], offs[c1])
        pad_w[rr, cc] = w[seg]
        pad_i[rr, cc] = idx[seg]
        with np.errstate(divide="ignore", invalid="ignore"):
            lw = np.log(pad_w)[:, :, None]           # -inf on pads
            rg = r_all[pad_i]                        # (rows, amax, S)
            cg = ln_c_all[pad_i]
            bg = beta_all[pad_i]
            t = np.floor(lw / rg + bg)
            ln_a = cg - (t - bg) * rg - rg
        ln_a[pad_w <= 0] = np.inf                    # pads + zero weights
        k_arg = np.argmin(ln_a, axis=1)              # (rows, S)
        row_ix = np.arange(rows)[:, None]
        k_star = pad_i[row_ix, k_arg]
        t_sel = t[row_ix, k_arg, cols[None, :]]
        # rows with zero active dims in this chunk select pad lanes
        # (t = ±inf/NaN); they are discarded below — zero them so the
        # int64 cast in _pack stays warning-free
        t_sel = np.where(np.isfinite(t_sel), t_sel, 0.0)
        packed = _pack(k_star, t_sel)
        for j in range(rows):
            if cl[j] > 0:
                out[c0 + j] = packed[j]
    return out


def _dense_batch_to_sparse(batch: pd.Series):
    """pd.Series of dense float arrays → ragged (idx, w, lens) of the
    strictly-positive entries (None rows → lens 0).

    No per-row Python: the Series converts to an Arrow ListArray in C,
    then one flat ``> 0`` mask + bincount recovers per-row active counts
    and within-row positions (flatten() is row-major, so idx stays
    ascending per row — same order as np.flatnonzero in the scalar
    path)."""
    import pyarrow as pa

    n = len(batch)
    arr = pa.array(batch, type=pa.list_(pa.float64()), from_pandas=True)
    per_row = (
        arr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if int(per_row.sum()) != len(flat):
        raise ValueError(
            f"list lengths ({int(per_row.sum())}) disagree with flattened "
            f"values ({len(flat)})"
        )
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(per_row[:-1], out=starts[1:])
    within = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, per_row)
    act = flat > 0
    lens = np.bincount(rows[act], minlength=n).astype(np.int64)
    return within[act], flat[act], lens


def wminhash_udf(dim: int, sample_size: int, seed: int = 1):
    """pandas UDF: array<float> dense weights → array<long> packed CWS
    signature (null for all-zero rows).  The sample matrices regenerate
    deterministically per executor (seeded) — the broadcast-free equivalent
    of broadcasting RandomSample.  One vectorized CWS pass per Arrow batch
    (wminhash_batch) — no per-row Python in the hot loop."""

    @F.pandas_udf(ArrayType(LongType()))
    def wmh(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            idx, w, lens = _dense_batch_to_sparse(batch)
            sigs = wminhash_batch(idx, w, lens, dim, sample_size, seed)
            yield pd.Series(
                [None if s is None else list(s) for s in sigs], dtype=object
            )

    return wmh


def weights_to_dense(weights: dict, dim: int, seed: int = 1) -> np.ndarray:
    """Project a {token: weight} map onto a dense dim-vector by CONTENT-
    derived position hash(token) mod dim (collisions sum).

    This replaces the reference's set-based WeightMinHash position map
    (weight_minhash.h:186-188), which assigns positions by encounter order —
    order-dependent and irreproducible under partitioning; the reference's
    own TODO (lsh_cosine_similarity.h:12-23) calls for exactly this fix.
    """
    from lshdedup.hashing import fnv1a_bytes

    v = np.zeros(dim, dtype=np.float64)
    for tok, w in weights.items():
        v[fnv1a_bytes(str(tok).encode("utf-8"), seed) % dim] += float(w)
    return v


def wminhash_set(weights: dict, dim: int, sample_size: int, seed: int = 1):
    """CWS signature of a sparse {token: weight} map (set-based variant,
    weight_minhash.h:173-243) via the content-derived dense projection."""
    return wminhash_dense(weights_to_dense(weights, dim, seed), dim, sample_size, seed)


def _maps_batch_to_sparse(batch: pd.Series, dim: int, seed: int):
    """pd.Series of {token: weight} maps → ragged (idx, w, lens) with NO
    Python-level per-row/per-token iteration: the Series converts to an
    Arrow MapArray in C (pa.array), whose flattened UTF-8 key buffer +
    offsets feed ONE fnv1a_flat pass (content-derived positions, same hash
    as weights_to_dense), then np.unique + add.at combines colliding
    positions per row.  idx ascending within each row (matches
    flatnonzero order, so argmin tie-breaks identically to the scalar
    path)."""
    import pyarrow as pa

    from lshdedup.hashing import fnv1a_flat

    n = len(batch)
    lens = np.zeros(n, dtype=np.int64)
    arr = pa.array(batch, type=pa.map_(pa.string(), pa.float64()), from_pandas=True)
    moffs = arr.offsets.to_numpy().astype(np.int64)
    per_row = np.diff(moffs)  # tokens per row (0 for null/empty maps)
    if int(per_row.sum()) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), lens
    keys = arr.keys
    # freshly-built arrays are dense: the child holds exactly the ranged
    # entries, so row attribution is a plain repeat over the offsets.
    # ValueError (not assert) — stripped asserts under -O would let a
    # sliced MapArray silently mis-attribute tokens to rows.
    if moffs[0] != 0 or moffs[-1] != len(keys):
        raise ValueError(
            "non-dense MapArray child (sliced input?): offsets "
            f"[{moffs[0]}, {moffs[-1]}] vs {len(keys)} keys"
        )
    if arr.items.null_count:
        # fail loudly like the scalar path's float(None) did — a null
        # weight silently becoming NaN would be dropped by the acc > 0
        # filter and take valid colliding weights with it
        raise TypeError("null weight value in token map")
    ws = arr.items.to_numpy(zero_copy_only=False).astype(np.float64)
    koffs = np.frombuffer(keys.buffers()[1], dtype=np.int32).astype(np.int64)
    koffs = koffs[keys.offset : keys.offset + len(keys) + 1]
    kbuf = (
        np.frombuffer(keys.buffers()[2], dtype=np.uint8)
        if keys.buffers()[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    rows = np.repeat(np.arange(n, dtype=np.int64), per_row)
    pos = (
        fnv1a_flat(kbuf, koffs[:-1], np.diff(koffs), seed) % np.uint64(dim)
    ).astype(np.int64)
    key = rows * dim + pos
    ukey, inv = np.unique(key, return_inverse=True)
    acc = np.zeros(ukey.size, dtype=np.float64)
    np.add.at(acc, inv, ws)
    keep = acc > 0
    ukey, acc = ukey[keep], acc[keep]
    urow = ukey // dim
    np.add.at(lens, urow, 1)
    return (ukey % dim).astype(np.int64), acc, lens


def wminhash_set_udf(dim: int, sample_size: int, seed: int = 1):
    """pandas UDF: map<string,int> token weights → array<long> packed CWS
    signature (null for empty/all-zero maps).  Map unpacking (Arrow
    offsets), token hashing (fnv1a_flat), and CWS (wminhash_batch) all run
    once per Arrow batch — no Python-level per-row or per-token loops."""

    @F.pandas_udf(ArrayType(LongType()))
    def wmh(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            idx, w, lens = _maps_batch_to_sparse(batch, dim, seed)
            sigs = wminhash_batch(idx, w, lens, dim, sample_size, seed)
            yield pd.Series(
                [None if s is None else list(s) for s in sigs], dtype=object
            )

    return wmh


def generalized_jaccard_expr(a, b):
    """Native Σmin/Σmax on two equal-length array columns — the exact
    oracle as a codegen expression (zip_with + aggregate)."""
    mins = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.least(x, y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    maxs = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.greatest(x, y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(maxs == 0, F.lit(1.0)).otherwise(mins / maxs)
