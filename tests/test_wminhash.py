"""Weighted MinHash semantics (weight_minhash.h; test.h:166-229 fixtures)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lshdedup.wminhash import (
    generalized_jaccard,
    generalized_jaccard_expr,
    generalized_jaccard_maps,
    wminhash_dense,
    wminhash_estimate,
    wminhash_udf,
)

# the fixed vectors of test_weight_minhash (test.h:167-168)
DATA1 = [1, 3, 4, 5, 6, 7, 8, 9, 10, 4]
DATA2 = [1, 3, 4, 5, 6, 7, 8, 9, 10, 5]


def test_generalized_jaccard_known_values():
    """Documented 4/8 = 0.5 example (weight_minhash.h:277-283)."""
    assert generalized_jaccard_maps({"a": 1, "b": 3}, {"a": 3, "c": 1}) == pytest.approx(
        (1 + 0) / (3 + 3 + 1)
    )
    got = generalized_jaccard(np.array(DATA1), np.array(DATA2))
    expected = sum(min(a, b) for a, b in zip(DATA1, DATA2)) / sum(
        max(a, b) for a, b in zip(DATA1, DATA2)
    )
    assert got == pytest.approx(expected)


def test_estimate_close_to_exact():
    """WMH estimate within sampling error of generalized Jaccard
    (weight_minhash_benchmark.h methodology: err ≤ ~0.03 @ 160 samples —
    we allow 4σ)."""
    dim, m = len(DATA1), 512
    s1 = wminhash_dense(np.array(DATA1, dtype=float), dim, m)
    s2 = wminhash_dense(np.array(DATA2, dtype=float), dim, m)
    est = wminhash_estimate(s1, s2)
    exact = generalized_jaccard(np.array(DATA1), np.array(DATA2))
    assert est == pytest.approx(exact, abs=4 * np.sqrt(exact * (1 - exact) / m))


def test_identical_vectors_estimate_one():
    s = wminhash_dense(np.array(DATA1, dtype=float), len(DATA1), 64)
    assert wminhash_estimate(s, s) == 1.0


def test_all_zero_update_fails():
    """All-zero weight vector → update fails (weight_minhash.h:80-83)."""
    assert wminhash_dense(np.zeros(8), 8, 32) is None


def test_random_vectors_error_bound():
    """Mean abs error over seeded random dense vectors, mirroring
    weight_minhash_benchmark.h:51-86."""
    rng = np.random.Generator(np.random.PCG64(5))
    dim, m = 200, 256
    errs = []
    for _ in range(20):
        a = rng.uniform(0, 10, dim)
        b = rng.uniform(0, 10, dim)
        sa = wminhash_dense(a, dim, m)
        sb = wminhash_dense(b, dim, m)
        errs.append(abs(wminhash_estimate(sa, sb) - generalized_jaccard(a, b)))
    assert np.mean(errs) < 0.05


def test_spark_udf_and_expr(spark):
    dim = len(DATA1)
    df = spark.createDataFrame(
        [([float(x) for x in DATA1], [float(x) for x in DATA2]), (None, None)],
        "a array<float>, b array<float>",
    )
    out = df.withColumn("sig_a", wminhash_udf(dim, 128)(F.col("a"))).withColumn(
        "gj", generalized_jaccard_expr(F.col("a").cast("array<double>"), F.col("b").cast("array<double>"))
    )
    rows = out.collect()
    want = wminhash_dense(np.array(DATA1, dtype=np.float32), dim, 128)
    assert rows[0]["sig_a"] == list(want)
    exact = generalized_jaccard(np.array(DATA1), np.array(DATA2))
    assert rows[0]["gj"] == pytest.approx(exact)
    assert rows[1]["sig_a"] is None


def test_set_variant_order_independent_and_tracks_oracle():
    """Content-derived positions: identical maps in any insertion order give
    identical signatures (the reference's encounter-order position map does
    NOT — weight_minhash.h:165-168); estimate tracks generalized Jaccard."""
    import numpy as np

    from lshdedup.wminhash import (
        generalized_jaccard_maps,
        wminhash_estimate,
        wminhash_set,
    )

    m1 = {"alpha": 3.0, "beta": 1.0, "gamma": 2.0}
    m2 = dict(reversed(list(m1.items())))
    assert np.array_equal(wminhash_set(m1, 512, 64), wminhash_set(m2, 512, 64))

    ma = {f"t{i}": float(i % 5 + 1) for i in range(40)}
    mb = {f"t{i}": float(i % 5 + 1) for i in range(20, 60)}
    est = wminhash_estimate(
        wminhash_set(ma, 2048, 256), wminhash_set(mb, 2048, 256)
    )
    exact = generalized_jaccard_maps(ma, mb)
    assert abs(est - exact) < 0.12, (est, exact)


def test_batch_equals_scalar_dense():
    """wminhash_batch output is element-identical to per-row
    wminhash_dense (the vectorization changed the loop, not the math)."""
    from lshdedup.wminhash import wminhash_batch

    rng = np.random.Generator(np.random.PCG64(11))
    dim, m = 64, 128
    vecs = [rng.uniform(0, 3, size=dim) * (rng.uniform(size=dim) > 0.3)
            for _ in range(37)]
    vecs.append(np.zeros(dim))  # all-zero row → None
    idx_parts, w_parts, lens = [], [], []
    for v in vecs:
        act = np.flatnonzero(v > 0)
        lens.append(act.size)
        idx_parts.append(act.astype(np.int64))
        w_parts.append(v[act])
    sigs = wminhash_batch(
        np.concatenate(idx_parts), np.concatenate(w_parts),
        np.array(lens, dtype=np.int64), dim, m, seed=1, chunk_rows=7,
    )
    for v, got in zip(vecs, sigs):
        want = wminhash_dense(v, dim, m, seed=1)
        if want is None:
            assert got is None
        else:
            assert np.array_equal(got, want), v


def test_fnv_varlen_equals_scalar():
    from lshdedup.hashing import fnv1a_bytes, fnv1a_varlen

    toks = [b"", b"a", b"hello", b"some-longer-token-value", b"\x00\xff"]
    got = fnv1a_varlen(toks, seed=1)
    assert got.tolist() == [fnv1a_bytes(t, 1) for t in toks]


def test_maps_batch_equals_scalar_set_variant():
    """The batched map path equals per-row wminhash_set."""
    import pandas as pd

    from lshdedup.wminhash import (
        _maps_batch_to_sparse,
        wminhash_batch,
        wminhash_set,
    )

    maps = [
        {"the": 3, "cat": 1, "sat": 2},
        {"a": 1},
        {},
        None,
        {"x" * 40: 7, "y": 1, "the": 2},
    ]
    dim, m = 4096, 128
    idx, w, lens = _maps_batch_to_sparse(pd.Series(maps), dim, 1)
    sigs = wminhash_batch(idx, w, lens, dim, m, seed=1)
    for mp, got in zip(maps, sigs):
        if not mp:
            assert got is None
        else:
            want = wminhash_set(dict(mp), dim, m, seed=1)
            assert np.array_equal(got, want), mp


def test_fnv_varlen_grouped_matches_scalar():
    """Length-grouped processing (memory bound) is value-identical, even
    when one pathological long token forces multiple groups."""
    from lshdedup.hashing import fnv1a_bytes, fnv1a_varlen

    toks = [b"a" * n for n in (0, 1, 3, 500, 7, 7, 2)] + [b"x" * 10_000]
    got = fnv1a_varlen(toks, seed=1, max_matrix_bytes=4096)
    assert got.tolist() == [fnv1a_bytes(t, 1) for t in toks]
