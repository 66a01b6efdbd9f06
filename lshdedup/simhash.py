"""SimHash fingerprints — the near-exact caption path (graft addition).

NOT in the reference (its only fingerprint is MinHash); required by the
north rule as an additional precision stage for near-exact caption overlap.
Charikar SimHash: each k-gram's 64-bit hash votes ±1 per bit, weighted by
occurrence count; the fingerprint is the sign vector packed into int64.
Near-exact duplicates differ in a handful of bits → verify with
``bit_count(a XOR b) <= max_hamming`` (native expr, no UDF).

Fully vectorized: one flat gram-hash array per Arrow batch, per-bit ±1
matrix, per-row np.add.reduceat — no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from lshdedup.config import DedupConfig
from lshdedup.hashing import char_shingle_hashes, series_grams


def simhash_batch(texts: list[bytes], k: int) -> np.ndarray:
    """(n,) int64 SimHash fingerprints for a batch of byte strings."""
    flat, bounds = char_shingle_hashes(texts, k)
    return simhash_from_grams(flat, bounds, len(texts))


def simhash_from_grams(flat: np.ndarray, bounds: np.ndarray, n: int) -> np.ndarray:
    """SimHash vote/threshold core over pre-computed gram hashes."""
    if flat.size == 0:
        return np.zeros(n, dtype=np.int64)
    g = flat.size
    shifts = np.arange(64, dtype=np.uint64)
    # worker-persistent scratch (see hashing.scratch): ±1 vote matrix with a
    # zero sentinel row so every reduceat index stays < len
    from lshdedup.hashing import scratch

    bits_u = scratch("sh_bits", (g, 64))
    np.right_shift(flat[:, None], shifts[None, :], out=bits_u)
    np.bitwise_and(bits_u, np.uint64(1), out=bits_u)
    votes = scratch("sh_votes", (g + 1, 64), np.int32)
    np.copyto(votes[:g], bits_u, casting="unsafe")
    np.multiply(votes[:g], 2, out=votes[:g])
    np.subtract(votes[:g], 1, out=votes[:g])
    votes[g] = 0
    idx = bounds.reshape(-1)
    sums = np.add.reduceat(votes, idx, axis=0)[::2]
    sign = (sums > 0).astype(np.uint64)
    packed = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        packed |= sign[:, j] << np.uint64(j)
    return packed.view(np.int64)


def simhash_udf(cfg: DedupConfig):
    """pandas UDF: caption string → int64 SimHash."""
    k = cfg.k

    @F.pandas_udf(LongType())
    def sh(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            # Arrow-native marshalling (hashing.series_grams) — no
            # per-row encode list-comp in the hot path (r5)
            flat, bounds, _, _ = series_grams(batch, k)
            yield pd.Series(simhash_from_grams(flat, bounds, len(batch)))

    return sh


def hamming_expr(a: Column, b: Column) -> Column:
    """popcount(a XOR b) — native bit_count, stays in codegen."""
    return F.bit_count(a.bitwiseXOR(b))
