"""Synthetic token-set corpus generator — the reference's bootstrap_data
(data_loader.h:63-105): population of stringified ints, per-row sample of
seeded-random size U[min,max], train + test split where every test set is
drawn from the train population (so each query has exact matches), fixed
seeds.

Used by the statistical recall/F1 benchmark (lsh_benchmark.h:131-166
analogue) in tests and bench.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def bootstrap_sets(
    n_train: int = 1000,
    n_test: int = 100,
    population: int = 500,
    size_range: tuple[int, int] = (10, 500),
    seed_sizes: int = 1,
    seed_sample: int = 42,
) -> pd.DataFrame:
    """(set_id, tokens, is_test).  Test sets are exact copies of sampled
    train sets — every query has at-least-one exact-match truth, exactly
    the reference's split (data_loader.h:92-104)."""
    rng_size = np.random.Generator(np.random.PCG64(seed_sizes))
    rng_samp = np.random.Generator(np.random.PCG64(seed_sample))
    pop = [str(i) for i in range(population)]
    rows = []
    train_tokens = []
    for i in range(n_train):
        size = int(rng_size.integers(size_range[0], size_range[1] + 1))
        toks = list(rng_samp.choice(pop, size=min(size, population), replace=False))
        train_tokens.append(toks)
        rows.append((i, toks, False))
    picks = rng_samp.choice(n_train, size=n_test, replace=False)
    for j, src in enumerate(picks):
        rows.append((n_train + j, list(train_tokens[int(src)]), True))
    return pd.DataFrame(rows, columns=["set_id", "tokens", "is_test"])


def bootstrap_df(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.createDataFrame(bootstrap_sets(**kwargs))
