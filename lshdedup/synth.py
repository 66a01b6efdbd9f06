"""Deterministic synthetic image+caption corpus with planted dup clusters.

Mirrors the reference's bootstrap_data (data_loader.h:63-105: population of
stringified ints, per-row sample of seeded random size, fixed seeds) and
extends it to the graft's input shape (BASELINE.json input_hint):
``(image_id, bytes, w, h, fmt, caption, phash)``.

Determinism is PER ROW, not per partition: every row's content derives from
``splitmix64(seed ⊕ row_index)``, so the corpus is identical under any
partitioning/parallelism — the property the scaling benchmark and the
determinism test rely on.  Generation runs distributed via mapInPandas over
``spark.range``; the planted truth is recomputed driver-side from the same
row functions (no data movement).

Planting scheme: rows are grouped in fixed blocks of ``block`` (default 8);
a seeded draw picks the cluster size s (geometric-ish, 1..block); rows
j < s of the block duplicate row j=0 at a seeded similarity level from
``levels`` — 1.0 = exact dup (caption equal, pixels re-encoded →
PSNR ≥ 40 dB), < 1.0 = token-replacement near-dup targeting that Jaccard.
Rows j ≥ s are independent singletons.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lshdedup.codec import decode_image, encode_image, phash64

MASK64 = (1 << 64) - 1


def splitmix64_scalar(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


# bump when the generator's OUTPUT changes for a fixed SynthConfig — cache
# paths (bench.run_scaling) embed it so stale corpora are never reused
SYNTH_SCHEMA_VERSION = 1


@dataclass(frozen=True)
class SynthConfig:
    n_rows: int = 1000
    seed: int = 42
    block: int = 8                      # max cluster size
    img_size: int = 16
    token_population: int = 500          # data_loader.h:73 population
    cap_len_min: int = 10                # data_loader.h:66 U[10,500]; shortened
    cap_len_max: int = 100
    levels: tuple = (1.0, 1.0, 0.9, 0.7, 0.5)  # planted similarity levels
    lossy_fraction: float = 0.4          # share of rows stored as fmt="qnt"


IMAGE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)


def _cluster_size(base: int, scfg: SynthConfig) -> int:
    """Seeded cluster size for the block starting at ``base`` (1..block)."""
    u = splitmix64_scalar(scfg.seed * 0x9E3779B9 + base) % 128
    for size, cut in ((1, 64), (2, 96), (3, 112), (4, 120), (5, 124), (6, 126), (7, 127)):
        if u < cut:
            return min(size, scfg.block)
    return min(8, scfg.block)


def _row_role(i: int, scfg: SynthConfig) -> tuple[int, int, float]:
    """(base_row, member_index, level) — base_row == i for originals."""
    base = i - (i % scfg.block)
    j = i % scfg.block
    s = _cluster_size(base, scfg)
    if j == 0 or j >= s:
        return i, 0, 1.0
    lv = scfg.levels[
        splitmix64_scalar(scfg.seed ^ (base * scfg.block + j) * 0x51ED) % len(scfg.levels)
    ]
    return base, j, lv


def _original_content(i: int, scfg: SynthConfig) -> tuple[list[str], np.ndarray, str]:
    """Deterministic (tokens, pixels, fmt) for an original row."""
    rng = np.random.Generator(np.random.PCG64(splitmix64_scalar(scfg.seed ^ (i * 0xABCD))))
    length = int(rng.integers(scfg.cap_len_min, scfg.cap_len_max + 1))
    tokens = [f"t{v}" for v in rng.integers(0, scfg.token_population, size=length)]
    pixels = rng.integers(0, 256, size=(scfg.img_size, scfg.img_size), dtype=np.uint8)
    fmt = "qnt" if rng.random() < scfg.lossy_fraction else "raw"
    return tokens, pixels, fmt


def _derive_dup(
    tokens: list[str], pixels: np.ndarray, i: int, level: float, scfg: SynthConfig
) -> tuple[list[str], np.ndarray, str]:
    """Duplicate content at target token-set Jaccard ``level``.

    Replacing c of m tokens gives J ≈ (m−c)/(m+c) → c = m(1−J)/(1+J).
    Pixels stay identical (re-encoded, possibly lossily) so the image
    channel sees exact/near-exact phash matches.
    """
    rng = np.random.Generator(np.random.PCG64(splitmix64_scalar(scfg.seed ^ (i * 0xD1F))))
    fmt = "qnt" if rng.random() < scfg.lossy_fraction else "raw"
    if level >= 1.0:
        return list(tokens), pixels, fmt
    m = len(tokens)
    c = int(round(m * (1.0 - level) / (1.0 + level)))
    out = list(tokens)
    if c > 0:
        pos = rng.choice(m, size=min(c, m), replace=False)
        fresh = rng.integers(scfg.token_population, scfg.token_population * 2, size=len(pos))
        for p, v in zip(pos, fresh):
            out[p] = f"t{v}"
    return out, pixels, fmt


def _make_row(i: int, scfg: SynthConfig) -> tuple:
    base, j, level = _row_role(i, scfg)
    tokens, pixels, fmt = _original_content(base, scfg)
    if j > 0:
        tokens, pixels, fmt = _derive_dup(tokens, pixels, i, level, scfg)
    caption = " ".join(tokens)
    data = encode_image(pixels, fmt)
    ph = phash64(decode_image(data))  # phash of STORED content
    return (
        f"img{i:010d}",
        bytearray(data),
        scfg.img_size,
        scfg.img_size,
        fmt,
        caption,
        ph,
    )


def synth_corpus(spark: SparkSession, scfg: SynthConfig, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: mapInPandas over spark.range."""
    n, block = scfg.n_rows, scfg.block

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_make_row(int(i), scfg) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=IMAGE_SCHEMA.fieldNames())

    rng_df = spark.range(0, n, 1, partitions or max(2, n // 2000))
    return rng_df.mapInPandas(gen, IMAGE_SCHEMA)


def corpus_local(scfg: SynthConfig) -> pd.DataFrame:
    """Driver-side generation of the identical corpus (tests/oracles)."""
    rows = [_make_row(i, scfg) for i in range(scfg.n_rows)]
    return pd.DataFrame(rows, columns=IMAGE_SCHEMA.fieldNames())


def truth_pairs_local(scfg: SynthConfig, min_level: float = 0.0) -> pd.DataFrame:
    """Planted dup pairs (id_a < id_b, level) — all intra-cluster pairs;
    pair level = min of the two members' levels vs the base."""
    recs = []
    for base in range(0, scfg.n_rows, scfg.block):
        s = _cluster_size(base, scfg)
        members = []
        for j in range(min(s, scfg.n_rows - base)):
            i = base + j
            _, _, level = _row_role(i, scfg)
            members.append((i, level))
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ia, la = members[x]
                ib, lb = members[y]
                lv = min(la, lb)
                if lv >= min_level:
                    recs.append((f"img{ia:010d}", f"img{ib:010d}", lv))
    return pd.DataFrame(recs, columns=["id_a", "id_b", "level"])


def truth_clusters_local(scfg: SynthConfig) -> pd.DataFrame:
    """(image_id, cluster_id) ground truth; singletons cluster with selves."""
    recs = []
    for base in range(0, scfg.n_rows, scfg.block):
        s = _cluster_size(base, scfg)
        for j in range(min(scfg.block, scfg.n_rows - base)):
            i = base + j
            cid = base if j < s else i
            recs.append((f"img{i:010d}", f"img{cid:010d}"))
    return pd.DataFrame(recs, columns=["image_id", "cluster_id"])
