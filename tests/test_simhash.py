"""SimHash fingerprint semantics (graft near-exact caption path)."""

import numpy as np
from pyspark.sql import functions as F

from lshdedup.config import DedupConfig
from lshdedup.simhash import hamming_expr, simhash_batch, simhash_udf


def test_identical_zero_hamming():
    s = simhash_batch([b"the same text", b"the same text"], 4)
    assert s[0] == s[1]


def test_near_text_small_hamming_far_text_large():
    base = b"the quick brown fox jumps over the lazy dog " * 4
    near = base.replace(b"dog", b"cat")
    far = b"completely different content with no overlap at all whatsoever xyz" * 3
    s = simhash_batch([base, near, far], 4)
    d_near = bin((int(s[0]) ^ int(s[1])) & ((1 << 64) - 1)).count("1")
    d_far = bin((int(s[0]) ^ int(s[2])) & ((1 << 64) - 1)).count("1")
    assert d_near < d_far
    assert d_near <= 12


def test_batch_independence():
    a = simhash_batch([b"alpha beta gamma", b"unrelated words here"], 3)
    b = simhash_batch([b"alpha beta gamma"], 3)
    assert a[0] == b[0]


def test_spark_udf_and_hamming(spark):
    cfg = DedupConfig(k=4)
    df = spark.createDataFrame(
        [("x", "hello world hello world"), ("y", "hello world hello world")],
        ["id", "t"],
    ).withColumn("sh", simhash_udf(cfg)(F.col("t")))
    rows = df.collect()
    want = simhash_batch([b"hello world hello world"], 4)[0]
    assert rows[0]["sh"] == want == rows[1]["sh"]
    pair = spark.createDataFrame([(int(want), int(want) ^ 0b1011)], ["a", "b"])
    assert pair.select(hamming_expr(F.col("a"), F.col("b")).alias("h")).first()["h"] == 3
