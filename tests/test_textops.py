"""Text-pipeline extras: token counting, quality, lang-ID, fingerprints."""

from pyspark.sql import functions as F

from lshdedup.textops import (
    bpe_ish_token_count_expr,
    lang_id_expr,
    md5_fingerprint_expr,
    quality_features,
    quality_score_expr,
    rolling_fingerprint_udf,
    token_count_expr,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world foo",), ("one, two!",)], ["t"])
    got = df.select(
        token_count_expr("t").alias("ws"), bpe_ish_token_count_expr("t").alias("bpe")
    ).collect()
    assert got[0]["ws"] == 3 and got[0]["bpe"] == 3
    assert got[1]["ws"] == 2 and got[1]["bpe"] == 4  # one , two ! → 2 words + 2 punct


def test_quality_features_and_score(spark):
    df = spark.createDataFrame([("the quick the quick the",)], ["t"])
    feats = quality_features("t")
    row = df.select(
        feats["n_tokens"].alias("nt"),
        feats["n_distinct_tokens"].alias("nd"),
        feats["n_stopwords"].alias("ns"),
        quality_score_expr("t").alias("q"),
    ).first()
    assert row["nt"] == 5 and row["nd"] == 2 and row["ns"] == 3
    assert 0.0 <= row["q"] <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is on the mat and it is happy",),
            ("el gato que vive en la casa de los perros",),
            ("zzz qqq www",),
        ],
        ["t"],
    )
    got = [r["lang"] for r in df.select(lang_id_expr("t").alias("lang")).collect()]
    assert got == ["en", "es", "und"]


def test_fingerprints(spark):
    df = spark.createDataFrame([("some document text here",), ("some document text here",), ("different",)], ["t"])
    rows = df.select(
        md5_fingerprint_expr("t").alias("md5"),
        rolling_fingerprint_udf()(F.col("t")).alias("roll"),
    ).collect()
    assert rows[0]["md5"] == rows[1]["md5"] != rows[2]["md5"]
    assert rows[0]["roll"] == rows[1]["roll"]


def test_rolling_fingerprint_local_edit_robustness(spark):
    """Winnowing property: an edit far from kept windows usually leaves
    the fingerprint's majority of kept hashes intact — here we just check
    determinism and non-degeneracy."""
    texts = [(f"document body {i} " * 8,) for i in range(16)]
    df = spark.createDataFrame(texts, ["t"])
    a = [r["f"] for r in df.select(rolling_fingerprint_udf()(F.col("t")).alias("f")).collect()]
    b = [r["f"] for r in df.repartition(4).select(rolling_fingerprint_udf()(F.col("t")).alias("f")).collect()]
    assert sorted(a) == sorted(b)
    assert len(set(a)) == len(texts)


def test_rolling_fp_pinned_goldens(spark):
    """Golden values captured from the pre-vectorization implementation —
    the batch rewrite must not change a single output."""
    from pyspark.sql import functions as F

    from lshdedup.textops import rolling_fingerprint_udf

    texts = ["the quick brown fox jumps over the lazy dog",
             "short", "", "a" * 16, "a" * 15,
             "the quick brown fox jumps over the lazy dog and then some "
             "more text to have many windows"]
    golden = {0: 6296264192483308848, 1: -679668296877748907,
              2: -3750763034362895579, 3: -9182626599355449840,
              4: -1051773324172848042, 5: 370489622155987328}
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r["i"]: r["fp"] for r in
           df.select("i", rolling_fingerprint_udf()(F.col("t")).alias("fp")).collect()}
    assert got == golden


def test_rolling_fp_batch_equals_scalar():
    import numpy as np

    from lshdedup.textops import (
        rolling_fingerprint_scalar,
        rolling_fingerprints_batch,
    )

    rng = np.random.default_rng(3)
    raws = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            for n in (0, 1, 15, 16, 17, 40, 200, 16, 1000)]
    got = rolling_fingerprints_batch(raws)
    want = [rolling_fingerprint_scalar(r) for r in raws]
    assert [int(x) for x in got] == want
