"""Shingling semantics on Spark (split_k_shingling_fast, k_shingles.h:67-85)."""

from pyspark.sql import functions as F

from lshdedup.shingle import (
    char_shingles_expr,
    distinct_char_shingles_expr,
    exact_jaccard_expr,
    explode_shingles,
    word_shingles_expr,
)


def test_char_shingles_basic(spark):
    df = spark.createDataFrame([("abcde",)], ["t"])
    row = df.select(char_shingles_expr("t", 2).alias("s")).first()
    assert row["s"] == ["ab", "bc", "cd", "de"]


def test_char_shingles_short_string(spark):
    """len < k → single whole-string shingle (k_shingles.h:74-77)."""
    df = spark.createDataFrame([("ab",)], ["t"])
    row = df.select(char_shingles_expr("t", 5).alias("s")).first()
    assert row["s"] == ["ab"]


def test_weighted_counts(spark):
    """weight = occurrence count (K_shingling._weight, k_shingles.h:82)."""
    df = spark.createDataFrame([(1, "aaaa")], ["id", "t"])
    rows = explode_shingles(df, "id", "t", 2).collect()
    assert len(rows) == 1
    assert rows[0]["shingle"] == "aa" and rows[0]["weight"] == 3


def test_distinct_shingles(spark):
    df = spark.createDataFrame([("ababab",)], ["t"])
    row = df.select(distinct_char_shingles_expr("t", 2).alias("s")).first()
    assert sorted(row["s"]) == ["ab", "ba"]


def test_exact_jaccard_expr(spark):
    """|A∩B|/|A∪B| (minhash.h:210-215): known value + empty convention."""
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], ["x", "y"])
    assert df.select(exact_jaccard_expr(F.col("x"), F.col("y")).alias("j")).first()["j"] == 0.5
    empty = spark.createDataFrame([([], [])], "x array<string>, y array<string>")
    assert empty.select(exact_jaccard_expr(F.col("x"), F.col("y")).alias("j")).first()["j"] == 1.0


def test_word_shingles(spark, word_sets):
    df = spark.createDataFrame([(word_sets["m1"],)], ["t"])
    row = df.select(word_shingles_expr("t").alias("s")).first()
    assert "minhash" in row["s"] and len(row["s"]) == len(set(word_sets["m1"].split()))


def test_word_set_jaccard_m1_m2(spark, word_sets):
    """Exact Jaccard of the reference's m1/m2 fixtures (test.h:86-92)."""
    a = set(word_sets["m1"].split())
    b = set(word_sets["m2"].split())
    expected = len(a & b) / len(a | b)
    df = spark.createDataFrame([(word_sets["m1"], word_sets["m2"])], ["x", "y"])
    got = df.select(
        exact_jaccard_expr(word_shingles_expr("x"), word_shingles_expr("y")).alias("j")
    ).first()["j"]
    assert abs(got - expected) < 1e-12
