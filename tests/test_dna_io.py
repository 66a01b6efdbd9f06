"""DNA packed shingling (k_shingles.h:106-221) + io sources (io.h)."""

import numpy as np
from pyspark.sql import functions as F

from lshdedup.config import DedupConfig
from lshdedup.dna import (
    decode_dna,
    distinct_dna_shingles_expr,
    dna_dup_graph,
    dna_shingles_expr,
    encode_dna,
)
from lshdedup.io import documents_from_text, reads_from_fastq


def test_encode_decode_roundtrip():
    """encode/decode round-trip (test_dna_shingling analogue,
    test.h:251-270); lossy only for trailing-A/short cases
    (k_shingles.h:182-183)."""
    for seq in ["ATCGGT", "TTTTTT", "GCGCGC", "ATCGAT"]:
        assert decode_dna(encode_dna(seq, 6), 6) == seq
    # documented lossy case: len < k with trailing A's
    assert decode_dna(encode_dna("AT", 6), 6) == "AT"


def test_spark_shingles_match_scalar(spark):
    df = spark.createDataFrame([("ATCGGTAC",)], ["seq"])
    row = df.select(dna_shingles_expr("seq", 6).alias("s")).first()
    want = [encode_dna("ATCGGTAC"[i : i + 6], 6) for i in range(3)]
    assert row["s"] == want


def test_short_sequence_single_shingle(spark):
    df = spark.createDataFrame([("ATC",)], ["seq"])
    row = df.select(dna_shingles_expr("seq", 6).alias("s")).first()
    assert row["s"] == [encode_dna("ATC", 6)]


def test_weighted_dna_counts(spark):
    """duplicate k-grams counted (weighted variant, k_shingles.h:200-221)."""
    df = spark.createDataFrame([("ATATAT",)], ["seq"])
    all_g = df.select(dna_shingles_expr("seq", 2).alias("s")).first()["s"]
    dist = df.select(distinct_dna_shingles_expr("seq", 2).alias("s")).first()["s"]
    assert len(all_g) == 5 and len(set(dist)) == 2  # AT, TA


def _random_reads(n, rng, length=60):
    return ["".join(rng.choice(list("ATCG"), size=length)) for _ in range(n)]


def test_dna_dup_graph_vs_bruteforce(spark):
    """Threshold-0.7 dup edges equal the exact-Jaccard oracle's
    (dna_benchmark flagship, aggressive banding)."""
    rng = np.random.Generator(np.random.PCG64(11))
    base = _random_reads(20, rng)
    reads = list(base)
    # plant near-dups: mutate 2 positions of reads 0..4
    for i in range(5):
        s = list(base[i])
        s[10] = "A" if s[10] != "A" else "T"
        s[40] = "C" if s[40] != "C" else "G"
        reads.append("".join(s))
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(reads)], ["read_id", "seq"]
    )
    cfg = DedupConfig(k=6, n_perm=128, b=32, r=4, threshold=0.6, use_phash=False)
    got = {
        (r["id_a"], r["id_b"])
        for r in dna_dup_graph(df, cfg).collect()
    }
    # brute-force oracle
    from lshdedup.shingle import exact_jaccard_expr

    sets = df.select("read_id", distinct_dna_shingles_expr("seq", 6).alias("sh"))
    a = sets.select(F.col("read_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sets.select(F.col("read_id").alias("id_b"), F.col("sh").alias("sb"))
    oracle = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("j", exact_jaccard_expr(F.col("sa"), F.col("sb")))
        .filter(F.col("j") >= 0.6)
        .collect()
    }
    assert got == oracle
    assert len(oracle) >= 5  # the planted mutants


def test_documents_from_text(spark, tmp_path):
    p = tmp_path / "docs.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    rows = documents_from_text(spark, str(p)).collect()
    assert [(r["doc_id"], r["text"]) for r in sorted(rows, key=lambda r: r["doc_id"])] == [
        (0, "alpha"),
        (1, "beta"),
        (2, "gamma"),
    ]


def test_reads_from_fastq(spark, tmp_path):
    """Every 4th line starting at 1 is a sequence (io.h:48-62)."""
    p = tmp_path / "reads.fastq"
    p.write_text("@r0\nATCG\n+\nIIII\n@r1\nGGCC\n+\nIIII\n")
    rows = reads_from_fastq(spark, str(p)).collect()
    assert [(r["read_id"], r["seq"]) for r in sorted(rows, key=lambda r: r["read_id"])] == [
        (0, "ATCG"),
        (1, "GGCC"),
    ]


def test_dense_ids_independent_of_split_count(spark, tmp_path):
    """Ids must not change with the file-split size (the pre-fix global
    window was also split-stable but funneled everything through one task;
    this pins the per-partition-offset rewrite to the same assignment)."""
    from lshdedup.io import documents_from_text

    p = tmp_path / "many_lines.txt"
    lines = [f"line number {i} with some padding text" for i in range(3000)]
    p.write_text("\n".join(lines) + "\n")

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024))
        small = {r["doc_id"]: r["text"]
                 for r in documents_from_text(spark, str(p)).collect()}
        # more than one SCAN split actually exercised (the output may be
        # AQE-coalesced, which is fine — the ids must not depend on it)
        assert spark.read.text(str(p)).rdd.getNumPartitions() > 1
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        big = {r["doc_id"]: r["text"]
               for r in documents_from_text(spark, str(p)).collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert small == big
    assert [small[i] for i in range(3000)] == lines


def test_dense_ids_plan_has_no_global_exchange(spark, tmp_path):
    """The id-assignment plan must not contain a single-partition global
    sort (Exchange SinglePartition) — the 100 TB bottleneck the rewrite
    removes."""
    from lshdedup.io import documents_from_text

    p = tmp_path / "f.txt"
    p.write_text("\n".join(f"row {i}" for i in range(50)) + "\n")
    plan = documents_from_text(spark, str(p))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
