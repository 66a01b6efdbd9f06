"""Scan/source operators (io.h) — Spark-native.

The reference reads whole files into vectors (io.h:21-62); the Spark form
is `spark.read.text` with positional predicates.  The binary uint16
record sink/scan (dna_benchmark.h:113-166) maps to parquet round-trips —
columnar encodings subsume the hand-rolled little-endian framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def documents_from_text(spark: SparkSession, path: str) -> DataFrame:
    """One doc per line with a stable 0-based label — the Spark form of
    get_document_from_file (io.h:21-38) + label assignment
    (dna_benchmark.h:488).  Labels come from a zipWithIndex-equivalent
    monotonic id ranked into a dense 0..n-1 range so they are
    partition-count independent."""
    lines = spark.read.text(path).withColumn("_mid", F.monotonically_increasing_id())
    w = Window.orderBy("_mid")
    return lines.select(
        (F.row_number().over(w) - 1).cast("long").alias("doc_id"),
        F.col("value").alias("text"),
    )


def reads_from_fastq(spark: SparkSession, path: str) -> DataFrame:
    """FASTQ scan: keep sequence lines (line index % 4 == 1) — the Spark
    form of get_document_from_fastq_file (io.h:48-62)."""
    lines = spark.read.text(path).withColumn("_mid", F.monotonically_increasing_id())
    w = Window.orderBy("_mid")
    indexed = lines.select(
        (F.row_number().over(w) - 1).alias("_line"), F.col("value")
    )
    seqs = indexed.filter(F.col("_line") % 4 == 1)
    return seqs.select(
        ((F.col("_line") - 1) / 4).cast("long").alias("read_id"),
        F.col("value").alias("seq"),
    )


def write_edge_list(edges: DataFrame, path: str) -> None:
    """Dup-graph sink (minhash_output_graph_file, dna_benchmark.h:419-442):
    parquet edge table instead of a text file; node count lands in the
    table's companion _meta."""
    edges.write.mode("overwrite").parquet(path)


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
