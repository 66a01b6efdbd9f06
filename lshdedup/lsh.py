"""LSH banding as DataFrames — the "join" stage.

The reference's LSH index is b hash maps keyed by a hash of r contiguous
signature rows (lsh.h:33-50); insert appends a label to a bucket chain
(lsh.h:112-124), query unions bucket members (lsh.h:146-159), and
query_then_insert yields each unordered pair exactly once via
insertion-order asymmetry (lsh.h:126-144).

Spark-first re-expression: there is no index.  The signature column explodes
to an (id, band_id, band_hash) bucket table; "query_then_insert over the
whole corpus" IS the bucket self-join with ``id_a < id_b`` — the same pair
set, order-free and distributed.  Band hashes are computed JVM-side with
``xxhash64`` over the band's slice (order-sensitive, seeded by band index),
so the explode stays inside whole-stage codegen — no Python.

Scale safeguards the reference lacks (single machine, SURVEY §4.9):
  * exact-duplicate pre-grouping: identical (caption, phash) rows collapse
    to one representative BEFORE banding, so degenerate corpora (millions of
    identical rows) cannot create m² buckets;
  * bucket cap: buckets larger than ``cfg.bucket_cap`` are excluded from
    pair generation and surfaced as a skew metric (after exact-dup
    collapsing, an over-cap bucket is almost surely a band-hash pileup, not
    a real dup cluster);
  * AQE skew-join splitting handles residual medium-hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lshdedup.config import DedupConfig


def band_hashes_expr(sig_col: str, b: int, r: int) -> Column:
    """array<struct<band_id:int, band_hash:long>> — one entry per band.

    band_hash = xxhash64(band_id, sig[i*r] .. sig[i*r+r-1]): the JVM-side
    analogue of the vector-range band hash xx_Hash<uint64_t>(vec, [start,
    end)) (hash.h:186-206).  Seeding with band_id keeps equal slices in
    different bands from colliding into one bucket key space.

    Built as ONE parsed SQL expression rather than b×(r+3) py4j calls:
    the resulting analyzed plan is identical (pinned by
    tests/test_lsh.py::test_band_expr_sql_equals_column_builder), but
    construction drops from ~0.5 s to ~2 ms at b=32 — driver time that
    sat inside the timed window of every pipeline run.
    """
    parts = ", ".join(
        f"struct({i} as band_id, xxhash64({i}, "
        + ", ".join(f"`{sig_col}`[{i * r + j}]" for j in range(r))
        + ") as band_hash)"
        for i in range(b)
    )
    return F.expr(f"array({parts})")


def explode_bands(
    df: DataFrame, id_col: str, sig_col: str, cfg: DedupConfig
) -> DataFrame:
    """Bucket table: (id, band_id, band_hash) — LSH::insert as rows
    (lsh.h:112-124)."""
    assert cfg.b is not None and cfg.r is not None
    assert cfg.b * cfg.r <= cfg.n_perm, "b*r must fit the signature (lsh.h:95)"
    return (
        df.select(id_col, F.explode(band_hashes_expr(sig_col, cfg.b, cfg.r)).alias("_bd"))
        .select(id_col, F.col("_bd.band_id").alias("band_id"), F.col("_bd.band_hash").alias("band_hash"))
    )


def exact_dup_groups(
    df: DataFrame, id_col: str, key_cols: list[str],
    persisted: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Collapse exactly-identical rows before LSH.

    Returns (reps, member_edges):
      reps         — one representative row per distinct key (min id);
      member_edges — (src=id, dst=rep_id) for every NON-representative row,
                     fed straight into connected components.

    Key is 128 bits (xxhash64 ⊕ md5-half) so distinct content cannot merge
    even at 10^12 rows.  One shuffle on the content key.

    ``persisted``: when given, the shared window frame is persisted (and
    appended there for the caller to release) so the reps consumer and the
    member_edges consumer don't each recompute the content-key shuffle +
    window — they are materialized at different times in the pipeline and
    the second pass was a full recompute (guide §2.4: one exchange, reused).
    """
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in key_cols]
    keyed = df.withColumn("_k1", F.xxhash64(*cols)).withColumn(
        "_k2", F.substring(F.md5(F.concat_ws("\x01", *cols)), 1, 16)
    )
    w = Window.partitionBy("_k1", "_k2")
    tagged = keyed.withColumn("_rep", F.min(id_col).over(w))
    if persisted is not None:
        tagged = tagged.persist()
        persisted.append(tagged)
    reps = tagged.filter(F.col(id_col) == F.col("_rep")).drop("_k1", "_k2", "_rep")
    member_edges = (
        tagged.filter(F.col(id_col) != F.col("_rep"))
        .select(F.col(id_col).alias("src"), F.col("_rep").alias("dst"))
    )
    return reps, member_edges


def candidate_pairs(
    buckets: DataFrame,
    id_col: str,
    cfg: DedupConfig,
    persisted: list | None = None,
    eager: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Bucket self-join → distinct candidate pairs (id_a < id_b).

    Equivalent pair set to running query_then_insert sequentially over the
    corpus (lsh.h:126-144): each unordered pair that shares ≥1 band bucket
    appears exactly once.

    Returns (pairs, skew_report) where skew_report lists buckets skipped by
    the cap — plan-level: one shuffle for the window count (same
    partitioning the join reuses), then a hash equi-join.
    """
    w = Window.partitionBy("band_id", "band_hash")
    sized = buckets.withColumn("_bsz", F.count(F.lit(1)).over(w))
    # Materialize: the self-join consumes `sized` twice (left/right) and the
    # skew report a third time; without this the upstream signature UDF
    # would be recomputed per branch.  (The checkpointed pipeline gets the
    # same effect from the parquet stage boundary.)  Callers that loop
    # (bench, long-lived sessions) pass `persisted` and unpersist after
    # materializing downstream results — otherwise the cache accumulates.
    sized = sized.persist()
    if persisted is not None:
        persisted.append(sized)
    if eager:
        # Materialize the cache NOW, before the self-join fans out: the
        # left and right join branches are evaluated CONCURRENTLY on first
        # use, and a persisted-but-unmaterialized frame is recomputed once
        # per concurrent consumer (measured: two full window computations
        # racing).  One count populates the cache; every branch then reads
        # it.  Orchestrating callers (the pipeline) opt in; lazy query
        # builders (q_lsh_dedup_pairs) must not run actions at build time.
        sized.count()
    eligible = sized.filter((F.col("_bsz") >= 2) & (F.col("_bsz") <= cfg.bucket_cap))
    skew_report = (
        sized.filter(F.col("_bsz") > cfg.bucket_cap)
        .groupBy("band_id", "band_hash")
        .agg(F.max("_bsz").alias("bucket_size"))
    )
    a = eligible.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    b = eligible.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    if cfg.pair_salt > 1:
        # explicit skew salting (north rule): split each bucket's LEFT side
        # into pair_salt sub-keys by id-hash; replicate the RIGHT side once
        # per salt.  The join key becomes (band_id, band_hash, salt), so a
        # hot bucket's m² pair work spreads over pair_salt reducers.  Pair
        # set is unchanged.  (AQE skew-join splitting does this adaptively;
        # the explicit path guarantees it for pathological buckets.)
        s = cfg.pair_salt
        a = a.withColumn("_salt", F.pmod(F.xxhash64(F.col("id_a")), F.lit(s)))
        b = b.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(s - 1).cast("long"))),
        )
        join_keys = ["band_id", "band_hash", "_salt"]
    else:
        join_keys = ["band_id", "band_hash"]
    pairs = (
        a.join(b, on=join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs, skew_report


def query_candidates(
    query_buckets: DataFrame, corpus_buckets: DataFrame, qid_col: str, id_col: str
) -> DataFrame:
    """LSH::query for an external query set (lsh.h:146-159): equi-join the
    query's band rows against the corpus bucket table, union across bands
    via dropDuplicates.  Small query side → AQE broadcasts it."""
    q = query_buckets.select(
        F.col("band_id"), F.col("band_hash"), F.col(qid_col).alias("_qid")
    )
    c = corpus_buckets.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("_cid")
    )
    return (
        q.join(c, on=["band_id", "band_hash"])
        .select(F.col("_qid").alias(qid_col), F.col("_cid").alias(id_col))
        .dropDuplicates([qid_col, id_col])
    )
