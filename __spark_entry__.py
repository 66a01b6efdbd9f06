"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dedup pipeline on sf0.001; ``queries`` exposes
one callable per implemented operator family (SURVEY.md §2 + training-data
extras) over the driver's testdata tables; ``oracle_sql`` gives the DuckDB
equivalent for every SQL-expressible query.  Non-SQL-expressible ops
(seeded MinHash/SimHash/SRP signatures, LSH candidate generation, CC
clustering) are registered without an oracle → rows-only check; their
*semantics* are verified in tests/ against brute-force oracles instead.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lshdedup.config import DedupConfig
from lshdedup.params import optimal_params

# shared config for the document-dedup queries: char 5-grams, 128 perms,
# aggressive banding (collision prob ≈ 1 for J ≥ 0.8 → LSH output equals
# the exact-Jaccard oracle pair set)
DOC_CFG = DedupConfig(
    k=5, n_perm=128, seed=1, threshold=0.8, b=21, r=6, use_phash=False,
    bucket_cap=10_000,
)

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
STOPWORDS_ES = ["el", "la", "de", "y", "que", "en", "un", "una", "los", "por"]
STOPWORDS_FR = ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------- entry --
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline over sf0.001 documents →
    (doc_id, cluster_id)."""
    from lshdedup.pipeline import dedup_pipeline

    df = _docs(spark, "/root/testdata/sf0.001")
    res = dedup_pipeline(
        spark, df, DOC_CFG, id_col="doc_id", text_col="text", phash_col=None
    )
    return res.clusters


# -------------------------------------------------------------- queries --
def q_shingle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-shingling scan (k_shingles.h:67-85): per-doc gram/distinct counts."""
    from lshdedup.shingle import char_shingles_expr, distinct_char_shingles_expr

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(char_shingles_expr("text", 5)).alias("n_grams"),
        F.size(distinct_char_shingles_expr("text", 5)).alias("n_shingles"),
    )


def q_shingle_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shingle sets (K_shingling weights, k_shingles.h:28-42):
    top-100 (shingle, total weight) corpus-wide."""
    from lshdedup.shingle import explode_shingles
    from lshdedup.util import fan_out

    # the per-gram explode + map-side partial aggregation is the heavy part
    # and runs single-threaded on an under-parallel scan: fan out first
    # (measured 2.9 s -> 0.65 s at sf0.1; no-op on an already-wide scan)
    return (
        explode_shingles(
            fan_out(_docs(spark, sf_dir).select("doc_id", "text")),
            "doc_id", "text", 5,
        )
        .groupBy("shingle")
        .agg(F.sum("weight").alias("total_weight"))
        .orderBy(F.desc("total_weight"), F.asc("shingle"))
        .limit(100)
    )


def q_word_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set Jaccard (minhash.h:210-215) all-pairs over word tokens,
    docs 0..299, J ≥ 0.5 via pure integer arithmetic."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    toks = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tok")
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("tok").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("tok").alias("tb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).alias("inter"),
            F.size(F.array_union("ta", "tb")).alias("uni"),
        )
        .filter(2 * F.col("inter") >= F.col("uni"))
    )
    return pairs.select("id_a", "id_b", "inter", "uni")


def q_lsh_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH dedup (minhash.h + lsh.h) with exact-Jaccard verify
    (dna_benchmark.h:197-225): char-5-gram J ≥ 0.8 pairs.  Banding is
    aggressive enough that the verified pair set equals the exact oracle's."""
    from lshdedup.lsh import candidate_pairs, explode_bands
    from lshdedup.minhash import add_signatures
    from lshdedup.shingle import distinct_char_shingles_expr, exact_jaccard_expr

    d = _docs(spark, sf_dir).select("doc_id", "text")
    signed = add_signatures(d, DOC_CFG, text_col="text", phash_col="_none_").persist()
    buckets = explode_bands(signed, "doc_id", "sig", DOC_CFG)
    pairs, _ = candidate_pairs(buckets, "doc_id", DOC_CFG)
    # per-DOC distinct shingle arrays, computed once (string arrays so the
    # integer inter/uni match the oracle exactly, no hash-collision risk).
    # NOTE (r6): a deferred per-pair derivation (shingles computed below
    # the join, as verify_pairs now does) was measured 3x SLOWER here —
    # this query has no cheap prefilter and its candidate count exceeds
    # the doc count, so the per-doc precompute is the right shape.
    sets = signed.select(
        "doc_id",
        distinct_char_shingles_expr(F.col("text"), 5).alias("sh"),
    ).withColumn("nsh", F.size("sh"))
    rich = (
        pairs.join(
            sets.select(
                F.col("doc_id").alias("id_a"),
                F.col("sh").alias("sh_a"),
                F.col("nsh").alias("n_a"),
            ),
            "id_a",
        ).join(
            sets.select(
                F.col("doc_id").alias("id_b"),
                F.col("sh").alias("sh_b"),
                F.col("nsh").alias("n_b"),
            ),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        rich.select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            (F.col("n_a") + F.col("n_b") - inter).alias("uni"),
        )
        .filter(F.col("inter") * 5 >= F.col("uni") * 4)  # J >= 0.8, integer form
        .select("id_a", "id_b", "inter", "uni")
    )


def q_exact_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (exact_dup_groups analogue): every doc
    with its exact-content cluster representative."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("fp"))
    w = Window.partitionBy("fp")
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("n_members"),
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality features (textops): integer columns only."""
    from lshdedup.textops import bpe_ish_token_count_expr, quality_features

    feats = quality_features("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["n_distinct_tokens"].alias("n_distinct_tokens"),
        feats["n_punct"].alias("n_punct"),
        feats["n_stopwords"].alias("n_stopwords"),
        bpe_ish_token_count_expr("text").alias("n_bpe_tokens"),
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.textops import quality_score_expr

    return _docs(spark, sf_dir).select(
        "doc_id", quality_score_expr("text").alias("quality")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.textops import lang_id_expr, lang_scores

    s = lang_scores("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        s["en"].alias("hits_en"),
        s["es"].alias("hits_es"),
        s["fr"].alias("hits_fr"),
        lang_id_expr("text").alias("lang_pred"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.textops import md5_fingerprint_expr

    return _docs(spark, sf_dir).select(
        "doc_id", md5_fingerprint_expr("text").alias("fingerprint")
    )


def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational agg over the documents table."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 tokens (groupBy + sort + limit breadth)."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 (ann.py baseline): queries vec_id < 5 vs
    corpus vec_id >= 5."""
    from lshdedup.ann import brute_force_topk

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cvec")
    )
    return brute_force_topk(q, c, k=5).select(
        "qid", "cid", F.col("cosine").cast("double").alias("cosine"), "rank"
    )


def q_word_bigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard dedup (training-data extra): word BIGRAM sets,
    J ≥ 0.3 pairs over docs 0..299, integer arithmetic only."""
    toks = F.split("text", " ")
    # guard BEFORE building grams: a 1-token doc makes sequence(0, -1)
    # auto-step -1 → element_at(toks, 0) → INVALID_INDEX_OF_ZERO.  Mirrors
    # the oracle's len(w) >= 2.
    d = _docs(spark, sf_dir).filter((F.col("doc_id") < 300) & (F.size(toks) >= 2))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        )
    )
    sets = d.select("doc_id", grams.alias("g"))
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    uni = F.size(F.array_union("ga", "gb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", inter.alias("inter"), uni.alias("uni"))
        .filter(10 * F.col("inter") >= 3 * F.col("uni"))
    )


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (the verification oracle of
    the SRP scale path): all pairs with cosine ≥ 0.4.

    Threshold-boundary safety: the nearest attainable cosine to 0.4 in the
    sf0.01 fixture is 0.399872 (margin 1.28e-4, measured), so float
    summation-order differences between Spark and DuckDB (≲1e-12) cannot
    flip any pair's inclusion."""
    from lshdedup.ann import cosine_prenorm_expr, norm_expr

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # norms hoisted per row (r6): the crossJoin evaluated both vector norms
    # once per PAIR (O(n²) interpreted folds); per-row precompute is
    # bit-identical (same expression, same data, same final multiply)
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        norm_expr(F.col("v")).alias("_na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        norm_expr(F.col("v")).alias("_nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                cosine_prenorm_expr(
                    F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
                ),
                6,
            ),
        )
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
    )


def _derived_dna(col) -> F.Column:
    """Deterministic ACGT sequence derived from text (letters bucketed into
    four base classes) — synthesises DNA-shaped input from the driver's
    documents table so the DNA operator family (k_shingles.h:106-221) is
    driver-checkable without external data.  Same chain re-expressed in the
    oracle SQL."""
    x = F.regexp_replace(col, "[a-gA-G]", "0")
    x = F.regexp_replace(x, "[h-nH-N]", "1")
    x = F.regexp_replace(x, "[o-tO-T]", "2")
    x = F.regexp_replace(x, "[^012]", "3")
    return F.translate(x, "0123", "ATCG")


DNA_K = 6  # reference DNA config (dna_benchmark.h:36)


def q_dna_kmer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-bit-packed DNA k-mer shingling (dna_shingling_encode +
    split_dna_shingling, k_shingles.h:106-221): per-doc gram counts AND the
    packed values' min/max — the oracle recomputes the exact packing
    arithmetic, so the 2-bit encode itself is value-checked."""
    from lshdedup.dna import dna_shingles_expr

    d = _docs(spark, sf_dir).select(
        "doc_id", _derived_dna(F.col("text")).alias("seq")
    )
    sh = dna_shingles_expr(F.col("seq"), DNA_K)
    dsh = F.array_distinct(sh)
    return d.select(
        "doc_id",
        F.size(sh).alias("n_kmers"),
        F.size(dsh).alias("n_distinct_kmers"),
        F.array_min(sh).alias("min_packed"),
        F.array_max(sh).alias("max_packed"),
    )


def q_dna_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship DNA dup-graph (dna_benchmark.h §3.1) over
    the derived sequences: packed shingles → MinHash → LSH banding → exact
    packed-shingle Jaccard verify.  At this banding (b=21, r=6, J ≥ 0.8)
    collision probability at the threshold is ≈0.998, and on this corpus
    the verified pair set equals the exact-Jaccard oracle set."""
    from lshdedup.dna import dna_dup_graph

    cfg = DedupConfig(
        k=DNA_K, n_perm=128, seed=1, threshold=0.8, b=21, r=6, use_phash=False
    )
    d = _docs(spark, sf_dir).select(
        "doc_id", _derived_dna(F.col("text")).alias("seq")
    )
    return (
        dna_dup_graph(d, cfg, id_col="doc_id", seq_col="seq")
        .withColumn("sim", F.round("sim", 6))
        .select("id_a", "id_b", "sim")
    )


def _dna_oracle_prefix() -> str:
    """Shared SQL: derived ACGT sequence + exact 2-bit packing per k-mer."""
    code = "CASE {c} WHEN 'A' THEN 0 WHEN 'T' THEN 1 WHEN 'C' THEN 2 ELSE 3 END"
    pack = " + ".join(
        f"({code.format(c=f'substr(seq, i+{j}, 1)')}) * {4 ** (DNA_K - 1 - j)}"
        for j in range(DNA_K)
    )
    return f"""
        WITH s AS (
          SELECT doc_id,
                 translate(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text, '[a-gA-G]', '0', 'g'),
                       '[h-nH-N]', '1', 'g'),
                     '[o-tO-T]', '2', 'g'),
                   '[^012]', '3', 'g'),
                 '0123', 'ATCG') AS seq
          FROM documents
        ),
        g AS (
          SELECT doc_id, ({pack})::BIGINT AS pk
          FROM (SELECT doc_id, seq,
                       unnest(range(1, length(seq)-{DNA_K}+2)) AS i
                FROM s)
        )"""


# Money math in integer cents (prices/discounts are on a 0.01 grid): sums
# stay exact integers in BOTH engines, immune to float summation order —
# the only value-stable way to oracle-check multi-million-row aggregates.
def _cents(col) -> F.Column:
    return F.round(col * 100, 0).cast("long")


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-filter → groupBy two low-card
    keys with map-side partial aggregation.  At 100 TB this is the
    canonical 'one wide scan, tiny result' query — the date filter and the
    5-column projection must reach the parquet scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_units = _cents(F.col("l_extendedprice")) * (
        100 - _cents(F.col("l_discount"))
    )  # price-cents × discount-basis-points → exact integer units
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(disc_units).alias("sum_disc_units"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_tpch_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way join: fact lineitem joins orders, then the
    customer→nation→region dimension chain — dims are explicitly
    broadcast (at 10^12 rows the fact side must never shuffle for a
    kilobyte dimension)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))))
        .alias("rev_units"),
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = F.broadcast(
        spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
    )
    nation = F.broadcast(
        spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_regionkey"
        )
    )
    region = F.broadcast(spark.read.parquet(f"{sf_dir}/region.parquet"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum("rev_units").alias("revenue_units"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_tpch_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by revenue: fact-dim broadcast join → agg → global
    ranked limit (ties broken by key for a total order)."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey",
        (_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))))
        .alias("rev_units"),
    )
    supp = F.broadcast(
        spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_name"
        )
    )
    agg = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum("rev_units").alias("revenue_units"))
    )
    w = Window.orderBy(F.desc("revenue_units"), F.asc("s_suppkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("s_suppkey", "s_name", "revenue_units", "rank")
    )


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events table (events.py)."""
    from lshdedup.events import hourly_rollup

    return hourly_rollup(_events(spark, sf_dir))


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization, 30-min gap (events.py)."""
    from lshdedup.events import sessionize

    return sessionize(_events(spark, sf_dir), gap_minutes=30)


def q_events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.events import topk_per_user

    return topk_per_user(_events(spark, sf_dir), k=3)


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.events import json_extract_props

    return json_extract_props(_events(spark, sf_dir))


def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN, value-exact checkable (verdict r3 item 4): the
    driver variant uses ivf_topk_seeded — a zero-Lloyd-iteration quantizer
    whose centroids are the n_cells corpus rows with the smallest
    md5(cid), assignment/probing by rounded cosine — so EVERY step
    (centroid pick, cell assignment, multi-probe, exact re-rank) is
    ANSI-SQL-expressible and the oracle re-derives the full result.  The
    k-means quantizer (ivf_topk) stays the library scale path, recall-
    gated in tests/test_ann.py.

    Probe half the cells: the fixture embeddings are near-uniform random
    (IVF's worst case — no cluster structure); real embedding corpora
    cluster and need far fewer probes.

    Float-safety: all comparisons happen on 6-dp-ROUNDED cosines with
    id tie-breaks, so equal rounded values order identically in both
    engines; a cross-engine flip needs an unrounded cosine within the
    summation-order error (~1e-14) of a .5e-6 rounding boundary.
    Measured on the sf0.01 fixture over every centroid/assignment/
    candidate cosine (all-pairs superset): min distance from a boundary
    = 1.9e-11 — ~10³× the error, no flip possible."""
    from lshdedup.ann import ivf_topk_seeded

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cvec")
    )
    return ivf_topk_seeded(q, c, k=5, n_cells=16, n_probe=8)


def q_embedding_ivf_spill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell spilling, value-exact checkable: same seeded quantizer as
    q_embedding_ivf_topk, but every corpus row is indexed under its TWO
    highest-rounded-cosine cells (assignment rank <= 2 instead of = 1)
    while queries probe only 4 cells.  Spilling attacks IVF's boundary-
    loss failure mode — a true neighbor just across a Voronoi boundary
    from every probed cell is invisible at any n_probe but enters the
    candidate set via its 2nd-nearest cell; measured on the sf0.1 bench
    geometry it matches n_probe=8/spill=1 recall at a lower scan fraction
    (0.45 vs 0.50) and lifts recall@10 0.818 -> 0.952 at n_probe=8.
    Every step stays ANSI-SQL-expressible (the spill is one window-rank
    predicate; the pair dedup is one DISTINCT), so the oracle re-derives
    the full result.  Float-safety: identical rounded-cosine + id-tie-
    break argument as q_embedding_ivf_topk — the cosines compared here
    are a subset of the same all-pairs set whose measured boundary margin
    is 1.9e-11."""
    from lshdedup.ann import ivf_topk_seeded

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cvec")
    )
    return ivf_topk_seeded(q, c, k=5, n_cells=16, n_probe=4, corpus_spill=2)


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kperm MinHash signatures, exploded to (doc_id, lane, sig_value) so the
    driver canonicalizer can sort/hash scalar columns — AND so DuckDB can
    verify every lane value exactly (the FNV-1a element hash + the PCG64
    permutation table are re-expressed in the oracle SQL; see
    _minhash_oracle_sql)."""
    from lshdedup.minhash import add_signatures

    d = _docs(spark, sf_dir).select("doc_id", "text")
    signed = add_signatures(d, DOC_CFG, text_col="text", phash_col="_none_")
    return signed.select(
        "doc_id", F.posexplode("sig").alias("lane", "sig_value")
    )


REF_CFG = DedupConfig(
    k=5, n_perm=128, seed=1, threshold=0.8, b=21, r=6, use_phash=False,
    sig_scheme="kperm-ref", minhash_bits=32,
)

OPH_CFG = DedupConfig(
    k=5, n_perm=128, seed=1, threshold=0.8, b=21, r=6, use_phash=False,
    sig_scheme="oph",
)


def q_oph_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation-hashing signatures (the SCALE-path scheme,
    hashing.oph_raw/oph_densify: Li/Owen/Zhang 2012 + Shrivastava/Li 2014
    rotation densification), exploded to (doc_id, lane, sig_value) —
    64,000 rows at sf0.01, every lane value-checked against a DuckDB
    oracle that re-derives the full chain in SQL: FNV-1a gram hash
    (unrolled), splitmix64 seed-mix + finalizer (limb-split mod-2^64
    multiplies), bucket = top 7 bits / value = low 57 bits, per-bucket
    minima, and rotation densification (nearest non-empty ORIGINAL bucket
    to the right, circular, offset by hop·C mod 2^64 then masked).

    Previously the OPH path was pytest-gated only (recall/determinism);
    this pins every emitted lane of the production scale scheme.  All
    arithmetic is integer-exact — no float margins involved."""
    from lshdedup.minhash import add_signatures

    d = _docs(spark, sf_dir).select("doc_id", "text")
    signed = add_signatures(d, OPH_CFG, text_col="text", phash_col="_none_")
    return signed.select(
        "doc_id", F.posexplode("sig").alias("lane", "sig_value")
    )


def q_minhash_ref_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIT-EXACT reference signatures (sig_scheme=kperm-ref,
    MinHashBits=32): XXH64 seed-0 element hash folded % 2^31-1, the
    mt19937_64+libstdc++ permutation table, per-element & 0xFFFFFFFF mask —
    the reference's default MinHash template, lane-by-lane.  The DuckDB
    oracle re-derives every value independently: XXH64 is unrolled in
    128-bit SQL arithmetic and the drawn (a,b) table is inlined as
    literals (_minhash_ref_oracle_sql)."""
    from lshdedup.minhash import add_signatures

    d = _docs(spark, sf_dir).select("doc_id", "text")
    signed = add_signatures(d, REF_CFG, text_col="text", phash_col="_none_")
    return signed.select(
        "doc_id", F.posexplode("sig").alias("lane", "sig_value")
    )


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.simhash import simhash_udf

    return _docs(spark, sf_dir).select(
        "doc_id", simhash_udf(DOC_CFG)(F.col("text")).alias("simhash")
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.pipeline import dedup_pipeline

    res = dedup_pipeline(
        spark, _docs(spark, sf_dir), DOC_CFG, id_col="doc_id",
        text_col="text", phash_col=None,
    )
    return res.clusters


def q_dedup_clusters_resumed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint/resume under the driver contract (VERDICT r4 item 4;
    north-rule resumability).  Runs the dedup pipeline TWICE through
    StageRunner with one fixed (checkpoint_dir, run_id): the first run
    computes and checkpoints all six stages (reps, exact_edges,
    signatures, candidates, verified, clusters); the second run must
    RESUME every stage from its parquet checkpoint (table-existence +
    cfg-hash match, checkpoint.py) without recomputing.  Returns the
    second run's cluster table plus resumed_stages = the count of
    resumed stage events — the oracle pins it to the constant 6, so any
    silently-recomputed stage fails the hash match loudly.

    The cluster values themselves are checked against the SAME
    recursive-CTE connected-components oracle as dedup_clusters, so this
    row proves resume correctness AND resume completeness under the one
    hard signal the driver supports.  Cluster rows are materialized
    driver-side (500 rows at sf0.01) before the checkpoint tree is
    removed, mirroring the streaming query's temp-tree hygiene."""
    import shutil
    import tempfile
    from dataclasses import replace

    from lshdedup.pipeline import dedup_pipeline

    ckpt = tempfile.mkdtemp(prefix="lshdedup_resume_q_")
    try:
        cfg = replace(DOC_CFG, checkpoint_dir=ckpt, run_id="resume_q")
        docs = _docs(spark, sf_dir)
        kwargs = dict(id_col="doc_id", text_col="text", phash_col=None)
        dedup_pipeline(spark, docs, cfg, **kwargs)  # run 1: compute + checkpoint
        res2 = dedup_pipeline(spark, docs, cfg, **kwargs)  # run 2: all-resumed
        resumed = sum(
            1 for e in res2.extra["runner"].events if e.get("resumed")
        )
        rows = res2.clusters.collect()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, cluster_id long"
    ).withColumn("resumed_stages", F.lit(resumed))


def q_wminhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted MinHash (weight_minhash.h) over embedding magnitudes,
    exploded to per-lane rows (vec_id, lane, sig) — 64,000 rows at sf0.01,
    every packed (k*, t) lane value-checked against a DuckDB oracle that
    re-derives Ioffe CWS in SQL from the inlined (64×128) r/ln_c/beta
    sample matrices (deterministic PCG64 seed-1 literals).

    Float-safety margins measured on the fixture: min distance of any
    ln(w)/r + β from an integer = 4.8e-8 (a flip would change floor → t),
    min gap between the smallest and second-smallest ln_a per lane =
    5.0e-5 (a flip would change argmin → k*) — both ≥ 1e7× the ≤1-ulp
    libm/summation divergence between engines, so no lane can differ."""
    from lshdedup.wminhash import wminhash_udf

    e = _emb(spark, sf_dir)
    absvec = F.transform(F.col("embedding"), lambda x: F.abs(x))
    sig = e.select("vec_id", wminhash_udf(64, 128)(absvec).alias("wmh_sig"))
    return sig.select(
        "vec_id", F.posexplode("wmh_sig").alias("lane", "sig")
    )


# driver-check dim for the set-based CWS: small enough that the dense
# oracle's inlined sample matrices cover it; the library default for real
# corpora stays 4096
WMH_SET_DIM = 64


def q_wminhash_set_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based weighted MinHash (weight_minhash.h:173-243) over word-count
    maps, with content-derived positions (FNV-1a(token) mod dim, collisions
    sum) instead of the reference's order-dependent global map.

    Value-exact oracle at wm_dim=64 (verdict r3 item 3): nothing in the
    set-variant semantics requires dim=4096 — at 64 the SAME inlined
    64×128 sample-matrix oracle as the dense path applies, with the
    variable-length FNV-1a token hash re-derived in SQL via
    list_reduce over the token's bytes.  (dim=4096 stays the library
    default for real corpora; its oracle would need 1.57M literals.)
    Token weights are integer counts, so position-collision sums are
    exact in both engines regardless of addition order.

    Float-safety margins measured on the sf0.01 fixture (same method as
    the dense query): min distance of any ln(w)/r + β from an integer =
    4.4e-5, min gap between smallest and second-smallest ln_a per lane =
    1.1e-5 — both ≥ 1e9× the ≤1-ulp cross-engine ln/arithmetic
    divergence, so no floor or argmin can flip."""
    from lshdedup.wminhash import wminhash_set_udf

    counts = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("int").alias("w"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("tok"), F.col("w")))
            ).alias("wmap")
        )
    )
    sig = counts.select(
        "doc_id", wminhash_set_udf(WMH_SET_DIM, 128)(F.col("wmap")).alias("wmh_sig")
    )
    return sig.select(
        "doc_id", F.posexplode("wmh_sig").alias("lane", "sig")
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-bucketed embedding near-dup pairs (ann.py scale path).

    Value-exact DuckDB oracle: the seeded hyperplane matrix is a
    deterministic literal, so the oracle re-derives every sign bit, band,
    candidate, and verified cosine in SQL.  Float-safety margins measured
    on the sf0.01 fixture: min |dot(v, h_j)| = 6.6e-5 (sign bits), min
    |cosine − 0.35| = 2.9e-5 (threshold), min distance of any relevant
    cosine×1e6 from a .5 rounding boundary = 8.8e-5 — all ≥ 1e9× the
    cross-engine summation-order error (~1e-14), so no bit, inclusion, or
    6-decimal rounding can flip between engines."""
    from lshdedup.ann import embedding_near_dup_pairs

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return embedding_near_dup_pairs(e, "vec_id", "v", 64, min_cosine=0.35, n_bands=32)


def q_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lshdedup.textops import rolling_fingerprint_udf

    return _docs(spark, sf_dir).select(
        "doc_id", rolling_fingerprint_udf()(F.col("text")).alias("rfp")
    )


def q_streaming_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup (LSH::query_then_insert, lsh.h:126-144)
    driven END-TO-END under the driver: the documents table is split into
    4 micro-batch files, consumed via Structured Streaming (availableNow,
    one file per trigger), and the accumulated dup-pair store is returned.

    The oracle is the SAME exact-Jaccard SQL as lsh_dedup_pairs: the
    batch==stream equivalence (tests/test_streaming.py) guarantees the
    streaming pair SET equals the batch pipeline's at DOC_CFG, and inter/
    uni are recomputed here from the doc texts (not taken from the stream)
    so the values are exact — a missed or spurious streaming pair shows up
    as a row-count/hash mismatch.
    """
    import shutil

    from lshdedup.shingle import distinct_char_shingles_expr
    from lshdedup.streaming import StreamingDedup

    # pid-scoped so concurrent drivers on the same fixture cannot rmtree
    # each other's live streaming state; same-process reruns still reset
    base = os.path.join(
        tempfile.gettempdir(),
        "lshdedup_stream_q_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + f"_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    d = _docs(spark, sf_dir).select("doc_id", "text")
    # 4 deterministic micro-batch files (arrival order does not affect the
    # final pair set; the ids in each wave interleave so both join halves —
    # within-batch and new-vs-store — are exercised)
    for i in range(4):
        (
            d.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    try:
        dedup = StreamingDedup(
            spark, DOC_CFG, os.path.join(base, "state"),
            id_col="doc_id", text_col="text",
        )
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = dedup.start(stream, checkpoint=os.path.join(base, "ckpt"))
        q.awaitTermination()

        # materialize the (small) pair set driver-side so the temp tree —
        # micro-batch files, checkpoint, streaming state — can be removed
        # before returning (advice r3: the pid suffix defeats the startup
        # rmtree, so without this repeated driver runs accumulate dirs)
        pair_rows = (
            dedup.dup_pairs()
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    pairs = spark.createDataFrame(pair_rows, "id_a long, id_b long")
    sets = d.select(
        "doc_id", distinct_char_shingles_expr(F.col("text"), 5).alias("sh")
    ).withColumn("nsh", F.size("sh"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(
            sets.select(
                F.col("doc_id").alias("id_a"),
                F.col("sh").alias("sh_a"),
                F.col("nsh").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("id_b"),
                F.col("sh").alias("sh_b"),
                F.col("nsh").alias("n_b"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            (F.col("n_a") + F.col("n_b") - inter).alias("uni"),
        )
        .select("id_a", "id_b", "inter", "uni")
    )


# multimodal driver corpus: images per group of 4 ids share FNV-derived
# pixels; every 3rd image is stored lossy (qnt) so in-group pairs span
# exact AND near-exact pHash matches.  16×16, clamped corpus size.
MM_GROUP = 4
MM_IMG = 16
MM_N_MIN, MM_N_MAX = 256, 2048


def _mm_pixels(i: int) -> "np.ndarray":
    """Deterministic 16×16 uint8 image for corpus row i: pixel p of group
    g = i//4 is FNV-1a-64(f"{g}:{p}") mod 256 — re-derivable in ANSI SQL
    (list_reduce over the key's bytes), unlike the PCG64 pixels of
    synth.py."""
    import numpy as np

    from lshdedup.hashing import fnv1a_bytes

    g = i // MM_GROUP
    return np.array(
        [fnv1a_bytes(f"{g}:{p}".encode()) % 256 for p in range(MM_IMG * MM_IMG)],
        dtype=np.uint8,
    ).reshape(MM_IMG, MM_IMG)


def q_multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup pairs, VALUE-EXACT checkable (round 4; was
    rows-only): binary image corpus → codec decode → DCT pHash via the
    mapInPandas plumbing (multimodal.image_features) → 4×16-bit band
    equi-join (pigeonhole: hamming≤3 ⇒ ≥1 equal band — never all-pairs)
    → native bit_count(xor) verify.

    The oracle re-derives the ENTIRE chain in SQL: FNV pixels, qnt
    decode arithmetic, the 32×32-resample-DCT folded into an 8×16 matrix
    E (E[u,y] = D32[u,2y] + D32[u,2y+1] — exact, since the resample
    duplicates each source pixel 2×2), freq = E·px·Eᵀ as two join-
    aggregates, median threshold over the 63 AC coefficients, bit
    packing, banding, and the hamming filter.  The corpus pixels are
    FNV-derived from the row id (SQL-expressible, unlike synth.py's
    PCG64 corpus, which remains the bench/pytest workload), groups of
    4 ids share pixels, and every 3rd image is stored lossy (qnt) so the
    pair set exercises both exact and near-exact matches.  Corpus size
    tracks sf_dir's documents count (clamped [256, 2048]).

    Float-safety margins measured on the sf0.01 corpus (500 images, raw
    and qnt variants): min |coeff − median| over non-median AC
    coefficients = 1.2e-2, no exact non-self ties — ~5e10× the measured
    cross-engine summation error (2.5e-13), so no bit can flip.  Two
    DuckDB-internal hazards are handled in the oracle itself: the middle
    element is taken by exact rank (median() interpolates) and the vals
    CTE is MATERIALIZED (see the SQL comments).
    """
    import pandas as pd

    from lshdedup.codec import encode_image
    from lshdedup.multimodal import image_features

    n_docs = _docs(spark, sf_dir).count()
    n = max(MM_N_MIN, min(MM_N_MAX, n_docs))
    rows = []
    for i in range(n):
        # i%3==0 lossy (qnt); the lossless rows alternate between the
        # sandbox raw format and REAL stdlib PNG (codec.encode_png, r5) —
        # both decode to the exact FNV pixels, so the oracle's
        # i%3-dispatched decode arithmetic is unchanged
        fmt = "qnt" if i % 3 == 0 else ("png" if i % 3 == 1 else "raw")
        rows.append(
            (str(i), bytearray(encode_image(_mm_pixels(i), fmt)), MM_IMG,
             MM_IMG, fmt)
        )
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])
    )
    # materialize the tiny (image_id, phash) table driver-side: no executor
    # memory pinned for the rest of the session, decode→DCT runs once
    feat_rows = image_features(corpus).select("image_id", "phash").collect()
    feats = spark.createDataFrame(
        feat_rows, "image_id string, phash long"
    ).select(F.col("image_id").cast("long").alias("img_id"), "phash")
    bands = feats.select(
        "img_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.shiftrightunsigned(F.col("phash"), 16 * i)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("band_val"),
                )
                for i in range(4)
            ])
        ).alias("bd"),
    ).select("img_id", "phash", "bd.band_id", "bd.band_val")
    a = bands.select(
        F.col("img_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        "band_id",
        "band_val",
    )
    b = bands.select(
        F.col("img_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        "band_id",
        "band_val",
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


JB_GRID = (4, 6)           # 8×8 blocks per image → 32×48 px
JB_N_MIN, JB_N_MAX = 256, 1024


def q_jpeg_block_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG wire format under the value-exact hash gate (round 5).

    Corpus: images whose 8×8 blocks are each CONSTANT, with the block
    value derived from splitmix64(img_id·24 + block) % 256.  Encoded as
    genuine baseline JFIF (jpeg.encode_jpeg, default quality) driver-side;
    decoded with jpeg.decode_jpeg in EXECUTORS via mapInPandas; output =
    per-image integer pixel statistics.

    Why a lossy codec can sit under a value-exact oracle: a constant 8×8
    block has every AC coefficient exactly 0 and DC = 8·(v−128), a
    multiple of 8 — the quality-95 DC quantizer step is 2, so
    round(DC/2)·2 = DC exactly, and the IDCT of a DC-only spectrum is the
    constant v back (float noise ~1e-12, killed by the integer round).
    The decode is therefore mathematically lossless for this family while
    still exercising the full wire path: JFIF markers, Huffman entropy
    coding, byte stuffing, dequantization, IDCT.  A hash match proves
    decode(encode(px)) == px for every image — through real JPEG bytes.

    The oracle recomputes the statistics from the generative formula in
    pure integer SQL (the same splitmix64 xor-shift/limb-multiply chain
    as the OPH oracle).  Corpus size tracks sf_dir's documents count,
    clamped [256, 1024] (JB_N_MIN/JB_N_MAX).
    """
    import numpy as np
    import pandas as pd

    from lshdedup.codec import decode_real
    from lshdedup.hashing import splitmix64
    from lshdedup.jpeg import encode_jpeg

    gr, gc = JB_GRID
    nb = gr * gc
    n_docs = _docs(spark, sf_dir).count()
    n = max(JB_N_MIN, min(JB_N_MAX, n_docs))
    vals = (
        splitmix64(np.arange(n * nb, dtype=np.uint64)) % np.uint64(256)
    ).astype(np.uint8).reshape(n, gr, gc)
    rows = [
        (i, bytearray(encode_jpeg(np.kron(vals[i], np.ones((8, 8), np.uint8)))))
        for i in range(n)
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["img_id", "bytes"])
    )

    schema = "img_id long, pixel_sum long, px_min int, px_max int, n_px int"

    def dec(batches):
        for pdf in batches:
            out = []
            for rid, data in zip(pdf["img_id"], pdf["bytes"]):
                px = decode_real(bytes(data), "jpeg")
                out.append(
                    (int(rid), int(px.sum()), int(px.min()), int(px.max()),
                     int(px.size))
                )
            yield pd.DataFrame(
                out,
                columns=["img_id", "pixel_sum", "px_min", "px_max", "n_px"],
            )

    return corpus.repartition(8).mapInPandas(dec, schema)


# mjpeg_frame_stats geometry: VD_F frames per video (same 4×6-block
# constant-block family as jpeg_block_roundtrip), every VD_EVERY-th
# frame sampled; video count tracks sf_dir's documents count, clamped
VD_F, VD_EVERY = 12, 3
VD_N_MIN, VD_N_MAX = 64, 128


def q_mjpeg_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container path under the value-exact hash gate (round
    5): MJPEG frame sampling → JPEG decode, end to end in executors.

    Corpus: one MJPEG stream per video — VD_F genuine baseline JPEGs
    concatenated (the MJPEG wire convention), each frame from the same
    constant-8×8-block family as jpeg_block_roundtrip with pixel values
    splitmix64((vid·VD_F + frame)·24 + block) % 256, which makes the
    lossy wire path mathematically lossless (DC multiple of the
    quantizer step, zero AC — see q_jpeg_block_roundtrip).

    Engine: sample_video_frames (jpeg.split_mjpeg's STRUCTURAL marker
    walk — not a byte scan — runs in executors) keeps every 3rd frame;
    the sampled frames' bytes are decoded with decode_jpeg and reduced
    to integer pixel statistics.  The oracle recomputes the statistics
    of exactly the sampled frames (frame % 3 = 0) from the generative
    formula in pure integer SQL.  A hash match pins the whole chain:
    frame boundaries found structurally, frames extracted byte-exact,
    real JPEG entropy decode, sampling arithmetic."""
    import numpy as np
    import pandas as pd

    from lshdedup.hashing import splitmix64
    from lshdedup.jpeg import decode_jpeg, encode_jpeg
    from lshdedup.multimodal import sample_video_frames

    gr, gc = JB_GRID
    nb = gr * gc
    n_docs = _docs(spark, sf_dir).count()
    n = max(VD_N_MIN, min(VD_N_MAX, n_docs))
    vals = (
        splitmix64(np.arange(n * VD_F * nb, dtype=np.uint64)) % np.uint64(256)
    ).astype(np.uint8).reshape(n, VD_F, gr, gc)
    ones = np.ones((8, 8), np.uint8)
    rows = [
        (
            str(v),
            bytearray(
                b"".join(encode_jpeg(np.kron(vals[v, f], ones)) for f in range(VD_F))
            ),
            "mjpeg",
        )
        for v in range(n)
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "bytes", "fmt"])
    )

    sampled = sample_video_frames(corpus.repartition(8), every_n=VD_EVERY)
    schema = (
        "video_id string, frame_idx int, pixel_sum long, px_min int, "
        "px_max int, n_px int"
    )

    def dec(batches):
        for pdf in batches:
            out = []
            for rid, idx, data in zip(
                pdf["video_id"], pdf["frame_idx"], pdf["bytes"]
            ):
                px = decode_jpeg(bytes(data))
                out.append(
                    (rid, int(idx), int(px.sum()), int(px.min()),
                     int(px.max()), int(px.size))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "video_id", "frame_idx", "pixel_sum", "px_min",
                    "px_max", "n_px",
                ],
            )

    return sampled.mapInPandas(dec, schema)


# gif_frame_stats geometry: GF_F frames of GF_H×GF_W random pixels per
# animated GIF, every GF_EVERY-th frame sampled; video count tracks
# sf_dir's documents count, clamped
GF_F, GF_EVERY = 8, 2
GF_H, GF_W = 16, 24
GF_N_MIN, GF_N_MAX = 64, 128


def q_gif_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF path under the value-exact hash gate (round 5):
    GIF container walk + full LZW decode + frame sampling, end to end in
    executors.  Unlike the JPEG queries no pixel-family restriction is
    needed — GIF is LOSSLESS, so the frames are unconstrained splitmix
    noise (the LZW worst case: literal-heavy streams with width growth)
    and every pixel round-trips bit-exactly through real wire bytes.

    Engine: animated GIFs built driver-side (encode_gif — real LZW
    compression, grayscale palette); sample_video_frames keeps every 2nd
    frame, re-encoding each as a single-frame GIF; the sampled bytes are
    decoded with decode_gif and reduced to integer pixel statistics.
    The oracle recomputes the statistics of exactly the sampled frames
    (frame % 2 = 0) from the generative formula
    val = splitmix64((vid·GF_F + frame)·GF_H·GF_W + p) % 256 in pure
    integer SQL."""
    import numpy as np
    import pandas as pd

    from lshdedup.gif import decode_gif, encode_gif
    from lshdedup.hashing import splitmix64
    from lshdedup.multimodal import sample_video_frames

    npx = GF_H * GF_W
    n_docs = _docs(spark, sf_dir).count()
    n = max(GF_N_MIN, min(GF_N_MAX, n_docs))
    vals = (
        splitmix64(np.arange(n * GF_F * npx, dtype=np.uint64)) % np.uint64(256)
    ).astype(np.uint8).reshape(n, GF_F, GF_H, GF_W)
    rows = [
        (str(v), bytearray(encode_gif(list(vals[v]))), "gif")
        for v in range(n)
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "bytes", "fmt"])
    )
    sampled = sample_video_frames(corpus.repartition(8), every_n=GF_EVERY)
    schema = (
        "video_id string, frame_idx int, pixel_sum long, px_min int, "
        "px_max int, n_px int"
    )

    def dec(batches):
        for pdf in batches:
            out = []
            for rid, idx, data in zip(
                pdf["video_id"], pdf["frame_idx"], pdf["bytes"]
            ):
                px = decode_gif(bytes(data))[0]
                out.append(
                    (rid, int(idx), int(px.sum()), int(px.min()),
                     int(px.max()), int(px.size))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "video_id", "frame_idx", "pixel_sum", "px_min",
                    "px_max", "n_px",
                ],
            )

    return sampled.mapInPandas(dec, schema)


# wav_sample_stats geometry: WA_S PCM16 samples per mono clip at 16 kHz;
# clip count tracks sf_dir's documents count, clamped
WA_S = 1024
WA_N_MIN, WA_N_MAX = 128, 256


def q_wav_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio wire format under the value-exact hash gate (round 5):
    RIFF/WAVE PCM16 decode in executors via the stdlib codec (wav.py).

    Corpus: mono 16 kHz clips whose samples are
    splitmix64(aid·WA_S + i) % 65536 − 32768, encoded as genuine WAV
    driver-side (encode_wav); decoded in EXECUTORS by
    multimodal.audio_features (structural RIFF chunk walk + int16 frame
    unpack); output = the operator's integer per-clip statistics.  PCM
    is lossless by definition, so unlike the JPEG queries no family
    restriction is needed — every sample value round-trips bit-exactly,
    and a hash match pins header layout, chunk sizes, the odd-size pad
    rule, and little-endian int16 decoding.  The oracle recomputes the
    statistics from the generative formula in pure integer SQL (same
    splitmix64 chain as the OPH/JPEG oracles)."""
    import numpy as np
    import pandas as pd

    from lshdedup.hashing import splitmix64
    from lshdedup.multimodal import audio_features
    from lshdedup.wav import encode_wav

    n_docs = _docs(spark, sf_dir).count()
    n = max(WA_N_MIN, min(WA_N_MAX, n_docs))
    vals = (
        (splitmix64(np.arange(n * WA_S, dtype=np.uint64)) % np.uint64(65536))
        .astype(np.int64) - 32768
    ).astype(np.int16).reshape(n, WA_S)
    rows = [
        (str(a), bytearray(encode_wav(vals[a], rate=16000)), "wav")
        for a in range(n)
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])
    )
    return audio_features(corpus.repartition(8))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "shingle_profile": q_shingle_profile,
        "shingle_weights": q_shingle_weights,
        "word_jaccard_pairs": q_word_jaccard_pairs,
        "word_bigram_jaccard": q_word_bigram_jaccard,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "lsh_dedup_pairs": q_lsh_dedup_pairs,
        "exact_dup_clusters": q_exact_dup_clusters,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "lang_distribution": q_lang_distribution,
        "token_topk": q_token_topk,
        "embedding_topk": q_embedding_topk,
        "minhash_signatures": q_minhash_signatures,
        "minhash_ref_signatures": q_minhash_ref_signatures,
        "oph_signatures": q_oph_signatures,
        "simhash_fingerprints": q_simhash_fingerprints,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_resumed": q_dedup_clusters_resumed,
        "wminhash_signatures": q_wminhash_signatures,
        "wminhash_set_signatures": q_wminhash_set_signatures,
        "embedding_near_dups": q_embedding_near_dups,
        "rolling_fingerprints": q_rolling_fingerprints,
        "dna_kmer_profile": q_dna_kmer_profile,
        "dna_dup_pairs": q_dna_dup_pairs,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "tpch_revenue_by_region": q_tpch_revenue_by_region,
        "tpch_top_suppliers": q_tpch_top_suppliers,
        "events_hourly_rollup": q_events_hourly_rollup,
        "events_sessions": q_events_sessions,
        "events_topk_per_user": q_events_topk_per_user,
        "events_json_extract": q_events_json_extract,
        "embedding_ivf_topk": q_embedding_ivf_topk,
        "embedding_ivf_spill": q_embedding_ivf_spill,
        "streaming_dedup_pairs": q_streaming_dedup_pairs,
        "multimodal_phash_pairs": q_multimodal_phash_pairs,
        "jpeg_block_roundtrip": q_jpeg_block_roundtrip,
        "mjpeg_frame_stats": q_mjpeg_frame_stats,
        "wav_sample_stats": q_wav_sample_stats,
        "gif_frame_stats": q_gif_frame_stats,
    }


# ------------------------------------------------------------- oracles --
def _sw_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_W64 = "18446744073709551616::HUGEINT"  # 2^64
_P61 = "2305843009213693951::HUGEINT"   # 2^61-1 (hash.h:25-27)


def _fnv_sql(text_col: str, pos: str, k: int) -> str:
    """FNV-1a 64 over the k ASCII bytes of ``text_col`` starting at 1-based
    ``pos`` — the element hash of hashing.fnv1a_windows, unrolled in SQL.
    Valid for ASCII text with length >= k (the driver fixture guarantees
    both; the <k whole-string-padding path of char_shingle_hashes never
    fires there)."""
    h = "14695981039346656037::HUGEINT"  # FNV offset basis
    for j in range(k):
        byte = f"ascii(substr({text_col}, {pos}+{j}, 1))::HUGEINT"
        h = f"((xor({h}, {byte}) * 1099511628211::HUGEINT) % {_W64})"
    return h


def _minhash_oracle_sql() -> str:
    """Value-level DuckDB oracle for the kperm MinHash signatures: the
    PCG64-drawn permutation table (hashing.generate_permutations) is inlined
    as literals, the FNV-1a element hash is unrolled, and each lane is
    min((a*h mod 2^64 + b) mod 2^64 mod 2^61-1) over the doc's grams —
    exactly minhash_segments (reference semantics minhash.h:135-169)."""
    from lshdedup.hashing import generate_permutations

    a, b = generate_permutations(DOC_CFG.n_perm, DOC_CFG.seed)
    rows = ", ".join(
        f"({i}, {int(ai)}::BIGINT, {int(bi)}::BIGINT)"
        for i, (ai, bi) in enumerate(zip(a.tolist(), b.tolist()))
    )
    fnv = _fnv_sql("text", "i", DOC_CFG.k)
    return f"""
        WITH gh AS (
          SELECT DISTINCT doc_id, {fnv} AS h
          FROM (SELECT doc_id, text,
                       unnest(range(1, length(text)-{DOC_CFG.k}+2)) AS i
                FROM documents)
        ),
        perms(lane, pa, pb) AS (VALUES {rows})
        SELECT doc_id, lane::INT AS lane,
               min((((pa::HUGEINT * h) % {_W64} + pb::HUGEINT) % {_W64})
                   % {_P61})::BIGINT AS sig_value
        FROM gh CROSS JOIN perms
        GROUP BY doc_id, lane
    """


def _oph_oracle_sql() -> str:
    """Value-level DuckDB oracle for the OPH scale-path signatures
    (hashing.oph_raw + oph_densify): FNV-1a gram hash, splitmix64
    seed-mix + finalizer, bucket/value bit split, per-bucket minima,
    rotation densification.  Integer-exact throughout.

    Fixture contract (same as _fnv_sql's): ASCII text with length >= k.
    The gram CTE (range(1, length-k+2)) yields NO grams for docs shorter
    than k, while the engine hashes a <k string as ONE zero-padded
    whole-string shingle (char_shingle_hashes) and _fill_empty_rows only
    covers zero-GRAM rows — so a <k doc would fail the oracle loudly
    (spurious mismatch, never a wrong-accept).  The driver documents
    table satisfies the contract; extend the whole-string branch into
    this SQL before pointing it at corpora with shorter docs."""
    from lshdedup.hashing import splitmix64_scalar_seed

    smix = splitmix64_scalar_seed(OPH_CFG.seed)
    fnv = _fnv_sql("text", "i", OPH_CFG.k)
    m1 = 0xBF58476D1CE4E5B9
    m2 = 0x94D049BB133111EB
    oph_c = 0x27D4EB2F165667C5  # densification hop offset (hashing._OPH_C)
    vmod = 1 << 57              # n_perm=128 → kbits=7 → 57 value bits
    return f"""
        WITH gh AS (
          SELECT DISTINCT doc_id, {fnv} AS gh
          FROM (SELECT doc_id, text,
                       unnest(range(1, length(text)-{OPH_CFG.k}+2)) AS i
                FROM documents)
        ),
        -- splitmix64(gh XOR splitmix64(seed)): xor-shift + limb-split
        -- mod-2^64 multiplies (same technique as the XXH64 oracle)
        s0 AS (SELECT doc_id, xor(gh, {smix}::HUGEINT) AS z FROM gh),
        s1 AS (SELECT doc_id, xor(z, z // 1073741824::HUGEINT) AS z FROM s0),
        s2 AS (SELECT doc_id, {_mulmod_sql('z', m1)} AS z FROM s1),
        s3 AS (SELECT doc_id, xor(z, z // 134217728::HUGEINT) AS z FROM s2),
        s4 AS (SELECT doc_id, {_mulmod_sql('z', m2)} AS z FROM s3),
        s5 AS (SELECT doc_id, xor(z, z // 2147483648::HUGEINT) AS z FROM s4),
        -- bucket = top 7 bits, value = low 57 bits
        bk AS (SELECT doc_id, CAST(z // {vmod}::HUGEINT AS INT) AS lane,
                      z % {vmod}::HUGEINT AS val
               FROM s5),
        raw AS (SELECT doc_id, lane, min(val) AS mv
                FROM bk GROUP BY doc_id, lane),
        grid AS (
          SELECT d.doc_id, gs.lane
          FROM (SELECT DISTINCT doc_id FROM documents) d,
               (SELECT unnest(range(0, {OPH_CFG.n_perm})) AS lane) gs
        ),
        empties AS (
          SELECT g.doc_id, g.lane
          FROM grid g LEFT JOIN raw r
            ON r.doc_id = g.doc_id AND r.lane = g.lane
          WHERE r.mv IS NULL
        ),
        -- rotation densification: nearest non-empty ORIGINAL bucket to
        -- the right (circular), value offset by hop*C mod 2^64, masked
        fills AS (
          SELECT doc_id, lane, mv, hop FROM (
            SELECT e.doc_id, e.lane, r2.mv,
                   ((r2.lane - e.lane + {OPH_CFG.n_perm})
                      % {OPH_CFG.n_perm}) AS hop,
                   row_number() OVER (
                     PARTITION BY e.doc_id, e.lane
                     ORDER BY ((r2.lane - e.lane + {OPH_CFG.n_perm})
                                 % {OPH_CFG.n_perm})) AS rn
            FROM empties e JOIN raw r2 ON r2.doc_id = e.doc_id
          ) ranked_fills WHERE rn = 1
        ),
        dense AS (
          SELECT doc_id, lane, mv AS sig FROM raw
          UNION ALL
          SELECT doc_id, lane,
                 ((mv + (hop::HUGEINT * {oph_c}::HUGEINT) % {_W64})
                    % {_W64}) % {vmod}::HUGEINT AS sig
          FROM fills
        )
        SELECT doc_id, lane::INT AS lane, CAST(sig AS BIGINT) AS sig_value
        FROM dense
    """


def _rotl_sql(x: str, r: int) -> str:
    """rotl64 in HUGEINT SQL: (x<<r mod 2^64) and (x>>(64-r)) occupy
    disjoint bit ranges, so | is +.  x<2^64 · 2^r can overflow INT128 for
    large r — shift via limbs: (x % 2^(64-r)) * 2^r stays < 2^64."""
    return (
        f"(({x} % {1 << (64 - r)}::HUGEINT) * {1 << r}::HUGEINT"
        f" + ({x} // {1 << (64 - r)}::HUGEINT))"
    )


def _mulmod_sql(x: str, y: int) -> str:
    """(x * y) mod 2^64 for x < 2^64 and constant y < 2^64 without INT128
    overflow: split x into 32-bit limbs — x_lo*y < 2^96 and x_hi*y < 2^96
    both fit HUGEINT; ((x_hi*y) mod 2^32)*2^32 recombines exactly."""
    return (
        f"((({x} % 4294967296::HUGEINT) * {y}::HUGEINT"
        f" + (({x} // 4294967296::HUGEINT) * {y}::HUGEINT % 4294967296::HUGEINT)"
        f" * 4294967296::HUGEINT) % {_W64})"
    )


def _minhash_ref_oracle_sql() -> str:
    """Value-level oracle for the BIT-EXACT kperm-ref signatures: XXH64
    seed-0 of each 5-byte gram unrolled as a CTE chain of 128-bit SQL
    steps (short-input path of the public spec — each step references the
    previous step's COLUMN, keeping the SQL linear), element fold
    % 2^31-1 (XXStringViewHash32, hash.h:52-60), the mt19937_64+libstdc++
    (a,b) table inlined, and the MinHashBits=32 per-element mask
    (& 0xFFFFFFFF == mod 2^32, minhash.h:144-146) applied BEFORE the min."""
    from lshdedup.refrng import ref_permutations

    a, b = ref_permutations(REF_CFG.n_perm, REF_CFG.seed)
    rows = ", ".join(
        f"({i}, {int(ai)}::BIGINT, {int(bi)}::BIGINT)"
        for i, (ai, bi) in enumerate(zip(a.tolist(), b.tolist()))
    )
    P1 = "11400714785074694791::HUGEINT"
    P2 = "14029467366897019727::HUGEINT"
    P3 = "1609587929392839161::HUGEINT"
    P5 = "2870177450012600261::HUGEINT"
    byte = lambda j: f"ascii(substr(text, i+{j}, 1))::HUGEINT"  # noqa: E731
    return f"""
        WITH g0 AS (
          SELECT doc_id,
                 ({byte(0)} + {byte(1)}*256 + {byte(2)}*65536
                  + {byte(3)}*16777216) AS w32,
                 {byte(4)} AS b4
          FROM (SELECT doc_id, text,
                       unnest(range(1, length(text)-{REF_CFG.k}+2)) AS i
                FROM documents)
        ),
        -- h = (seed0 + P5 + len); h ^= u32*P1   (w32 < 2^32: plain mul fits)
        s1 AS (SELECT doc_id, b4,
                      xor({P5} + 5::HUGEINT, (w32 * {P1}) % {_W64}) AS h
               FROM g0),
        -- h = rotl(h,23)*P2 + P3  (rotl materialized, then limb-split mul)
        s2a AS (SELECT doc_id, b4, {_rotl_sql('h', 23)} AS h FROM s1),
        s2 AS (SELECT doc_id, b4,
                      ({_mulmod_sql('h', 0xC2B2AE3D27D4EB4F)} + {P3}) % {_W64} AS h
               FROM s2a),
        -- h ^= b*P5; h = rotl(h,11)*P1
        s3 AS (SELECT doc_id,
                      xor(h, (b4 * {P5}) % {_W64}) AS h
               FROM s2),
        s4a AS (SELECT doc_id, {_rotl_sql('h', 11)} AS h FROM s3),
        s4 AS (SELECT doc_id, {_mulmod_sql('h', 0x9E3779B185EBCA87)} AS h FROM s4a),
        -- avalanche: ^>>33 *P2 ^>>29 *P3 ^>>32, then fold % 2^31-1
        s5 AS (SELECT doc_id, xor(h, h // 8589934592::HUGEINT) AS h FROM s4),
        s6 AS (SELECT doc_id, {_mulmod_sql('h', 0xC2B2AE3D27D4EB4F)} AS h FROM s5),
        s7 AS (SELECT doc_id, xor(h, h // 536870912::HUGEINT) AS h FROM s6),
        s8 AS (SELECT doc_id, {_mulmod_sql('h', 0x165667B19E3779F9)} AS h FROM s7),
        gh AS (SELECT DISTINCT doc_id,
                      xor(h, h // 4294967296::HUGEINT) % 2147483647::HUGEINT AS h
               FROM s8),
        perms(lane, pa, pb) AS (VALUES {rows})
        SELECT doc_id, lane::INT AS lane,
               min(((((pa::HUGEINT * h) % {_W64} + pb::HUGEINT) % {_W64})
                    % {_P61}) % 4294967296::HUGEINT)::BIGINT AS sig_value
        FROM gh CROSS JOIN perms
        GROUP BY doc_id, lane
    """


def _simhash_oracle_sql() -> str:
    """Value-level oracle for the SimHash fingerprints: FNV-1a gram hashes
    (WITH multiplicity — votes are occurrence-weighted), 64 per-bit sums as
    one aggregation pass, bit j set iff 2*sum_j > n_grams (the sign of the
    ±1 vote total), packed little-endian with the int64 sign wrap for
    bit 63."""
    fnv = _fnv_sql("text", "i", DOC_CFG.k)
    bitsums = ",\n".join(
        f"sum(((h // {1 << j}::HUGEINT) % 2)::BIGINT) AS s{j}" for j in range(64)
    )
    packed = " + ".join(
        f"CASE WHEN 2*s{j} > n THEN {1 << j}::HUGEINT ELSE 0::HUGEINT END"
        for j in range(64)
    )
    return f"""
        WITH gh AS (
          SELECT doc_id, {fnv} AS h
          FROM (SELECT doc_id, text,
                       unnest(range(1, length(text)-{DOC_CFG.k}+2)) AS i
                FROM documents)
        ),
        b AS (SELECT doc_id, count(*) AS n, {bitsums}
              FROM gh GROUP BY doc_id),
        p AS (SELECT doc_id, ({packed}) AS u FROM b)
        SELECT doc_id,
               (u - CASE WHEN u >= 9223372036854775808::HUGEINT
                         THEN 18446744073709551616::HUGEINT
                         ELSE 0::HUGEINT END)::BIGINT AS simhash
        FROM p
    """


def _rolling_fp_oracle_sql(window: int = 16, keep_mod: int = 8) -> str:
    """Value-level oracle for the winnowing rolling fingerprint: each
    window hash is the 16-term polynomial Σ 257^(w-1-j)·byte[j] mod 2^64
    (coefficients precomputed mod 2^64, every term < 2^72 so HUGEINT never
    overflows); per doc, bit_xor of the hashes ≡ 0 (mod keep_mod), falling
    back to min(hash) when none kept; int64 sign wrap at the end.  Valid
    for docs of length >= window (the driver fixture's minimum is 44)."""
    W = 1 << 64
    coefs = [pow(257, window - 1 - j, W) for j in range(window)]
    terms = " + ".join(
        f"ascii(substr(text, i+{j}, 1))::HUGEINT * {c}::HUGEINT"
        for j, c in enumerate(coefs)
    )
    return f"""
        WITH h AS (
          SELECT doc_id, (({terms}) % {_W64}) AS rh
          FROM (SELECT doc_id, text,
                       unnest(range(1, length(text)-{window}+2)) AS i
                FROM documents)
        ),
        agg AS (
          SELECT doc_id,
                 bit_xor(CASE WHEN rh % {keep_mod} = 0 THEN rh END) AS xorred,
                 count(CASE WHEN rh % {keep_mod} = 0 THEN 1 END) AS kept,
                 min(rh) AS mn
          FROM h GROUP BY doc_id
        ),
        p AS (SELECT doc_id,
                     CASE WHEN kept > 0 THEN xorred ELSE mn END AS u
              FROM agg)
        SELECT doc_id,
               (u - CASE WHEN u >= 9223372036854775808::HUGEINT
                         THEN 18446744073709551616::HUGEINT
                         ELSE 0::HUGEINT END)::BIGINT AS rfp
        FROM p
    """


def _dedup_clusters_oracle_sql(grams: str) -> str:
    """Connected components of the exact char-5-gram J>=0.8 pair graph via a
    recursive reachability CTE; cluster_id = min doc_id of the component
    (singletons = self).  The pipeline's LSH banding at DOC_CFG is aggressive
    enough that its verified pair set equals this exact pair set (pinned by
    the green lsh_dedup_pairs row)."""
    return f"""
        WITH RECURSIVE {grams.split("WITH", 1)[1]},
        d AS (SELECT DISTINCT doc_id, gr FROM g),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        i AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM d a JOIN d b USING (gr)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        p AS (
          SELECT id_a, id_b
          FROM i
          JOIN sz sa ON sa.doc_id = id_a
          JOIN sz sb ON sb.doc_id = id_b
          WHERE 5*c >= 4*(sa.n + sb.n - c)
        ),
        e AS (SELECT id_a AS u, id_b AS v FROM p
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM p),
        lab AS (
          SELECT doc_id AS id, doc_id AS lab FROM documents
          UNION
          SELECT e.u AS id, lab.lab AS lab
          FROM lab JOIN e ON e.v = lab.id
        )
        SELECT id AS doc_id, min(lab) AS cluster_id FROM lab GROUP BY id
    """


def oracle_sql() -> dict[str, str]:
    grams = """
    WITH g AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 5) AS gr
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(length(text)-4,1)+1)) AS i
            FROM documents)
    )"""
    stop_counts = (
        "len(list_filter(string_split(text,' '), x -> list_contains({en}, lower(x)))) AS hits_en,\n"
        "len(list_filter(string_split(text,' '), x -> list_contains({es}, lower(x)))) AS hits_es,\n"
        "len(list_filter(string_split(text,' '), x -> list_contains({fr}, lower(x)))) AS hits_fr"
    ).format(en=_sw_list(STOPWORDS_EN), es=_sw_list(STOPWORDS_ES), fr=_sw_list(STOPWORDS_FR))

    sql = {
        "shingle_profile": f"""
            {grams}
            SELECT doc_id,
                   count(*)::INT AS n_grams,
                   count(DISTINCT gr)::INT AS n_shingles
            FROM g GROUP BY doc_id
        """,
        "shingle_weights": f"""
            {grams}
            SELECT gr AS shingle, count(*)::BIGINT AS total_weight
            FROM g GROUP BY gr
            ORDER BY total_weight DESC, shingle ASC
            LIMIT 100
        """,
        "word_jaccard_pairs": """
            WITH d AS (
              SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 300
            ),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            i AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM d a JOIN d b USING (w)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   c::INT AS inter,
                   (sa.n + sb.n - c)::INT AS uni
            FROM i
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE 2*c >= sa.n + sb.n - c
        """,
        "lsh_dedup_pairs": f"""
            {grams},
            d AS (SELECT DISTINCT doc_id, gr FROM g),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            i AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM d a JOIN d b USING (gr)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   c::INT AS inter,
                   (sa.n + sb.n - c)::INT AS uni
            FROM i
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE 5*c >= 4*(sa.n + sb.n - c)
        """,
        "exact_dup_clusters": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id,
                   count(*) OVER (PARTITION BY md5(text)) AS n_members
            FROM documents
        """,
        "token_stats": """
            SELECT doc_id,
                   length(text)::INT AS n_chars,
                   len(string_split(text, ' '))::INT AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))::INT AS n_distinct_tokens,
                   length(regexp_replace(text, '[0-9A-Za-z\\s]', '', 'g'))::INT AS n_punct,
                   len(list_filter(string_split(text,' '),
                       x -> list_contains({en}, lower(x))))::INT AS n_stopwords,
                   (len(list_filter(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                        x -> length(x) > 0))
                    + length(regexp_replace(text, '[0-9A-Za-z\\s]', '', 'g')))::INT
                       AS n_bpe_tokens
            FROM documents
        """.replace("{en}", _sw_list(STOPWORDS_EN)),
        "quality_scores": """
            SELECT doc_id,
                   0.5 * least(CAST(len(string_split(text,' ')) AS DOUBLE)/64.0, 1.0)
                 + 0.35 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                           / len(string_split(text,' ')))
                 + 0.15 * (1.0 - least(
                       (CAST(length(regexp_replace(text,'[0-9A-Za-z\\s]','','g')) AS DOUBLE)
                        / greatest(length(text), 1)) * 4.0, 1.0))
                   AS quality
            FROM documents
        """,
        "lang_id": f"""
            WITH s AS (
              SELECT doc_id, {stop_counts}
              FROM documents
            )
            SELECT doc_id,
                   hits_en::INT AS hits_en, hits_es::INT AS hits_es,
                   hits_fr::INT AS hits_fr,
                   CASE
                     WHEN greatest(hits_en, hits_es, hits_fr) = 0 THEN 'und'
                     WHEN hits_en = greatest(hits_en, hits_es, hits_fr)
                          AND hits_es < hits_en AND hits_fr < hits_en THEN 'en'
                     WHEN hits_es = greatest(hits_en, hits_es, hits_fr)
                          AND hits_en < hits_es AND hits_fr < hits_es THEN 'es'
                     WHEN hits_fr = greatest(hits_en, hits_es, hits_fr)
                          AND hits_en < hits_fr AND hits_es < hits_fr THEN 'fr'
                     ELSE 'und'
                   END AS lang_pred
            FROM s
        """,
        "word_bigram_jaccard": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 300
            ),
            b AS (
              SELECT DISTINCT doc_id, g
              FROM (SELECT doc_id,
                           unnest(list_transform(range(1, len(w)),
                                  i -> w[i] || ' ' || w[i+1])) AS g
                    FROM t WHERE len(w) >= 2)
            ),
            sz AS (SELECT doc_id, count(*) AS n FROM b GROUP BY doc_id),
            i AS (
              SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c
              FROM b x JOIN b y USING (g)
              WHERE x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b, c::INT AS inter,
                   (sa.n + sb.n - c)::INT AS uni
            FROM i
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE 10*c >= 3*(sa.n + sb.n - c)
        """,
        "embedding_dup_pairs": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a CROSS JOIN e b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        """,
        "dna_kmer_profile": _dna_oracle_prefix() + """
            SELECT doc_id,
                   count(*)::INT AS n_kmers,
                   count(DISTINCT pk)::INT AS n_distinct_kmers,
                   min(pk) AS min_packed,
                   max(pk) AS max_packed
            FROM g GROUP BY doc_id
        """,
        "dna_dup_pairs": _dna_oracle_prefix() + """,
            d AS (SELECT DISTINCT doc_id, pk FROM g),
            sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
            i AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM d a JOIN d b USING (pk)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(c::DOUBLE / (sa.n + sb.n - c), 6) AS sim
            FROM i
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE 5*c >= 4*(sa.n + sb.n - c)
        """,
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(round(l_quantity)::BIGINT) AS BIGINT) AS sum_qty,
                   CAST(sum(round(l_extendedprice*100)::BIGINT) AS BIGINT) AS sum_base_cents,
                   CAST(sum(round(l_extendedprice*100)::BIGINT
                       * (100 - round(l_discount*100)::BIGINT)) AS BIGINT) AS sum_disc_units,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1997-09-01'
            GROUP BY 1, 2
        """,
        "tpch_revenue_by_region": """
            SELECT r_name,
                   CAST(sum(round(l_extendedprice*100)::BIGINT
                       * (100 - round(l_discount*100)::BIGINT)) AS BIGINT) AS revenue_units,
                   count(*)::BIGINT AS n_lineitems
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "tpch_top_suppliers": """
            WITH a AS (
              SELECT s_suppkey, s_name,
                     CAST(sum(round(l_extendedprice*100)::BIGINT
                         * (100 - round(l_discount*100)::BIGINT)) AS BIGINT) AS revenue_units
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            )
            SELECT s_suppkey, s_name, revenue_units, rank::INT AS rank
            FROM (SELECT *, row_number() OVER (ORDER BY revenue_units DESC,
                                               s_suppkey ASC) AS rank
                  FROM a)
            WHERE rank <= 10
        """,
        "events_hourly_rollup": """
            SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS window_start,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   CAST(sum(round(value*100)::BIGINT) AS BIGINT) AS total_value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
              FROM events
            ),
            f AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN prev IS NULL
                               OR floor(epoch(ts)) - floor(epoch(prev)) > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM o
            ),
            s AS (
              SELECT user_id,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM f
            ),
            per AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2)
            SELECT user_id,
                   count(*)::BIGINT AS n_sessions,
                   sum(n)::BIGINT AS n_events,
                   max(n)::BIGINT AS max_session_events
            FROM per GROUP BY user_id
        """,
        "events_topk_per_user": """
            SELECT user_id, event_id, value, rank::INT AS rank
            FROM (SELECT user_id, event_id, value,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY value DESC, event_id ASC)
                             AS rank
                  FROM events)
            WHERE rank <= 3
        """,
        "events_json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
            FROM events
        """,
        "minhash_signatures": _minhash_oracle_sql(),
        "minhash_ref_signatures": _minhash_ref_oracle_sql(),
        "oph_signatures": _oph_oracle_sql(),
        "simhash_fingerprints": _simhash_oracle_sql(),
        "rolling_fingerprints": _rolling_fp_oracle_sql(),
        "dedup_clusters": _dedup_clusters_oracle_sql(grams),
        # same CC oracle + the pinned all-six-stages-resumed constant
        # (see q_dedup_clusters_resumed)
        "dedup_clusters_resumed": (
            "SELECT doc_id, cluster_id, 6 AS resumed_stages FROM ("
            + _dedup_clusters_oracle_sql(grams)
            + ") cc"
        ),
        "fingerprints": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        "lang_distribution": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars
            FROM documents GROUP BY lang
        """,
        "token_topk": """
            SELECT token, count(*)::BIGINT AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 5),
                 c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings WHERE vec_id >= 5),
                 scored AS (
                   SELECT qid, cid,
                          round(list_cosine_similarity(qv, cv), 6) AS cosine
                   FROM q CROSS JOIN c
                 ),
                 ranked AS (
                   SELECT qid, cid, cosine,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cosine DESC, cid ASC) AS rank
                   FROM scored
                 )
            SELECT qid, cid, cosine, rank::INT AS rank FROM ranked WHERE rank <= 5
        """,
    }
    # the streaming pipeline must converge to EXACTLY the batch pipeline's
    # verified pair set (batch==stream equivalence, tests/test_streaming.py),
    # so it shares the lsh_dedup_pairs exact-Jaccard oracle verbatim
    sql["streaming_dedup_pairs"] = sql["lsh_dedup_pairs"]

    # SRP near-dup oracle: the seeded hyperplane matrix is a deterministic
    # literal (PCG64 seed 7), inlined as 64 list rows; the SQL re-derives
    # sign bits (dot > 0), 32 × 2-bit bands (bit j weighted 1 << (j % 2)
    # inside band j // 2 — exactly srp_bands_expr's shift/mask), the band
    # equi-join candidate set, and the rounded-cosine >= 0.35 verify.
    # Margins measured on the fixture (see q_embedding_near_dups): no sign
    # bit, threshold inclusion, or rounding can flip between engines.
    from lshdedup.ann import _hyperplanes

    hmat = _hyperplanes(64, 64, 7)
    hrows = ",\n                ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in hmat[i])}])"
        for i in range(64)
    )
    sql["embedding_near_dups"] = f"""
        WITH hmat(i, hrow) AS (VALUES
                {hrows}),
             hp AS (
               SELECT hmat.i AS i, gs.j AS j, hrow[CAST(gs.j + 1 AS INT)] AS h
               FROM hmat, (SELECT unnest(range(0, 64)) AS j) gs
             ),
             e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
             dots AS (
               SELECT e.vec_id, hp.j,
                      sum(e.v[CAST(hp.i + 1 AS INT)] * hp.h) AS dot
               FROM e CROSS JOIN hp GROUP BY 1, 2
             ),
             bands AS (
               SELECT vec_id, j // 2 AS band_id,
                      CAST(sum(CASE WHEN dot > 0
                                    THEN 1 << CAST(j % 2 AS INT)
                                    ELSE 0 END) AS INT) AS band_val
               FROM dots GROUP BY 1, 2
             ),
             cand AS (
               SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
               FROM bands a JOIN bands b USING (band_id, band_val)
               WHERE a.vec_id < b.vec_id
             )
        SELECT id_a, id_b,
               round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
        FROM cand
        JOIN e ea ON ea.vec_id = id_a
        JOIN e eb ON eb.vec_id = id_b
        WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.35
    """

    # dense-CWS oracle: the (64×128) r/ln_c/beta sample matrices are
    # deterministic PCG64 seed-1 draws, inlined as 64 rows of three
    # 128-element list literals; the SQL re-derives Ioffe CWS lane by
    # lane — t = floor(ln w / r + β), ln_a = ln_c − (t − β)·r − r,
    # k* = argmin (first-min tie-break = smallest dim index, matching
    # np.argmin), packed (k* << 32) + zigzag(t).  Measured margins (see
    # q_wminhash_signatures) guarantee no floor or argmin flip between
    # engines.  The SET variant's driver check runs at wm_dim=64 so the
    # SAME matrices cover it (oracle below); only the library-default
    # dim=4096 configuration would need 1.5M literals.
    from lshdedup.wminhash import random_samples

    r_m, c_m, b_m = random_samples(64, 128, 1)

    def _lst(row):
        return "[" + ", ".join(repr(float(x)) for x in row) + "]"

    cm_rows = ",\n                ".join(
        f"({i}, {_lst(r_m[i])}, {_lst(c_m[i])}, {_lst(b_m[i])})"
        for i in range(64)
    )
    sql["wminhash_signatures"] = f"""
        WITH cm(i, rrow, crow, brow) AS (VALUES
                {cm_rows}),
             cws AS (
               SELECT cm.i AS i, g.j AS j,
                      rrow[CAST(g.j + 1 AS INT)] AS r,
                      crow[CAST(g.j + 1 AS INT)] AS ln_c,
                      brow[CAST(g.j + 1 AS INT)] AS beta
               FROM cm, (SELECT unnest(range(0, 128)) AS j) g
             ),
             e AS (SELECT vec_id, CAST(embedding AS FLOAT[]) AS v
                   FROM embeddings),
             wx AS (
               SELECT vec_id, gs.i AS i,
                      CAST(abs(v[CAST(gs.i + 1 AS INT)]) AS DOUBLE) AS w
               FROM e, (SELECT unnest(range(0, 64)) AS i) gs
               WHERE abs(v[CAST(gs.i + 1 AS INT)]) > 0
             ),
             lanes AS (
               SELECT wx.vec_id, cws.j AS lane, wx.i,
                      floor(ln(wx.w) / cws.r + cws.beta) AS t,
                      cws.ln_c
                        - (floor(ln(wx.w) / cws.r + cws.beta) - cws.beta)
                          * cws.r
                        - cws.r AS ln_a
               FROM wx JOIN cws ON cws.i = wx.i
             ),
             best AS (
               SELECT vec_id, lane, i, t,
                      row_number() OVER (PARTITION BY vec_id, lane
                                         ORDER BY ln_a ASC, i ASC) AS rn
               FROM lanes
             )
        SELECT vec_id, lane::INT AS lane,
               (i::BIGINT << 32)
                 + (CAST(abs(t) AS BIGINT) * 2
                    + CASE WHEN t < 0 THEN 1 ELSE 0 END) AS sig
        FROM best WHERE rn = 1
    """

    # set-CWS oracle (wm_dim = 64 = dense dim, so the SAME inlined sample
    # matrices apply): token weights = word counts, position = FNV-1a-64 of
    # the token's bytes (seed 1 → init = basis XOR 1) mod 64 via
    # list_reduce (variable-length tokens, unrollable-free), collisions
    # sum (integer counts → exact in any order), then the identical CWS
    # lane math.  ASCII-only fixture (same contract as _fnv_sql).
    sql["wminhash_set_signatures"] = f"""
        WITH cm(i, rrow, crow, brow) AS (VALUES
                {cm_rows}),
             cws AS (
               SELECT cm.i AS i, g.j AS j,
                      rrow[CAST(g.j + 1 AS INT)] AS r,
                      crow[CAST(g.j + 1 AS INT)] AS ln_c,
                      brow[CAST(g.j + 1 AS INT)] AS beta
               FROM cm, (SELECT unnest(range(0, 128)) AS j) g
             ),
             tw AS (
               SELECT doc_id, tok, count(*)::DOUBLE AS cnt
               FROM (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS tok
                     FROM documents)
               GROUP BY doc_id, tok
             ),
             pos AS (
               SELECT doc_id,
                      CAST(list_reduce(
                             list_prepend(
                               xor(14695981039346656037::HUGEINT,
                                   1::HUGEINT),
                               list_transform(
                                 range(1, length(tok) + 1),
                                 ii -> ascii(substr(tok, CAST(ii AS INT), 1))::HUGEINT)),
                             (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                                       % 18446744073709551616::HUGEINT
                           ) % {WMH_SET_DIM} AS BIGINT) AS i,
                      cnt
               FROM tw
             ),
             wx AS (
               SELECT doc_id, i, sum(cnt) AS w
               FROM pos GROUP BY doc_id, i
               HAVING sum(cnt) > 0
             ),
             lanes AS (
               SELECT wx.doc_id, cws.j AS lane, wx.i,
                      floor(ln(wx.w) / cws.r + cws.beta) AS t,
                      cws.ln_c
                        - (floor(ln(wx.w) / cws.r + cws.beta) - cws.beta)
                          * cws.r
                        - cws.r AS ln_a
               FROM wx JOIN cws ON cws.i = wx.i
             ),
             best AS (
               SELECT doc_id, lane, i, t,
                      row_number() OVER (PARTITION BY doc_id, lane
                                         ORDER BY ln_a ASC, i ASC) AS rn
               FROM lanes
             )
        SELECT doc_id, lane::INT AS lane,
               (i::BIGINT << 32)
                 + (CAST(abs(t) AS BIGINT) * 2
                    + CASE WHEN t < 0 THEN 1 ELSE 0 END) AS sig
        FROM best WHERE rn = 1
    """

    # seeded-IVF oracle: centroids = 16 smallest-md5 corpus rows, cell
    # assignment = argmax rounded cosine (tie → smaller cent_id), queries
    # probe their 8 nearest cells, candidates re-rank exactly — the full
    # ivf_topk_seeded chain re-derived (margins: see q_embedding_ivf_topk)
    sql["embedding_ivf_topk"] = """
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id >= 5),
             cent AS (
               -- (md5, cid) compound order matches ivf_topk_seeded's
               -- (_ckey, _cid) pick: deterministic under duplicate keys
               SELECT cv AS centv,
                      row_number() OVER (
                        ORDER BY md5(CAST(cid AS VARCHAR)) ASC, cid ASC)
                        - 1 AS cent_id
               FROM c
               QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(cid AS VARCHAR)) ASC, cid ASC) <= 16
             ),
             cassign AS (
               SELECT cid, cv, cent_id,
                      row_number() OVER (
                        PARTITION BY cid
                        ORDER BY round(list_cosine_similarity(cv, centv), 6)
                                   DESC,
                                 cent_id ASC) AS rn
               FROM c CROSS JOIN cent
             ),
             cb AS (SELECT cid, cv, cent_id AS cell FROM cassign WHERE rn = 1),
             qprobe AS (
               SELECT qid, qv, cent_id,
                      row_number() OVER (
                        PARTITION BY qid
                        ORDER BY round(list_cosine_similarity(qv, centv), 6)
                                   DESC,
                                 cent_id ASC) AS rn
               FROM q CROSS JOIN cent
             ),
             qb AS (SELECT qid, qv, cent_id AS cell FROM qprobe WHERE rn <= 8),
             scored AS (
               SELECT qid, cid,
                      round(list_cosine_similarity(qv, cv), 6) AS cosine
               FROM qb JOIN cb USING (cell)
             ),
             ranked AS (
               SELECT qid, cid, cosine,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, cid ASC) AS rank
               FROM scored
             )
        SELECT qid, cid, cosine, rank::INT AS rank FROM ranked WHERE rank <= 5
    """

    # cell-spilling oracle: identical chain, but corpus rows keep their
    # TWO highest-cosine cells (rn <= 2), queries probe 4, and the pair
    # dedup (a pair is joinable through both shared cells) is one
    # DISTINCT — cosine is deterministic per pair, so DISTINCT is exact
    sql["embedding_ivf_spill"] = """
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id >= 5),
             cent AS (
               SELECT cv AS centv,
                      row_number() OVER (
                        ORDER BY md5(CAST(cid AS VARCHAR)) ASC, cid ASC)
                        - 1 AS cent_id
               FROM c
               QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(cid AS VARCHAR)) ASC, cid ASC) <= 16
             ),
             cassign AS (
               SELECT cid, cv, cent_id,
                      row_number() OVER (
                        PARTITION BY cid
                        ORDER BY round(list_cosine_similarity(cv, centv), 6)
                                   DESC,
                                 cent_id ASC) AS rn
               FROM c CROSS JOIN cent
             ),
             cb AS (SELECT cid, cv, cent_id AS cell FROM cassign
                    WHERE rn <= 2),
             qprobe AS (
               SELECT qid, qv, cent_id,
                      row_number() OVER (
                        PARTITION BY qid
                        ORDER BY round(list_cosine_similarity(qv, centv), 6)
                                   DESC,
                                 cent_id ASC) AS rn
               FROM q CROSS JOIN cent
             ),
             qb AS (SELECT qid, qv, cent_id AS cell FROM qprobe WHERE rn <= 4),
             scored AS (
               SELECT DISTINCT qid, cid,
                      round(list_cosine_similarity(qv, cv), 6) AS cosine
               FROM qb JOIN cb USING (cell)
             ),
             ranked AS (
               SELECT qid, cid, cosine,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, cid ASC) AS rank
               FROM scored
             )
        SELECT qid, cid, cosine, rank::INT AS rank FROM ranked WHERE rank <= 5
    """

    # multimodal pHash oracle: the full decode→DCT→median→band→hamming
    # chain in SQL.  E folds the 16→32 duplicate-pixel resample into the
    # first 8 DCT-II rows (E[u,y] = D32[u,2y] + D32[u,2y+1], exact);
    # freq = E·px·Eᵀ as two join-aggregates; pow2 literals avoid HUGEINT
    # shift support questions; the pHash sets only bits 0..62 (63 AC
    # coefficients), so it is always non-negative and needs no sign
    # conversion.  Margins: see q_multimodal_phash_pairs.
    from lshdedup.codec import _dct_matrix

    d32 = _dct_matrix(32)
    e_m = d32[:8, 0::2] + d32[:8, 1::2]  # 8×16
    e_rows = ",\n                ".join(
        f"({u}, CAST([{', '.join(repr(float(x)) for x in e_m[u])}] "
        "AS DOUBLE[]))"
        for u in range(8)
    )
    pow2_rows = ", ".join(f"({j}, {1 << j}::HUGEINT)" for j in range(63))
    mm_key = "concat(CAST(i // 4 AS VARCHAR), ':', CAST(p AS VARCHAR))"
    sql["multimodal_phash_pairs"] = f"""
        WITH e8(u, erow) AS (VALUES
                {e_rows}),
             pow2(j, w) AS (VALUES {pow2_rows}),
             ids AS (
               SELECT unnest(range(0,
                        GREATEST({MM_N_MIN}, LEAST({MM_N_MAX},
                          (SELECT count(*) FROM documents))))) AS i
             ),
             px AS (
               SELECT i, p,
                      CAST(list_reduce(
                             list_prepend(
                               14695981039346656037::HUGEINT,
                               list_transform(
                                 range(1, length({mm_key}) + 1),
                                 ii -> ascii(substr({mm_key},
                                         CAST(ii AS INT), 1))::HUGEINT)),
                             (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                                       % {_W64}
                           ) % 256 AS BIGINT) AS v0
               FROM ids CROSS JOIN (SELECT unnest(range(0, 256)) AS p) gs
             ),
             dec AS (
               SELECT i, p,
                      CASE WHEN i % 3 = 0
                           THEN LEAST((v0 // 4) * 4 + 2, 255)
                           ELSE v0 END AS v
               FROM px
             ),
             tmp AS (
               SELECT d.i, e8.u, (d.p % 16) AS x,
                      sum(erow[CAST(d.p // 16 + 1 AS INT)] * d.v) AS tv
               FROM dec d CROSS JOIN e8
               GROUP BY d.i, e8.u, x
             ),
             freq AS (
               SELECT t.i, t.u, e8.u AS v2,
                      sum(t.tv * e8.erow[CAST(t.x + 1 AS INT)]) AS fv
               FROM tmp t CROSS JOIN e8
               GROUP BY t.i, t.u, v2
             ),
             -- MATERIALIZED: med and sig must read the SAME float
             -- realization of fv — DuckDB otherwise inlines the CTE and
             -- re-runs the aggregation with a different parallel order,
             -- so the middle element re-derived in med can differ by
             -- ulps from the fv it is compared against in sig
             vals AS MATERIALIZED (
               SELECT i, (u * 8 + v2) AS idx, fv
               FROM freq WHERE (u * 8 + v2) > 0
             ),
             -- EXACT middle element (rank 32 of 63), NOT median():
             -- DuckDB's median interpolates and its position arithmetic
             -- can land ulps below the middle element, flipping that
             -- element's own fv > m bit; np.median of an odd count
             -- returns the element itself
             med AS (
               SELECT i, fv AS m FROM (
                 SELECT i, fv,
                        row_number() OVER (PARTITION BY i ORDER BY fv) AS rn
                 FROM vals) ranked_vals
               WHERE rn = 32
             ),
             sig AS (
               SELECT vals.i,
                      CAST(sum(CASE WHEN fv > m THEN w
                                    ELSE 0::HUGEINT END) AS BIGINT) AS s
               FROM vals
               JOIN med ON med.i = vals.i
               JOIN pow2 ON pow2.j = vals.idx - 1
               GROUP BY vals.i
             ),
             bandrows AS (
               SELECT i, s, bb.band_id,
                      CAST((s::HUGEINT // bb.bdiv) % 65536 AS BIGINT)
                        AS band_val
               FROM sig,
                    (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
                            (2, 4294967296::HUGEINT),
                            (3, 281474976710656::HUGEINT)) bb(band_id, bdiv)
             ),
             pairs AS (
               SELECT DISTINCT a.i AS id_a, b2.i AS id_b,
                               a.s AS sa, b2.s AS sb
               FROM bandrows a
               JOIN bandrows b2
                 ON a.band_id = b2.band_id
                AND a.band_val = b2.band_val
                AND a.i < b2.i
             )
        SELECT id_a, id_b,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM pairs
        WHERE bit_count(xor(sa, sb)) <= 3
    """

    # jpeg_block_roundtrip: recompute the per-image pixel statistics from
    # the generative formula val = splitmix64(img·24 + block) % 256 in
    # pure integer SQL (same xor-shift + limb-multiply chain as the OPH
    # oracle; GAMMA add first, since hashing.splitmix64 includes it).
    # The Spark side gets these numbers by DECODING REAL JPEG BYTES in
    # executors — the match proves the wire path is lossless for the
    # constant-block family (see q_jpeg_block_roundtrip's docstring).
    jb_gamma = 0x9E3779B97F4A7C15
    jb_nb = JB_GRID[0] * JB_GRID[1]
    sql["jpeg_block_roundtrip"] = f"""
        WITH params AS (
          SELECT GREATEST({JB_N_MIN},
                          LEAST({JB_N_MAX},
                                (SELECT count(*) FROM documents))) AS n
        ),
        xs AS (
          SELECT unnest(range(0, (SELECT n FROM params) * {jb_nb})) AS x
        ),
        s0 AS (SELECT x, (x::HUGEINT + {jb_gamma}::HUGEINT) % {_W64} AS z
               FROM xs),
        s1 AS (SELECT x, xor(z, z // 1073741824::HUGEINT) AS z FROM s0),
        s2 AS (SELECT x, {_mulmod_sql('z', 0xBF58476D1CE4E5B9)} AS z FROM s1),
        s3 AS (SELECT x, xor(z, z // 134217728::HUGEINT) AS z FROM s2),
        s4 AS (SELECT x, {_mulmod_sql('z', 0x94D049BB133111EB)} AS z FROM s3),
        s5 AS (SELECT x, xor(z, z // 2147483648::HUGEINT) AS z FROM s4),
        vals AS (
          SELECT x // {jb_nb} AS img_id, CAST(z % 256 AS INT) AS v FROM s5
        )
        SELECT img_id,
               CAST(64 * sum(v) AS BIGINT) AS pixel_sum,
               MIN(v) AS px_min,
               MAX(v) AS px_max,
               {jb_nb} * 64 AS n_px
        FROM vals
        GROUP BY img_id
    """

    # mjpeg_frame_stats: statistics of every VD_EVERY-th frame of each
    # MJPEG stream, recomputed from the generative formula
    # val = splitmix64((vid·VD_F + frame)·nb + block) % 256 in pure
    # integer SQL.  The Spark side gets these numbers by structurally
    # splitting REAL concatenated-JPEG streams and entropy-decoding the
    # sampled frames in executors (see q_mjpeg_frame_stats).
    sql["mjpeg_frame_stats"] = f"""
        WITH params AS (
          SELECT GREATEST({VD_N_MIN},
                          LEAST({VD_N_MAX},
                                (SELECT count(*) FROM documents))) AS n
        ),
        xs AS (
          SELECT unnest(range(0,
                   (SELECT n FROM params) * {VD_F} * {jb_nb})) AS x
        ),
        s0 AS (SELECT x, (x::HUGEINT + {jb_gamma}::HUGEINT) % {_W64} AS z
               FROM xs),
        s1 AS (SELECT x, xor(z, z // 1073741824::HUGEINT) AS z FROM s0),
        s2 AS (SELECT x, {_mulmod_sql('z', 0xBF58476D1CE4E5B9)} AS z FROM s1),
        s3 AS (SELECT x, xor(z, z // 134217728::HUGEINT) AS z FROM s2),
        s4 AS (SELECT x, {_mulmod_sql('z', 0x94D049BB133111EB)} AS z FROM s3),
        s5 AS (SELECT x, xor(z, z // 2147483648::HUGEINT) AS z FROM s4),
        vals AS (
          SELECT x // ({VD_F} * {jb_nb}) AS vid,
                 (x // {jb_nb}) % {VD_F} AS frame,
                 CAST(z % 256 AS INT) AS v
          FROM s5
        )
        SELECT CAST(vid AS VARCHAR) AS video_id,
               CAST(frame AS INT) AS frame_idx,
               CAST(64 * sum(v) AS BIGINT) AS pixel_sum,
               MIN(v) AS px_min,
               MAX(v) AS px_max,
               {jb_nb} * 64 AS n_px
        FROM vals
        WHERE frame % {VD_EVERY} = 0
        GROUP BY vid, frame
    """

    # wav_sample_stats: per-clip statistics of the PCM16 samples
    # val = splitmix64(aid·WA_S + i) % 65536 − 32768, recomputed in pure
    # integer SQL.  The Spark side gets these numbers by decoding REAL
    # RIFF/WAVE bytes in executors (see q_wav_sample_stats).
    sql["wav_sample_stats"] = f"""
        WITH params AS (
          SELECT GREATEST({WA_N_MIN},
                          LEAST({WA_N_MAX},
                                (SELECT count(*) FROM documents))) AS n
        ),
        xs AS (
          SELECT unnest(range(0, (SELECT n FROM params) * {WA_S})) AS x
        ),
        s0 AS (SELECT x, (x::HUGEINT + {jb_gamma}::HUGEINT) % {_W64} AS z
               FROM xs),
        s1 AS (SELECT x, xor(z, z // 1073741824::HUGEINT) AS z FROM s0),
        s2 AS (SELECT x, {_mulmod_sql('z', 0xBF58476D1CE4E5B9)} AS z FROM s1),
        s3 AS (SELECT x, xor(z, z // 134217728::HUGEINT) AS z FROM s2),
        s4 AS (SELECT x, {_mulmod_sql('z', 0x94D049BB133111EB)} AS z FROM s3),
        s5 AS (SELECT x, xor(z, z // 2147483648::HUGEINT) AS z FROM s4),
        vals AS (
          SELECT x // {WA_S} AS aid,
                 CAST(z % 65536 AS INT) - 32768 AS v
          FROM s5
        )
        SELECT CAST(aid AS VARCHAR) AS audio_id,
               16000 AS sample_rate,
               1 AS channels,
               {WA_S} AS n_samples,
               CAST(sum(v) AS BIGINT) AS sample_sum,
               MIN(v) AS smp_min,
               MAX(v) AS smp_max
        FROM vals
        GROUP BY aid
    """

    # gif_frame_stats: statistics of every GF_EVERY-th frame of each
    # animated GIF, recomputed from the generative formula
    # val = splitmix64((vid·GF_F + frame)·npx + p) % 256 in pure integer
    # SQL.  The Spark side gets these numbers by walking REAL GIF
    # containers and LZW-decoding the sampled frames in executors
    # (see q_gif_frame_stats) — lossless, so no family restriction.
    gf_npx = GF_H * GF_W
    sql["gif_frame_stats"] = f"""
        WITH params AS (
          SELECT GREATEST({GF_N_MIN},
                          LEAST({GF_N_MAX},
                                (SELECT count(*) FROM documents))) AS n
        ),
        xs AS (
          SELECT unnest(range(0,
                   (SELECT n FROM params) * {GF_F} * {gf_npx})) AS x
        ),
        s0 AS (SELECT x, (x::HUGEINT + {jb_gamma}::HUGEINT) % {_W64} AS z
               FROM xs),
        s1 AS (SELECT x, xor(z, z // 1073741824::HUGEINT) AS z FROM s0),
        s2 AS (SELECT x, {_mulmod_sql('z', 0xBF58476D1CE4E5B9)} AS z FROM s1),
        s3 AS (SELECT x, xor(z, z // 134217728::HUGEINT) AS z FROM s2),
        s4 AS (SELECT x, {_mulmod_sql('z', 0x94D049BB133111EB)} AS z FROM s3),
        s5 AS (SELECT x, xor(z, z // 2147483648::HUGEINT) AS z FROM s4),
        vals AS (
          SELECT x // ({GF_F} * {gf_npx}) AS vid,
                 (x // {gf_npx}) % {GF_F} AS frame,
                 CAST(z % 256 AS INT) AS v
          FROM s5
        )
        SELECT CAST(vid AS VARCHAR) AS video_id,
               CAST(frame AS INT) AS frame_idx,
               CAST(sum(v) AS BIGINT) AS pixel_sum,
               MIN(v) AS px_min,
               MAX(v) AS px_max,
               {gf_npx} AS n_px
        FROM vals
        WHERE frame % {GF_EVERY} = 0
        GROUP BY vid, frame
    """
    return sql
