"""Adversarial key-skew at pipeline scale (north-rule scale safeguard;
the reference's single-map LSH has no analogue — lsh.h:40,121 chains
grow unboundedly).

The worst realistic key distribution for this pipeline is a corpus where
HALF the rows share one caption but carry distinct images (copy-pasted
alt-text across distinct product photos): the exact-dup collapse keys on
(caption, phash) so it cannot fire, and every caption-dominated band
piles the whole hot set into one bucket — m²/2 pair work per band
without a safeguard.  These tests pin, on a 12k-row corpus (30× the
normal pipeline fixtures):

  * the bucket cap engages (skew_report rows, max bucket_size = hot-set
    size), the pipeline completes with a bounded candidate count, and
    rows OUTSIDE the hot set get bit-identical cluster assignments to a
    control run without the hot set — capping is local to the hot keys;
  * explicit pair salting (cfg.pair_salt) leaves the candidate-pair set
    bit-identical while provably spreading a hot bucket's join key space
    (max/mean sub-key occupancy ≤ 2 at salt=8), so the m² reduce work
    lands on pair_salt reducers instead of one.
"""

from __future__ import annotations

import pytest
from dataclasses import replace

from pyspark.sql import functions as F

from lshdedup.config import DedupConfig
from lshdedup.lsh import candidate_pairs, explode_bands
from lshdedup.minhash import add_signatures
from lshdedup.pipeline import dedup_pipeline
from lshdedup.synth import SynthConfig, synth_corpus

HOT_CAPTION = (
    "identical marketing alt text copied verbatim across every distinct "
    "product image uploaded to the catalog pipeline"
)


def _hot_rows(spark, n: int, start_id: int = 0):
    """n rows sharing HOT_CAPTION with distinct, deterministic phashes.

    ids sort AFTER the synth half's img%010d ids ("z" prefix) so min-id
    cluster labels of the non-hot rows cannot be claimed by a hot row.
    """
    return spark.range(n).select(
        F.format_string("zhot%07d", F.col("id") + start_id).alias("image_id"),
        F.lit(HOT_CAPTION).alias("caption"),
        F.xxhash64(F.col("id") + start_id, F.lit("skewfixture")).alias("phash"),
    )


def _narrow(df):
    return df.select("image_id", "caption", "phash")


CFG = DedupConfig(
    threshold=0.7, n_perm=128, b=32, r=4, fp_weight=0.1, fn_weight=0.9,
    use_phash=True,
)


def test_hot_caption_cap_engages_and_nonhot_clusters_unchanged(spark):
    n_hot = 6000
    synth = _narrow(synth_corpus(spark, SynthConfig(n_rows=6000))).cache()
    synth.count()
    corpus = synth.unionByName(_hot_rows(spark, n_hot)).cache()
    try:
        cfg = replace(CFG, bucket_cap=512)
        res = dedup_pipeline(spark, corpus, cfg)

        skew = res.skew_report.collect()
        assert len(skew) > 0, "cap never engaged on a 6000-row hot caption"
        # caption-dominated bands hold most of the hot set in ONE bucket
        # (a row leaves a band's bucket iff one of its r lanes is
        # phash-dominated, so the biggest bucket is slightly under n_hot:
        # 5304/6000 at this fixed corpus+seed)
        assert max(r["bucket_size"] for r in skew) >= 0.8 * n_hot
        # bounded pair generation: without the cap, caption-dominated bands
        # alone contribute ~hot²/2 = 18M candidate pairs; with it the
        # candidate count stays ~the synth half's (plus the few hot pairs
        # that leak through small phash-dominated buckets)
        n_cand = res.candidates.count()
        assert n_cand < 200_000, f"candidate blowup: {n_cand}"

        full_map = {
            r["image_id"]: r["cluster_id"] for r in res.clusters.collect()
        }
        res.unpersist()

        control = dedup_pipeline(spark, synth, cfg)
        control_map = {
            r["image_id"]: r["cluster_id"] for r in control.clusters.collect()
        }
        control.unpersist()
        # capping is local to the hot keys: every non-hot row clusters
        # identically with or without the adversarial half present
        assert {k: v for k, v in full_map.items() if not k.startswith("z")} == (
            control_map
        )
    finally:
        corpus.unpersist()
        synth.unpersist()


@pytest.fixture(scope="module")
def salted_fixture(spark):
    """300-row hot group (under the default 4096 cap → eligible for pair
    generation) + 700 synth rows, signed and banded once."""
    synth = _narrow(synth_corpus(spark, SynthConfig(n_rows=700)))
    corpus = synth.unionByName(_hot_rows(spark, 300)).cache()
    corpus.count()
    cfg = CFG
    signed = add_signatures(corpus, cfg).cache()
    buckets = explode_bands(signed, "image_id", "sig", cfg)
    yield cfg, signed, buckets
    signed.unpersist()
    corpus.unpersist()


def test_pair_salt_preserves_pair_set(spark, salted_fixture):
    cfg, _, buckets = salted_fixture
    unsalted, _ = candidate_pairs(buckets, "image_id", cfg)
    salted_cfg = replace(cfg, pair_salt=8)
    salted, _ = candidate_pairs(buckets, "image_id", salted_cfg)
    a = {(r["id_a"], r["id_b"]) for r in unsalted.collect()}
    b = {(r["id_a"], r["id_b"]) for r in salted.collect()}
    assert a == b and len(a) > 40_000  # 300-row hot bucket alone ≈ 44k pairs
    # the salted plan really joins on the salt key (the work-spreading is
    # in the shuffle key space, not post-hoc)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan


def test_pair_salt_spreads_hot_bucket_key_space(spark, salted_fixture):
    """The documented salt expression pmod(xxhash64(id), s) must split the
    hot bucket's left side near-uniformly over s sub-keys — measured on
    the REAL hot-row ids, max/mean occupancy ≤ 2 — so a bucket of size m
    does ≤ 2·m²/s pair work per reducer instead of m² on one."""
    s = 8
    counts = [
        r["n"]
        for r in _hot_rows(spark, 300)
        .groupBy(F.pmod(F.xxhash64("image_id"), F.lit(s)).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == s
    assert max(counts) / (sum(counts) / s) <= 2.0
