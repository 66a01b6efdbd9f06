"""Extra (non-frozen) benchmarks — stage-resolved profiling per guide §1.

The frozen bench.py times whole queries; this file isolates each stage of
the flagship image_dedup pipeline with noop sinks (guide §1.4) and labeled
jobs (§1.5) so optimization targets the operator that actually burns the
time.  Numbers here feed OPTIMIZATION_r06.md; the driver's measurement
still runs the round-start bench.py.

usage: python bench_extra.py --stages [n_images]
       python bench_extra.py --queries          # per-bench-query isolation
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_profile(n_images: int = 20_000, cpus: int = 32) -> dict:
    from lshdedup.config import DedupConfig
    from lshdedup.lsh import candidate_pairs, exact_dup_groups, explode_bands
    from lshdedup.minhash import add_signatures
    from lshdedup.cluster import assign_clusters
    from lshdedup.params import optimal_params
    from lshdedup.session import get_spark
    from lshdedup.synth import SynthConfig, synth_corpus
    from lshdedup.verify import verify_pairs

    spark = get_spark(
        app_name="lshdedup-stage-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    corpus = synth_corpus(
        spark, SynthConfig(n_rows=n_images), partitions=max(cpus * 2, 8)
    ).persist()
    corpus.count()

    cfg = DedupConfig(
        threshold=0.7, n_perm=128, b=32, r=4, fp_weight=0.1, fn_weight=0.9,
        shuffle_partitions=max(cpus, 16), sig_scheme="oph",
    ).resolved(optimal_params)
    t: dict[str, float] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        return out

    narrow = corpus.select("image_id", "caption", "phash")

    # 1. exact-dup collapse
    reps, exact_edges = exact_dup_groups(narrow, "image_id", ["caption", "phash"])
    reps = timed("1_exact_dup_reps", lambda: reps.persist())
    timed("1a_exact_dup_materialize", lambda: _noop(reps))
    timed("1b_exact_edges", lambda: _noop(exact_edges))

    # 2. signatures
    signed = add_signatures(reps, cfg, text_col="caption", phash_col="phash").persist()
    timed("2_signatures", lambda: _noop(signed))

    # 3. banding + bucket sizing + self-join
    buckets = explode_bands(signed, "image_id", "sig", cfg)
    timed("3_band_explode", lambda: _noop(buckets))
    pairs, skew = candidate_pairs(buckets, "image_id", cfg)
    pairs = pairs.persist()
    timed("4_candidate_pairs", lambda: _noop(pairs))
    timed("4a_skew_report", lambda: skew.count())

    # 5. verify
    verified = verify_pairs(
        pairs, signed, cfg, id_col="image_id", text_col="caption",
        phash_col="phash",
    )
    timed("5_verify", lambda: _noop(verified))
    dup_pairs = verified.filter(F.col("is_dup"))

    # 6. connected components + final assignment
    edges = dup_pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(exact_edges.select("src", "dst"))
    clusters = assign_clusters(narrow, edges, id_col="image_id")
    timed("6_cc_clusters", lambda: clusters.select("cluster_id").distinct().count())

    t["total_staged"] = round(sum(v for k, v in t.items() if k != "total_staged"), 3)
    spark.stop()
    return t


def query_profile(sf_dir: str, cpus: int = 32) -> dict:
    """Isolate the non-pipeline bench queries with noop sinks."""
    import __spark_entry__ as entry_mod
    from lshdedup.config import DedupConfig
    from lshdedup.minhash import add_signatures
    from lshdedup.session import get_spark

    spark = get_spark(
        app_name="lshdedup-query-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    t: dict[str, float] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        t[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc_cfg = DedupConfig(k=5, n_perm=128, b=32, r=4, use_phash=False, threshold=0.8)
    signed = add_signatures(docs, doc_cfg, text_col="text", phash_col="_none_")
    timed("doc_signatures_noop", lambda: _noop(signed))
    timed("doc_signatures_noop_warm", lambda: _noop(signed))

    timed("doc_lsh_dedup_count", lambda: entry_mod.q_lsh_dedup_pairs(spark, sf_dir).count())
    timed("doc_lsh_dedup_count_warm", lambda: entry_mod.q_lsh_dedup_pairs(spark, sf_dir).count())

    from lshdedup.ann import ivf_topk, srp_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qvec")
    )
    c = emb.filter(F.col("vec_id") >= 50).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cvec")
    )
    timed("embedding_ann", lambda: srp_topk(q, c, k=10, dim=64).count())
    timed(
        "embedding_ivf",
        lambda: ivf_topk(
            q, c, k=10, dim=64, n_cells=16, n_probe=8, corpus_spill=2
        ).collect(),
    )
    timed(
        "embedding_ivf_warm",
        lambda: ivf_topk(
            q, c, k=10, dim=64, n_cells=16, n_probe=8, corpus_spill=2
        ).collect(),
    )
    spark.stop()
    return t


def _steal_sec() -> float:
    """Cumulative hypervisor steal seconds from /proc/stat — labels every
    measurement with the window quality it ran in (BASELINE.md: delivered
    throughput swings ±40% across windows; steal is the kernel's record)."""
    return int(open("/proc/stat").readline().split()[8]) / 100.0


def pipeline_repeat(n_images: int, reps: int, cpus: int) -> dict:
    """The in-session measurement primitive behind OPTIMIZATION_r06.md's
    decisions: run the flagship pipeline ``reps`` times in ONE warm JVM,
    clearing caches between runs, with per-run wall + steal.  Run this for
    variant A, switch the code (or flag), run again — medians of the warm
    runs compare variants without paying JVM/window drift between them."""
    from lshdedup.config import DedupConfig
    from lshdedup.pipeline import dedup_pipeline
    from lshdedup.session import get_spark
    from lshdedup.synth import SynthConfig, synth_corpus

    spark = get_spark(
        app_name="lshdedup-pipeline-repeat",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus(
        spark, SynthConfig(n_rows=n_images), partitions=max(cpus * 2, 8)
    ).persist()
    corpus.count()
    cfg = DedupConfig(
        threshold=0.7, n_perm=128, b=32, r=4, fp_weight=0.1, fn_weight=0.9,
        shuffle_partitions=max(cpus, 16), sig_scheme="oph",
    )
    runs = []
    for _ in range(reps):
        s0 = _steal_sec()
        t0 = time.perf_counter()
        res = dedup_pipeline(spark, corpus, cfg)
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        wall = round(time.perf_counter() - t0, 3)
        res.unpersist()
        spark.catalog.clearCache()
        corpus.persist()
        corpus.count()
        runs.append({"wall": wall, "clusters": n_clusters,
                     "steal": round(_steal_sec() - s0, 1)})
        print(json.dumps(runs[-1]), file=sys.stderr, flush=True)
    spark.stop()
    warm = sorted(r["wall"] for r in runs[1:]) or [runs[0]["wall"]]
    return {"n_images": n_images, "cpus": cpus, "runs": runs,
            "median_warm": warm[len(warm) // 2]}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "--stages"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if mode == "--stages":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
        print(json.dumps(stage_profile(n, cpus)))
    elif mode == "--queries":
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(json.dumps(query_profile(sf_dir, cpus)))
    elif mode == "--pipeline-repeat":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        print(json.dumps(pipeline_repeat(n, reps, cpus)))
    sys.stdout.flush()
