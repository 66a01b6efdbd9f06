"""Capture .explain('formatted') for every query path touched in the r6
optimization round, into plans/r06/<name>_{before,after}.txt.

Run from the tree whose plans you want:
    python jobs/capture_plans_r06.py after  /root/repo/plans/r06
    (cd /tmp/wt_r5 && python jobs/capture_plans_r06.py before /root/repo/plans/r06)

Uses sf0.1 and the bench geometry so the plans match what bench.py runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(tag: str, outdir: str) -> None:
    from lshdedup.config import DedupConfig
    from lshdedup.session import get_spark

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name=f"plan-capture-{tag}", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def cap(name, df):
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(p)
        print("captured", name, tag)

    import __spark_entry__ as entry_mod

    # --- bench query: doc_signatures (add_signatures over the docs scan) ---
    from lshdedup.minhash import add_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc_cfg = DedupConfig(k=5, n_perm=128, b=32, r=4, use_phash=False, threshold=0.8)
    cap("doc_signatures", add_signatures(docs, doc_cfg, text_col="text", phash_col="_none_"))

    # --- bench query: doc_lsh_dedup ---
    cap("doc_lsh_dedup", entry_mod.q_lsh_dedup_pairs(spark, sf_dir))

    # --- bench query: doc_rolling_fp ---
    cap("doc_rolling_fp", entry_mod.q_rolling_fingerprints(spark, sf_dir))

    # --- bench queries: embedding_ann / embedding_ivf ---
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
    cap("embedding_ann", srp_topk(q, c, k=10, dim=64))
    cap("embedding_ivf", ivf_topk(q, c, k=10, dim=64, n_cells=16, n_probe=8,
                                  corpus_spill=2))

    # --- image_dedup pipeline stages (bench flagship): candidates, verified,
    # clusters over the synthetic bench corpus ---
    from lshdedup.lsh import candidate_pairs, exact_dup_groups, explode_bands
    from lshdedup.synth import SynthConfig, synth_corpus
    from lshdedup.verify import verify_pairs

    corpus = synth_corpus(spark, SynthConfig(n_rows=2000), partitions=64).persist()
    corpus.count()
    cfg = DedupConfig(
        threshold=0.7, n_perm=128, b=32, r=4, fp_weight=0.1, fn_weight=0.9,
        shuffle_partitions=32, sig_scheme="oph",
    )
    narrow = corpus.select("image_id", "caption", "phash")
    reps, exact_edges = exact_dup_groups(narrow, "image_id", ["caption", "phash"])
    signed = add_signatures(reps, cfg, text_col="caption", phash_col="phash")
    buckets = explode_bands(signed, "image_id", "sig", cfg)
    pairs, _skew = candidate_pairs(buckets, "image_id", cfg)
    cap("pipeline_candidates", pairs)
    verified = verify_pairs(
        pairs, signed, cfg, id_col="image_id", text_col="caption",
        phash_col="phash",
    )
    cap("pipeline_verify", verified)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "after",
         sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r06")
