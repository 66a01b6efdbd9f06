"""Streaming incremental dedup — Structured Streaming form of the
reference's one online operator, LSH::query_then_insert (lsh.h:126-144):
each arriving document is matched against everything inserted before it,
then inserted.

The reference's README lists streaming persistence as unimplemented
(README.md:49-52); here it is first-class: a foreachBatch sink where each
micro-batch
  1. signs its rows (fused shingle+minhash UDF),
  2. joins its band rows against the accumulated bucket store
     (query half) and self-joins within the batch (the insert-order pairs),
  3. verifies candidates exactly and appends dup pairs,
  4. appends its band rows + signatures to the store (insert half).

State lives in parquet tables under ``state_dir`` (Iceberg tables on a real
cluster), so the stream is resumable via the normal Structured Streaming
checkpoint plus idempotent batch-id guards.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lshdedup.config import DedupConfig
from lshdedup.lsh import candidate_pairs, explode_bands
from lshdedup.minhash import add_signatures
from lshdedup.shingle import distinct_char_shingles_expr, exact_jaccard_expr


class StreamingDedup:
    """foreachBatch processor maintaining bucket/signature/dup-pair state."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig,
        state_dir: str,
        id_col: str = "image_id",
        text_col: str = "caption",
    ):
        self.spark = spark
        self.cfg = cfg
        self.state_dir = state_dir
        self.id_col = id_col
        self.text_col = text_col
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _read_state(self, name: str) -> DataFrame | None:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None

    def _batch_done(self, batch_id: int) -> bool:
        return os.path.exists(self._path(f"_batch_{batch_id}_done"))

    def _mark_done(self, batch_id: int) -> None:
        open(self._path(f"_batch_{batch_id}_done"), "w").close()

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._batch_done(batch_id):  # replay after restart → idempotent
            return
        cfg, idc, txt = self.cfg, self.id_col, self.text_col
        signed = add_signatures(
            batch.select(idc, txt), cfg, text_col=txt, phash_col="_none_"
        ).persist()
        bands = explode_bands(signed, idc, "sig", cfg).persist()

        # query half: new rows vs accumulated store
        store = self._read_state("buckets")
        cands_new_old = None
        if store is not None:
            q = bands.select(
                "band_id", "band_hash", F.col(idc).alias("id_a")
            )
            s = store.select(
                "band_id", "band_hash", F.col(idc).alias("id_b")
            )
            cands_new_old = (
                q.join(s, ["band_id", "band_hash"])
                .select("id_a", "id_b")
                .dropDuplicates(["id_a", "id_b"])
            )
        # insert-order half: pairs within this batch
        cands_in_batch, _ = candidate_pairs(bands, idc, cfg)
        cands = (
            cands_in_batch
            if cands_new_old is None
            else cands_in_batch.unionByName(cands_new_old)
        )

        # exact verification needs both texts: batch side + stored side
        sig_store = self._read_state("docs")
        all_docs = (
            signed.select(idc, txt)
            if sig_store is None
            else signed.select(idc, txt).unionByName(sig_store.select(idc, txt))
        )
        left = all_docs.select(
            F.col(idc).alias("id_a"), F.col(txt).alias("_ta")
        )
        right = all_docs.select(
            F.col(idc).alias("id_b"), F.col(txt).alias("_tb")
        )
        verified = (
            cands.join(left, "id_a")
            .join(right, "id_b")
            .withColumn(
                "jaccard",
                exact_jaccard_expr(
                    distinct_char_shingles_expr(F.col("_ta"), cfg.k),
                    distinct_char_shingles_expr(F.col("_tb"), cfg.k),
                ),
            )
            .filter(F.col("jaccard") >= cfg.threshold)
            .select("id_a", "id_b", "jaccard")
            .withColumn("batch_id", F.lit(batch_id))
        )
        verified.write.mode("append").parquet(self._path("dup_pairs"))

        # insert half: extend state
        bands.write.mode("append").parquet(self._path("buckets"))
        signed.select(idc, txt).write.mode("append").parquet(self._path("docs"))
        signed.unpersist()
        bands.unpersist()
        self._mark_done(batch_id)

    def start(self, stream: DataFrame, checkpoint: str | None = None):
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint or self._path("_ss_checkpoint")
        )
        return writer.trigger(availableNow=True).start()

    def dup_pairs(self) -> DataFrame:
        out = self._read_state("dup_pairs")
        if out is None:
            return self.spark.createDataFrame(
                [], "id_a string, id_b string, jaccard double, batch_id long"
            )
        return out
