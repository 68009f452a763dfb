"""Persistent bucketed dedup store — the PRODUCTION shape of streaming
near-dup ingestion.

The in-process sinks in ``dedup_stream`` re-derive the whole corpus's
signatures every micro-batch (fine for tests, wrong at 100 TB).  This
store persists each accepted batch's LSH bucket memberships and token
sets as append-only parquet, so a micro-batch costs:

1. tokenize + sign the NEW documents only,
2. one equi-join of the new bucket keys against the STORED bucket
   table (partition-prunable on (band, key) at scale; candidate volume
   = the new docs' collisions, independent of corpus size),
3. exact Jaccard verification against ONLY the colliding documents'
   stored token sets,
4. append the new buckets/tokens.

First-wins semantics are identical to
``llm.dedup.incremental_dedup_flags`` under ordered arrival — pinned by
tests/test_streaming.py against the one-shot batch run.

Reference analogue: none (the reference has no dedup-at-ingest stream);
this is the north-star training-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axonops_schema_registry_spark.llm.dedup import minhash_band_buckets
from axonops_schema_registry_spark.operators.text import token_set


class BucketedDedupStore:
    """Disk-backed first-wins near-dup filter for streaming ingestion.

    Usable directly as a ``foreachBatch`` target; per-document verdicts
    accumulate in ``self.flags`` exactly like ``IncrementalDedupSink``
    (the in-process twin), but per-batch work never rescans earlier
    documents — only their stored buckets/tokens are joined, and only
    for colliding keys.
    """

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, ngram: int = 3,
                 n_hashes: int = 64, bands: int = 16) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.buckets_dir = os.path.join(store_dir, "buckets")
        self.toks_dir = os.path.join(store_dir, "toks")
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.ngram = threshold, ngram
        self.n_hashes, self.bands = n_hashes, bands
        self.flags: dict[int, tuple[bool, int | None]] = {}
        self._has_store = os.path.isdir(self.buckets_dir)

    # -- store access -----------------------------------------------------

    def _stored_buckets(self) -> DataFrame | None:
        if not self._has_store:
            return None
        return self.spark.read.parquet(self.buckets_dir)

    def _stored_toks(self) -> DataFrame | None:
        if not self._has_store:
            return None
        return self.spark.read.parquet(self.toks_dir)

    # -- the per-batch pipeline -------------------------------------------

    def process_batch(self, new_docs: DataFrame) -> DataFrame:
        """Flag one batch against the store, append it, return
        (id, is_dup, dup_of) for the batch's documents."""
        new = new_docs.select(F.col(self.id_col).alias("__nid"),
                              F.col(self.text_col).alias("__ntext"))
        new_toks = token_set(new, "__nid", "__ntext", self.ngram) \
            .localCheckpoint(eager=True)
        new_buckets = minhash_band_buckets(
            new_toks, self.n_hashes, self.bands) \
            .localCheckpoint(eager=True)

        stored_b = self._stored_buckets()
        all_buckets = (new_buckets if stored_b is None
                       else stored_b.unionByName(new_buckets))
        a = all_buckets.select(F.col("id").alias("id_a"), "band", "key")
        b = new_buckets.select(F.col("id").alias("id_b"), "band", "key")
        candidates = (a.join(b, ["band", "key"])
                      .filter(F.col("id_a") < F.col("id_b"))
                      .select("id_a", "id_b").distinct())

        stored_t = self._stored_toks()
        all_toks = (new_toks if stored_t is None
                    else stored_t.unionByName(new_toks))
        # exact verify over candidates only: the candidate id set
        # (bounded by the new batch's collisions) broadcasts as a
        # semi-join filter, so the stored token table is scanned but
        # never shuffled, and only colliding documents' tokens flow
        # into the verify joins.  At scale the store is additionally
        # bucketed by id so the scan itself prunes files.
        cand_ids = (candidates.select(F.col("id_a").alias("id"))
                    .unionByName(candidates.select(
                        F.col("id_b").alias("id")))
                    .distinct())
        vtoks = all_toks.join(F.broadcast(cand_ids), "id")
        sizes = vtoks.groupBy("id").agg(
            F.count(F.lit(1)).alias("set_size"))
        ta = vtoks.select(F.col("id").alias("id_a"), "token")
        tb = vtoks.select(F.col("id").alias("id_b"), "token")
        inter = (candidates.join(ta, "id_a")
                 .join(tb, ["id_b", "token"])
                 .groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("n_inter")))
        pairs = (candidates
                 .join(inter, ["id_a", "id_b"], "left")
                 .na.fill({"n_inter": 0})
                 .join(sizes.select(F.col("id").alias("id_a"),
                                    F.col("set_size").alias("size_a")),
                       "id_a")
                 .join(sizes.select(F.col("id").alias("id_b"),
                                    F.col("set_size").alias("size_b")),
                       "id_b")
                 .withColumn("jaccard",
                             F.col("n_inter").cast("double")
                             / (F.col("size_a") + F.col("size_b")
                                - F.col("n_inter")).cast("double"))
                 .filter(F.col("jaccard") >= self.threshold))
        dup_of = (pairs.groupBy(F.col("id_b").alias("__nid"))
                  .agg(F.min("id_a").alias("dup_of")))
        flags = (new.select("__nid")
                 .join(dup_of, "__nid", "left")
                 .select(F.col("__nid").alias(self.id_col),
                         F.col("dup_of").isNotNull().alias("is_dup"),
                         "dup_of"))
        flags = flags.localCheckpoint(eager=True)

        # append AFTER flagging (a doc never collides with itself via
        # the store; in-batch pairs came from the new-side union)
        new_buckets.write.mode("append").parquet(self.buckets_dir)
        new_toks.write.mode("append").parquet(self.toks_dir)
        self._has_store = True
        return flags

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        for r in self.process_batch(batch_df).collect():
            self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
