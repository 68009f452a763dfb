"""Persistent bucketed dedup store — the PRODUCTION shape of streaming
near-dup ingestion.

The in-process sinks in ``dedup_stream`` re-derive the whole corpus's
signatures every micro-batch (fine for tests, wrong at 100 TB).  This
store persists each accepted batch's LSH bucket memberships and token
sets as epoch-partitioned parquet, so a micro-batch costs:

1. tokenize + sign the NEW documents only,
2. one equi-join of the new bucket keys against the STORED bucket
   table (partition-prunable on (band, key) at scale; candidate volume
   = the new docs' collisions, independent of corpus size),
3. exact Jaccard verification against ONLY the colliding documents'
   stored token sets (broadcast candidate-id semi-join: the token
   table is scanned, never shuffled; bucket the store by id at scale
   so the scan itself prunes files),
4. overwrite the CURRENT epoch's partition.

Exactly-once under foreachBatch's at-least-once contract: writes go to
``epoch=<id>`` partitions with overwrite, and reads filter to
``epoch < current`` — a replayed epoch recomputes identical flags from
the identical prior state and rewrites its own partition, never
double-appending (a duplicated token row would silently corrupt every
later Jaccard denominator).

First-wins semantics are identical to
``llm.dedup.incremental_dedup_flags`` under ordered arrival — pinned by
tests/test_streaming.py against the one-shot batch run.

At very long stream lifetimes the epoch partitions accumulate small
files; the production follow-up is periodic compaction of epochs below
the streaming checkpoint's committed watermark (safe because replays
can only target epochs at-or-after it) — orthogonal to the per-batch
cost contract measured in docs/SCALING.md.

Reference analogue: none (the reference has no dedup-at-ingest stream);
this is the north-star training-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axonops_schema_registry_spark.llm.dedup import (
    minhash_band_buckets,
    verify_jaccard,
)
from axonops_schema_registry_spark.operators.core import release_checkpoint
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

    # -- store access -----------------------------------------------------

    def _stored(self, path: str, before_epoch: int) -> DataFrame | None:
        """Epoch partitions strictly BEFORE the one being processed —
        a replayed epoch must not see its own earlier (failed) write."""
        if not os.path.isdir(path):
            return None
        df = self.spark.read.parquet(path)
        if "epoch" not in df.columns:  # no partition discovered: empty
            return None
        return df.filter(F.col("epoch") < before_epoch).drop("epoch")

    # -- the per-batch pipeline -------------------------------------------

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int) -> DataFrame:
        """Flag one epoch's batch against the store, (re)write its
        epoch partition, return (id, is_dup, dup_of)."""
        new = new_docs.select(F.col(self.id_col).alias("__nid"),
                              F.col(self.text_col).alias("__ntext"))
        new_toks = token_set(new, "__nid", "__ntext", self.ngram) \
            .localCheckpoint(eager=True)
        new_buckets = minhash_band_buckets(
            new_toks, self.n_hashes, self.bands) \
            .localCheckpoint(eager=True)

        stored_b = self._stored(self.buckets_dir, epoch_id)
        all_buckets = (new_buckets if stored_b is None
                       else stored_b.unionByName(new_buckets))
        a = all_buckets.select(F.col("id").alias("id_a"), "band", "key")
        b = new_buckets.select(F.col("id").alias("id_b"), "band", "key")
        candidates = (a.join(b, ["band", "key"])
                      .filter(F.col("id_a") < F.col("id_b"))
                      .select("id_a", "id_b").distinct())

        stored_t = self._stored(self.toks_dir, epoch_id)
        all_toks = (new_toks if stored_t is None
                    else stored_t.unionByName(new_toks))
        # restrict the verify to colliding documents: the candidate id
        # set (bounded by the new batch's collisions) broadcasts as a
        # semi-join filter, so the stored token table is scanned but
        # never shuffled
        cand_ids = (candidates.select(F.col("id_a").alias("id"))
                    .unionByName(candidates.select(
                        F.col("id_b").alias("id")))
                    .distinct())
        pairs = verify_jaccard(all_toks.join(F.broadcast(cand_ids), "id"),
                               candidates, self.threshold)
        dup_of = (pairs.groupBy(F.col("id_b").alias("__nid"))
                  .agg(F.min("id_a").alias("dup_of")))
        flags = (new.select("__nid")
                 .join(dup_of, "__nid", "left")
                 .select(F.col("__nid").alias(self.id_col),
                         F.col("dup_of").isNotNull().alias("is_dup"),
                         "dup_of")
                 .localCheckpoint(eager=True))

        # idempotent (re)write of THIS epoch's partitions, then release
        # the batch-sized checkpoint blocks eagerly — a long-running
        # stream must not wait for the ContextCleaner
        for frame, path in ((new_buckets, self.buckets_dir),
                            (new_toks, self.toks_dir)):
            frame.write.mode("overwrite").parquet(
                os.path.join(path, f"epoch={epoch_id}"))
        release_checkpoint(new_buckets)
        release_checkpoint(new_toks)
        return flags

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        flags = self.process_batch(batch_df, epoch_id)
        for r in flags.collect():
            self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
        release_checkpoint(flags)
