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
files; :meth:`BucketedDedupStore.compact` merges every epoch below the
streaming checkpoint's committed watermark (safe because replays can
only target epochs at-or-after it) into a generation-numbered base
directory.  The swap is crash-safe: the new base generation is fully
written FIRST, then a tiny meta.json is atomically replaced
(``os.replace``), and only then are superseded directories deleted —
a crash at any point leaves meta.json pointing at one consistent view,
and orphan directories are swept by the next compaction.

Reference analogue: none (the reference has no dedup-at-ingest stream);
this is the north-star training-pipeline surface (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axonops_schema_registry_spark.llm.dedup import (
    minhash_band_buckets,
    verify_jaccard,
)
from axonops_schema_registry_spark.operators.core import release_checkpoint
from axonops_schema_registry_spark.operators.text import token_set


def _read_epochs(spark: SparkSession, path: str, before_epoch: int,
                 from_epoch: int = 0) -> DataFrame | None:
    """Epoch partitions in [from_epoch, before_epoch) — the shared
    read probe for both stores.  An epoch-less directory (every epoch
    compacted away, or nothing written yet) is unreadable (no schema
    to infer), so probe before reading."""
    if not (os.path.isdir(path)
            and any(d.startswith("epoch=") for d in os.listdir(path))):
        return None
    df = spark.read.parquet(path)
    if "epoch" not in df.columns:
        return None
    return df.filter((F.col("epoch") >= from_epoch)
                     & (F.col("epoch") < before_epoch)).drop("epoch")


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
        self.meta_path = os.path.join(store_dir, "meta.json")
        self.flags: dict[int, tuple[bool, int | None]] = {}

    # -- store access -----------------------------------------------------

    def _meta(self) -> dict:
        """{"gen": current base generation or -1, "below": first
        non-compacted epoch} — the one file whose atomic os.replace
        commits a compaction.

        Only a MISSING file means "no compaction yet"; a present-but-
        unreadable meta.json is store corruption and must fail loudly —
        compaction already deleted the pre-watermark epoch dirs, so
        silently defaulting here would make the whole compacted base
        generation invisible and the store would stop flagging
        duplicates against the prior corpus."""
        try:
            with open(self.meta_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"gen": -1, "below": 0}
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"corrupt dedup-store meta at {self.meta_path}: {exc!r}; "
                "refusing to silently drop compacted state") from exc

    @staticmethod
    def _base_dir(path: str, gen: int) -> str:
        return os.path.join(path + "_base", f"g{gen}")

    def _stored(self, path: str, before_epoch: int) -> DataFrame | None:
        """Everything accepted strictly BEFORE the epoch being
        processed — a replayed epoch must not see its own earlier
        (failed) write: the current base generation (epochs below the
        compaction watermark) plus the live epoch partitions in
        [watermark, before_epoch)."""
        meta = self._meta()
        parts = []
        if meta["gen"] >= 0:
            base = self._base_dir(path, meta["gen"])
            if not os.path.isdir(base):
                # meta is the commit record: a base it points at that is
                # missing on disk is corruption, not "no prior state"
                raise RuntimeError(
                    f"dedup-store meta {self.meta_path} references "
                    f"missing base generation {base}")
            parts.append(self.spark.read.parquet(base))
        live = _read_epochs(self.spark, path, before_epoch,
                            from_epoch=meta["below"])
        if live is not None:
            parts.append(live)
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- compaction -------------------------------------------------------

    def compact(self, below_epoch: int) -> None:
        """Fold every epoch partition < ``below_epoch`` (which must be
        at-or-below the streaming checkpoint's committed watermark —
        replays can then only target epochs this never touches) into
        the next base generation.  Write order makes a crash at ANY
        point harmless: (1) new generation directories are fully
        written, (2) meta.json is atomically replaced to point at them,
        (3) superseded directories are deleted best-effort — orphans
        from a crash between (1) and (2), or leftovers from a crash
        during (3), are swept by the next compaction."""
        meta = self._meta()
        if below_epoch <= meta["below"]:
            return  # nothing new to fold
        new_gen = meta["gen"] + 1
        # probe BOTH paths before writing anything: an early return after
        # the first path's generation dir was written would leave an
        # orphan gN with meta not advanced (harmless for reads, but the
        # next compaction would then reuse the gN name)
        merged_by_path = {path: self._stored(path, below_epoch)
                          for path in (self.buckets_dir, self.toks_dir)}
        if any(m is None for m in merged_by_path.values()):
            return
        for path, merged in merged_by_path.items():
            merged.write.mode("overwrite").parquet(
                self._base_dir(path, new_gen))
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"gen": new_gen, "below": below_epoch}, f)
            f.flush()
            os.fsync(f.fileno())  # durable before the atomic swap —
            # a power-loss crash must not leave meta.json truncated
        os.replace(tmp, self.meta_path)  # the commit point
        # cleanup: superseded generations and folded epoch partitions
        for path in (self.buckets_dir, self.toks_dir):
            for g in range(new_gen):
                shutil.rmtree(self._base_dir(path, g),
                              ignore_errors=True)
            if os.path.isdir(path):
                for d in os.listdir(path):
                    if d.startswith("epoch="):
                        try:
                            e = int(d.split("=", 1)[1])
                        except ValueError:
                            continue
                        if e < below_epoch:
                            shutil.rmtree(os.path.join(path, d),
                                          ignore_errors=True)

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


def _semantic_pairs(a_buckets: DataFrame, b_buckets: DataFrame,
                    vecs: DataFrame, threshold: float) -> DataFrame:
    """Shared core of the embedding dedup pair generation — used by
    BOTH the streaming store and its one-shot batch twin so the
    streaming ≡ batch property holds by construction, not just by
    test: candidates from one (table, bucket) equi-join with
    ``id_a < id_b``, exact cosine verify restricted to colliding ids
    (broadcast semi-join).  ``candidates`` is eagerly checkpointed —
    it feeds THREE consumers (two cand_ids selects + the verify join),
    and an uncached subtree would re-run the stored-bucket scan and
    shuffle join for each, tripling the documented one-join cost."""
    from axonops_schema_registry_spark.llm.similarity import (
        _dot_expr,
        with_norm,
    )

    a = a_buckets.select(F.col("__id").alias("id_a"), "table", "bucket")
    b = b_buckets.select(F.col("__id").alias("id_b"), "table", "bucket")
    candidates = (a.join(b, ["table", "bucket"])
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b").distinct()
                  .localCheckpoint(eager=True))
    cand_ids = (candidates.select(F.col("id_a").alias("__id"))
                .unionByName(candidates.select(F.col("id_b")
                                               .alias("__id")))
                .distinct())
    v = with_norm(vecs.join(F.broadcast(cand_ids), "__id"), "__v", "__n")
    va = v.select(F.col("__id").alias("id_a"),
                  F.col("__v").alias("__va"), F.col("__n").alias("__na"))
    vb = v.select(F.col("__id").alias("id_b"),
                  F.col("__v").alias("__vb"), F.col("__n").alias("__nb"))
    sim = _dot_expr("__va", "__vb") / (F.col("__na") * F.col("__nb"))
    pairs = (candidates.join(va, "id_a").join(vb, "id_b")
             .withColumn("__cos", F.round(sim, 4))
             .filter(F.col("__cos") >= threshold)
             .select("id_a", "id_b", "__cos")
             .localCheckpoint(eager=True))
    release_checkpoint(candidates)
    return pairs


def _first_wins(out_ids: DataFrame, pairs: DataFrame,
                id_col: str) -> DataFrame:
    """(id, is_dup, dup_of) for ``out_ids``: dup_of = the smallest
    paired earlier id."""
    dup_of = (pairs.groupBy(F.col("id_b").alias("__id"))
              .agg(F.min("id_a").alias("dup_of")))
    return (out_ids
            .join(dup_of, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.col("dup_of").isNotNull().alias("is_dup"),
                    "dup_of"))


class EmbeddingDedupStore:
    """Disk-backed first-wins SEMANTIC dedup for streaming ingestion —
    the embedding-modality twin of :class:`BucketedDedupStore`: new
    vectors are hyperplane-LSH bucketed (the seeded production
    bucketer, identical planes every batch), candidates come from one
    equi-join of the new bucket keys against the STORED bucket table,
    and exact cosine verification runs only against the colliding
    stored vectors (broadcast candidate-id semi-join).  Per-batch cost
    is bounded by the new batch's collisions, never the corpus.

    Same exactly-once discipline as the text store: epoch-partitioned
    idempotent rewrites, reads filter to earlier epochs, so an
    at-least-once replay recomputes identical flags.

    Streaming ≡ batch UNDER ORDERED ARRIVAL (earlier batches carry
    smaller ids — the same precondition the text twin documents): the
    flags then equal a one-shot :func:`embedding_dedup_flags` run over
    the concatenated corpus (pinned in tests/test_streaming.py, and
    held by construction — both paths run the shared
    :func:`_semantic_pairs`/:func:`_first_wins` core).  A batch
    carrying an id SMALLER than an already-stored similar vector
    cannot flip the stored vector's already-emitted flag — out-of-order
    id spaces need a compaction-style re-flag pass, not this store.
    """

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 threshold: float = 0.9, dim: int = 64,
                 n_bits: int = 8, n_tables: int = 4,
                 seed0: int = 1000) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.buckets_dir = os.path.join(store_dir, "ebuckets")
        self.vecs_dir = os.path.join(store_dir, "evecs")
        self.id_col, self.vec_col = id_col, vec_col
        self.threshold = threshold
        self.dim, self.n_bits = dim, n_bits
        self.n_tables, self.seed0 = n_tables, seed0
        self.flags: dict[int, tuple[bool, int | None]] = {}

    def _bucketed(self, vecs: DataFrame) -> DataFrame:
        from axonops_schema_registry_spark.llm.similarity import (
            hyperplane_buckets_all_tables_udf,
        )

        bucketer = hyperplane_buckets_all_tables_udf(
            self.dim, self.n_bits, self.n_tables, self.seed0)
        return (vecs.withColumn("__bs", bucketer(F.col("__v")))
                .select("__id", F.posexplode("__bs")
                        .alias("table", "bucket")))

    def process_batch(self, new_vecs: DataFrame,
                      epoch_id: int) -> DataFrame:
        new = new_vecs.select(F.col(self.id_col).alias("__id"),
                              F.col(self.vec_col).alias("__v")) \
            .localCheckpoint(eager=True)
        new_buckets = self._bucketed(new).localCheckpoint(eager=True)

        stored_b = _read_epochs(self.spark, self.buckets_dir, epoch_id)
        all_buckets = (new_buckets if stored_b is None
                       else stored_b.unionByName(new_buckets))
        stored_v = _read_epochs(self.spark, self.vecs_dir, epoch_id)
        all_vecs = (new if stored_v is None
                    else stored_v.unionByName(new))
        pairs = _semantic_pairs(all_buckets, new_buckets, all_vecs,
                                self.threshold)
        flags = _first_wins(new.select("__id"), pairs, self.id_col) \
            .localCheckpoint(eager=True)
        release_checkpoint(pairs)

        for frame, path in ((new_buckets, self.buckets_dir),
                            (new, self.vecs_dir)):
            frame.write.mode("overwrite").parquet(
                os.path.join(path, f"epoch={epoch_id}"))
        release_checkpoint(new_buckets)
        release_checkpoint(new)
        return flags

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        flags = self.process_batch(batch_df, epoch_id)
        for r in flags.collect():
            self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
        release_checkpoint(flags)


def embedding_dedup_flags(vecs: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.9, dim: int = 64,
                          n_bits: int = 8, n_tables: int = 4,
                          seed0: int = 1000) -> DataFrame:
    """One-shot batch twin of :class:`EmbeddingDedupStore`: first-wins
    semantic dedup flags over the whole corpus, sharing the store's
    :func:`_semantic_pairs`/:func:`_first_wins` core verbatim so the
    streaming ≡ batch equality (under ordered arrival) holds by
    construction."""
    from axonops_schema_registry_spark.llm.similarity import (
        hyperplane_buckets_all_tables_udf,
    )

    bucketer = hyperplane_buckets_all_tables_udf(dim, n_bits, n_tables,
                                                 seed0)
    v0 = vecs.select(F.col(id_col).alias("__id"),
                     F.col(vec_col).alias("__v"))
    buckets = (v0.withColumn("__bs", bucketer(F.col("__v")))
               .select("__id", F.posexplode("__bs")
                       .alias("table", "bucket")))
    pairs = _semantic_pairs(buckets, buckets, v0, threshold)
    return _first_wins(v0.select("__id"), pairs, id_col)
