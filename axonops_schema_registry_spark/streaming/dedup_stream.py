"""Streaming ingestion curation: the first-wins near-dup filter — and
the full dedup → decontaminate → PII-scrub curation stage — as
``foreachBatch`` sinks.

Each micro-batch is flagged against everything ingested before it plus
itself — exactly :func:`...llm.dedup.incremental_dedup_flags` over the
growing prefix, which is order-independent (earlier = smaller key), so
the streaming run produces the identical flags to one batch run over
the full corpus (pinned by tests/test_streaming.py).

State: the seen-document set.  This in-process variant keeps it as an
eagerly ``localCheckpoint``-ed DataFrame — the checkpoint truncates
lineage every epoch (no O(batches) plan growth) and the per-batch LSH
join passes the micro-batch ids as the RIGHT side of the bucket join
(``new_ids``), so candidate volume per batch is bounded by the NEW
documents' bucket collisions, not recomputed for the whole corpus.  A
production deployment appends accepted documents to a bucketed
parquet/Delta table and joins each micro-batch against ONLY the
colliding LSH buckets — the same equi-join shape ``minhash_lsh_pairs``
already uses (that shape IS ``dedup_store.BucketedDedupStore``).

Verdict output is disk-first: both sinks write idempotent per-epoch
parquet when given ``flags_dir``/``results_dir`` and read it back via
``all_flags``/``all_results``; the in-memory dict/``results``
accumulators are TEST-ONLY opt-ins (``track_flags``/``track_results``)
— nothing unbounded rides the driver unless a test asks for it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.llm.dedup import incremental_dedup_flags
from axonops_schema_registry_spark.operators.core import release_checkpoint


class IncrementalDedupSink:
    """foreachBatch target: flags each arriving document against the
    ingested-so-far corpus.

    Verdicts are observable two ways: ``flags_dir`` writes each epoch's
    (id, is_dup, dup_of) to an idempotent ``epoch=<id>`` parquet
    partition (read back with :meth:`all_flags` — the disk path, driver
    memory O(1)); ``track_flags`` additionally accumulates them in
    ``self.flags``, which grows with the corpus and is TEST-ONLY.  At
    least one must be enabled or the sink would compute verdicts nobody
    can read.  (The whole class is the in-process twin — the production
    shape is ``dedup_store.BucketedDedupStore``, which also persists
    its state, not just its verdicts.)"""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, ngram: int = 3,
                 track_flags: bool = False,
                 flags_dir: str | None = None) -> None:
        if not track_flags and flags_dir is None:
            raise ValueError(
                "IncrementalDedupSink needs flags_dir (disk verdicts) "
                "or track_flags=True (test-only driver dict)")
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.ngram = threshold, ngram
        self.track_flags, self.flags_dir = track_flags, flags_dir
        self.seen: DataFrame | None = None
        self.flags: dict[int, tuple[bool, int | None]] = {}

    def all_flags(self, spark) -> DataFrame | None:
        """Every persisted verdict (requires ``flags_dir``)."""
        if self.flags_dir is None or not (
                os.path.isdir(self.flags_dir)
                and any(d.startswith("epoch=")
                        for d in os.listdir(self.flags_dir))):
            return None
        return (spark.read.parquet(self.flags_dir)
                .select(self.id_col, "is_dup", "dup_of"))

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        new = batch_df.select(self.id_col, self.text_col)
        corpus = (new if self.seen is None
                  else self.seen.unionByName(new))
        batch_flags = incremental_dedup_flags(
            corpus, self.id_col, self.text_col, self.threshold,
            self.ngram, new_ids=new.select(self.id_col),
            cache_tokens=False)  # a per-epoch cache entry would leak
        if self.flags_dir is not None:
            # overwrite keeps an at-least-once replay idempotent
            batch_flags.write.mode("overwrite").parquet(
                os.path.join(self.flags_dir, f"epoch={epoch_id}"))
        if self.track_flags:
            for r in batch_flags.collect():
                self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
        # ALL documents join the seen set — matching against every
        # earlier document (dup or not) is what keeps the flags
        # identical to one batch run over the full corpus; the cleaned
        # output is simply the is_dup=false subset of self.flags.
        # Eager localCheckpoint: materializes the epoch's corpus once
        # and truncates lineage, so epoch N's plan never re-derives
        # epochs 1..N-1 (the O(batches^2) plan-growth trap); the
        # superseded epoch's checkpoint blocks are freed eagerly.
        prev = self.seen
        self.seen = corpus.localCheckpoint(eager=True)
        if prev is not None:
            release_checkpoint(prev)


class CurationSink:
    """foreachBatch target for the full ingest-time curation stage a
    training pipeline runs: first-wins near-dup filter, exact n-gram
    benchmark decontamination against a held-out evaluation set, an
    optional quality-classifier gate, and PII redaction on whatever
    survives.

    Per-document verdicts — (is_dup, dup_of, n_eval_spans, clean_text),
    clean_text None for documents dropped as duplicates or
    contaminated — are observable two ways: ``results_dir`` writes each
    epoch's verdicts to an idempotent ``epoch=<id>`` parquet partition
    (read back with :meth:`all_results` — the production path, driver
    memory O(1)); ``track_results`` additionally accumulates them in
    ``self.results``, which grows with the corpus and is TEST-ONLY.
    At least one must be enabled.  The three
    passes compose the batch operators unchanged
    (llm.dedup.incremental_dedup_flags, llm.contamination
    .contamination_flags, llm.text.pii_redact), so streaming output is
    pinned to one batch run over the same corpus by
    tests/test_streaming.py.

    ``store_dir`` switches the dedup leg to the disk-backed
    :class:`...streaming.dedup_store.BucketedDedupStore` — the
    production shape: per-batch cost stays flat as the corpus grows
    (only stored bucket collisions are verified, docs/SCALING.md), and
    the stage survives a process restart because prior epochs live in
    the store's epoch-partitioned parquet, not in this object.  Without
    it the sink keeps the in-memory checkpointed-corpus shape (fine for
    tests, rescans the corpus every batch).

    ``quality_ref``/``quality_pos_ids`` (r16, VERDICT r15 ask #4)
    switch on the qf1-class quality leg: the NBSVM weight table is
    fitted ONCE on the fixed reference corpus at construction (the way
    CCNet/GPT-3-class pipelines deploy the classifier — train once,
    score forever; same lifecycle as ``eval_spans``) and applied to
    every micro-batch as an exact BIGINT dot product.  Scoring is
    row-local given the broadcast weight table, so per-document
    verdicts are independent of batching and the stream equals its
    batch twin micro-batch for micro-batch (pinned in
    tests/test_streaming.py, including the store-backed restart
    path).  Verdicts gain (quality_score_micro, quality_keep) and
    ``clean_text`` additionally requires ``quality_keep``.
    """

    def __init__(self, eval_set: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, ngram: int = 3,
                 contam_n: int = 5,
                 store_dir: str | None = None,
                 track_results: bool = False,
                 results_dir: str | None = None,
                 quality_ref: DataFrame | None = None,
                 quality_pos_ids: DataFrame | None = None,
                 n_quality_buckets: int = 4096) -> None:
        from axonops_schema_registry_spark.llm.contamination import (
            ngram_spans,
        )

        if not track_results and results_dir is None:
            raise ValueError(
                "CurationSink needs results_dir (disk verdicts) or "
                "track_results=True (test-only driver dict)")
        if (quality_ref is None) != (quality_pos_ids is None):
            raise ValueError(
                "quality_ref and quality_pos_ids come together: the "
                "classifier gate needs both the reference corpus and "
                "its positive slice")
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.ngram = threshold, ngram
        self.contam_n = contam_n
        self.store_dir = store_dir
        self.track_results, self.results_dir = track_results, results_dir
        self._store = None
        # the evaluation span set is fixed for the run: checkpoint once,
        # broadcast into every micro-batch's span join
        self.eval_spans = (ngram_spans(eval_set, id_col, text_col,
                                       contam_n)
                           .withColumnRenamed("id", "test_id")
                           .localCheckpoint(eager=True))
        self.n_quality_buckets = n_quality_buckets
        self.quality_weights: DataFrame | None = None
        if quality_ref is not None:
            from axonops_schema_registry_spark.llm.sampling import (
                quality_filter_weights,
            )

            # fixed for the run, like eval_spans: fit once on the
            # reference corpus, checkpoint the <= n_buckets-row table
            self.quality_weights = quality_filter_weights(
                quality_ref, quality_pos_ids, id_col, text_col,
                n_quality_buckets).localCheckpoint(eager=True)
        self.seen: DataFrame | None = None
        self.results: dict[int, dict] = {}

    def all_results(self, spark) -> DataFrame | None:
        """Every persisted curation verdict (requires ``results_dir``)."""
        if self.results_dir is None or not (
                os.path.isdir(self.results_dir)
                and any(d.startswith("epoch=")
                        for d in os.listdir(self.results_dir))):
            return None
        cols = [self.id_col, "is_dup", "dup_of", "n_eval_spans"]
        if self.quality_weights is not None:
            cols += ["quality_score_micro", "quality_keep"]
        return (spark.read.parquet(self.results_dir)
                .select(*cols, "clean_text"))

    def _dedup_flags(self, new: DataFrame, epoch_id: int) -> DataFrame:
        if self.store_dir is not None:
            if self._store is None:
                from axonops_schema_registry_spark.streaming.dedup_store \
                    import BucketedDedupStore
                self._store = BucketedDedupStore(
                    new.sparkSession, self.store_dir, self.id_col,
                    self.text_col, self.threshold, self.ngram)
            return self._store.process_batch(new, epoch_id)
        corpus = (new if self.seen is None
                  else self.seen.unionByName(new))
        self._corpus = corpus
        return incremental_dedup_flags(
            corpus, self.id_col, self.text_col, self.threshold,
            self.ngram, new_ids=new.select(self.id_col),
            cache_tokens=False)  # a per-epoch cache entry would leak

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from axonops_schema_registry_spark.llm.contamination import (
            ngram_spans,
        )
        from axonops_schema_registry_spark.llm.text import pii_redact

        new = batch_df.select(self.id_col, self.text_col)
        dedup = self._dedup_flags(new, epoch_id)
        spans = ngram_spans(new, self.id_col, self.text_col,
                            self.contam_n)
        contam = (spans.join(F.broadcast(self.eval_spans), "span")
                  .groupBy(F.col("id").alias(self.id_col))
                  .agg(F.countDistinct("span").alias("n_eval_spans")))
        keep = ~F.col("is_dup") & (F.col("n_eval_spans") == 0)
        out_cols = [self.id_col, "is_dup", "dup_of", "n_eval_spans"]
        verdicts = (new
                    .join(dedup, self.id_col)
                    .join(contam, self.id_col, "left")
                    .na.fill({"n_eval_spans": 0}))
        if self.quality_weights is not None:
            from axonops_schema_registry_spark.llm.sampling import (
                quality_score_with_weights,
            )

            scores = quality_score_with_weights(
                new, self.quality_weights, self.id_col, self.text_col,
                self.n_quality_buckets)
            verdicts = (verdicts
                        .join(scores.select(
                            self.id_col,
                            F.col("score_micro")
                            .alias("quality_score_micro")),
                            self.id_col, "left")
                        # a doc sharing NO bucket with the reference
                        # vocabulary carries no evidence: score 0
                        .na.fill({"quality_score_micro": 0})
                        .withColumn("quality_keep",
                                    F.col("quality_score_micro") > 0))
            keep = keep & F.col("quality_keep")
            out_cols += ["quality_score_micro", "quality_keep"]
        verdicts = verdicts.withColumn(
            "clean_text", F.when(keep, pii_redact(self.text_col)))
        if self.results_dir is not None:
            # overwrite keeps an at-least-once replay idempotent
            (verdicts.select(*out_cols, "clean_text")
             .write.mode("overwrite").parquet(
                 os.path.join(self.results_dir, f"epoch={epoch_id}")))
        if self.track_results:
            for r in verdicts.collect():
                rec = {
                    "is_dup": r["is_dup"], "dup_of": r["dup_of"],
                    "n_eval_spans": r["n_eval_spans"],
                    "clean_text": r["clean_text"],
                }
                if self.quality_weights is not None:
                    rec["quality_score_micro"] = r["quality_score_micro"]
                    rec["quality_keep"] = r["quality_keep"]
                self.results[r[self.id_col]] = rec
        if self.store_dir is not None:
            release_checkpoint(dedup)  # process_batch checkpoints flags
            return
        prev = self.seen
        self.seen = self._corpus.localCheckpoint(eager=True)
        if prev is not None:
            release_checkpoint(prev)


class LineDedupSink:
    """foreachBatch target: CCNet keep-first LINE/paragraph dedup
    across micro-batches (the streaming twin of
    :func:`...llm.dedup.line_dedup`, r14): every arriving document is
    emitted CLEANED — blocks whose text already appeared in any
    earlier batch, or earlier in this batch by (id, block_idx), are
    cut; the first copy survives.

    Equality contract: when batch id ranges arrive in order (every id
    in batch N+1 above every id in batch N — the file-source replay
    shape), the union of per-epoch outputs is IDENTICAL to one batch
    ``line_dedup`` over the full corpus, because the stream's
    first-seen block is then also the batch operator's smallest
    (id, block_idx) elector (pinned by tests/test_streaming.py).
    Out-of-order arrival is the persistent store's repair domain —
    concretely ``dedup_store.LineDedupStore.repair()`` (r15), which
    moves each keep from its arrival-first keeper to the batch-global
    winner — exactly as for the document-level sink above.

    State: (block text, first_epoch) — grows with distinct CONTENT,
    not with the corpus; eagerly localCheckpoint-ed per epoch
    (lineage truncation, superseded blocks freed).  The epoch stamp
    is what makes RE-DELIVERY of an epoch idempotent: cutting only on
    keys with ``first_epoch < epoch_id`` means an epoch's own blocks
    never cut it, so replaying epoch N against post-N state writes
    the identical partition (and the min-epoch state merge is itself
    idempotent).  Per-batch cost: one row-local segmentation of the
    batch + one block-keyed join against the seen set (AQE broadcasts
    the batch side when small).

    Output is disk-first: ``results_dir`` writes each epoch's cleaned
    (id, n_blocks, n_removed, cleaned_text) to an idempotent
    ``epoch=<id>`` partition; ``track_results`` accumulates rows on
    the driver and is TEST-ONLY.  At least one must be enabled."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 block_words: int = 10, min_block_words: int = 5,
                 track_results: bool = False,
                 results_dir: str | None = None) -> None:
        if not track_results and results_dir is None:
            raise ValueError(
                "LineDedupSink needs results_dir (disk output) or "
                "track_results=True (test-only driver dict)")
        self.id_col, self.text_col = id_col, text_col
        self.block_words = block_words
        self.min_block_words = min_block_words
        self.track_results, self.results_dir = track_results, results_dir
        self.seen_keys: DataFrame | None = None  # (btext, first_epoch)
        self.results: dict[int, tuple[int, int, str]] = {}

    def all_results(self, spark) -> DataFrame | None:
        """Every persisted cleaned document (requires results_dir)."""
        if self.results_dir is None or not (
                os.path.isdir(self.results_dir)
                and any(d.startswith("epoch=")
                        for d in os.listdir(self.results_dir))):
            return None
        return (spark.read.parquet(self.results_dir)
                .select("id", "n_blocks", "n_removed", "cleaned_text"))

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from axonops_schema_registry_spark.llm.dedup import (
            _packed_order,
            _reassemble_blocks,
            _word_blocks,
        )

        ex = _word_blocks(batch_df.select(self.id_col, self.text_col),
                          self.id_col, self.text_col, self.block_words)
        # shared loud bounds guard — batch and stream elect identically
        packed = _packed_order()
        eligible = F.col("bwords") >= self.min_block_words
        firsts = (ex.filter(eligible)
                    .withColumn("__ord", packed)
                    .groupBy("btext")
                    .agg(F.min("__ord").alias("__first")))
        flagged = ex.join(firsts, "btext", "left")
        if self.seen_keys is not None:
            # only keys first seen in an EARLIER epoch cut this batch
            # — an epoch's own keys never cut it, which is exactly
            # what makes re-delivery of this epoch write the
            # identical partition
            earlier = (self.seen_keys
                       .filter(F.col("first_epoch") < int(epoch_id))
                       .select("btext")
                       .withColumn("__seen", F.lit(True)))
            flagged = flagged.join(earlier, "btext", "left")
        else:
            flagged = flagged.withColumn("__seen",
                                         F.lit(None).cast("boolean"))
        out = _reassemble_blocks(
            flagged.withColumn(
                "__keep",
                ~eligible
                | (F.col("__seen").isNull()
                   & (F.col("__first") == packed))))
        if self.results_dir is not None:
            # overwrite keeps an at-least-once replay idempotent
            out.write.mode("overwrite").parquet(
                os.path.join(self.results_dir, f"epoch={epoch_id}"))
        if self.track_results:
            for r in out.collect():
                self.results[r["id"]] = (r["n_blocks"], r["n_removed"],
                                         r["cleaned_text"])
        new_keys = (ex.filter(eligible).select("btext").distinct()
                    .withColumn("first_epoch",
                                F.lit(int(epoch_id)).cast("bigint")))
        merged = (new_keys if self.seen_keys is None
                  else self.seen_keys.unionByName(new_keys))
        corpus_keys = (merged.groupBy("btext")
                       .agg(F.min("first_epoch").alias("first_epoch")))
        prev = self.seen_keys
        self.seen_keys = corpus_keys.localCheckpoint(eager=True)
        if prev is not None:
            release_checkpoint(prev)


class TokenBudgetAdmissionSink:
    """foreachBatch admission control — the streaming twin of
    :func:`...llm.sampling.token_budget_mixture` (mix5): each source
    admits arriving documents until its token budget fills, with
    mix5's EXACT prefix semantics (the cumulative token count runs
    over every SEEN document in order, admitted or not, so the first
    overflowing document closes the source — greedy skip-and-continue
    admission would be a hash-order-dependent knapsack and is
    deliberately not offered, the same refusal mix5 documents).

    Equality contract (the LineDedupSink convention): when documents
    arrive in the mixture's deterministic hash order — the file-source
    replay of a pre-sorted manifest, i.e. how a budgeted ingest is
    actually run — the union of per-epoch admissions IS the batch
    ``token_budget_mixture`` answer, including ``mix_rank`` and
    ``cum_tokens`` (pinned in tests/test_streaming.py).  Under
    arbitrary arrival the sink is still well-defined admission control
    (prefix of the ARRIVAL order, hash-ordered within each batch) —
    documented semantics, not an approximation of the batch mixture.

    State is DISK-ONLY and the sink object carries none: per-epoch
    per-source (n_seen, nt_seen) deltas land in ``state/epoch=<id>``
    and each batch reads the sum over epochs strictly BEFORE it — so a
    replayed epoch recomputes identical admissions from identical
    prior state (exactly-once under foreachBatch's at-least-once
    contract), and a brand-new sink instance over the same directories
    continues mid-budget (restart-safe by construction, no in-memory
    twin to rebuild).

    Budget REVISIONS (r17, VERDICT r16 ask #6): a production ingest
    revises budgets mid-run — a source's allocation is raised, a new
    source appears.  Budgets are therefore epoch-versioned on disk
    (``budgets/effective=<epoch>``; the construction table pins
    ``effective=0``) and each batch resolves the per-source budget
    AS-OF its epoch (newest ``effective <= epoch_id`` per source,
    latest-wins).  :meth:`update_budgets` refuses an ``effective``
    at or below any already-processed epoch, so the as-of view of
    every processed epoch is immutable — a replayed epoch re-admits
    under the budgets it originally saw, never the revision
    (value-idempotent replay survives revisions).  Consequently a
    raise admits only FUTURE arrivals: past rejections stand, and the
    prefix cum_tokens they advanced still counts against the new
    budget (mix5's prefix semantics, not retroactive knapsack).
    Construction budgets are pinned like signature params: reopening
    with a different base table fails loudly (revisions belong in
    ``update_budgets``, not the constructor).

    :meth:`compact` folds state deltas and admissions below the
    streaming checkpoint's committed watermark into a
    generation-numbered base per directory (the _EpochStore pattern:
    bases fully written, one atomic ``admission_meta.json`` swap,
    best-effort sweep) — so neither the per-batch prior-state
    re-aggregation nor the small-file count grows with stream
    lifetime (ADVICE r16).

    Scale shape: one sources-sized broadcast state join + budgets
    broadcast; per-batch cost is one (rank, running-sum) window per
    source over the BATCH (mix2's hash-range segmentation applies when
    one source outgrows a task); admissions and state deltas are
    idempotent epoch-partitioned parquet overwrites."""

    def __init__(self, budgets: DataFrame, store_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 source_col: str = "source") -> None:
        self.id_col, self.text_col = id_col, text_col
        self.source_col = source_col
        self.store_dir = store_dir
        self.admissions_dir = os.path.join(store_dir, "admissions")
        self.state_dir = os.path.join(store_dir, "budget_state")
        self.budgets_dir = os.path.join(store_dir, "budgets")
        self.meta_path = os.path.join(store_dir, "admission_meta.json")
        self.params_path = os.path.join(store_dir,
                                        "admission_params.json")
        os.makedirs(store_dir, exist_ok=True)
        self._check_params()
        self._pin_budgets(budgets.select(source_col, "token_budget"))

    # -- signature pinning -------------------------------------------------

    def _check_params(self) -> None:
        """Column-mapping pin (the LineDedupStore discipline): a store
        reopened with different id/text/source columns would compute
        token counts and prefixes over different data while appearing
        to continue the same run."""
        import json as _json

        from axonops_schema_registry_spark.streaming.dedup_store import (
            _write_json_atomic,
        )

        want = {"id_col": self.id_col, "text_col": self.text_col,
                "source_col": self.source_col}
        try:
            with open(self.params_path) as f:
                have = _json.load(f)
        except FileNotFoundError:
            _write_json_atomic(self.params_path, want)
            return
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"corrupt admission-store params at {self.params_path}: "
                f"{exc!r}") from exc
        if have != want:
            raise RuntimeError(
                f"admission store at {self.store_dir} was created with "
                f"different columns (stored {have} vs this session "
                f"{want}); reopen with the stored mapping or build a "
                "new store")

    @staticmethod
    def _tables_differ(a: DataFrame, b: DataFrame) -> bool:
        cols = sorted(a.columns)
        a, b = a.select(*cols), b.select(*cols)
        return (not a.exceptAll(b).isEmpty()
                or not b.exceptAll(a).isEmpty())

    def _pin_budgets(self, budgets: DataFrame) -> None:
        base = os.path.join(self.budgets_dir, "effective=0")
        if os.path.isdir(base):
            stored = budgets.sparkSession.read.parquet(base)
            if self._tables_differ(stored, budgets):
                raise RuntimeError(
                    f"admission store at {self.store_dir} was created "
                    "with a different base budgets table; revisions go "
                    "through update_budgets(new, effective_epoch) — "
                    "silently repinning the base would rewrite the "
                    "as-of view of every already-processed epoch")
            return
        budgets.write.mode("overwrite").parquet(base)

    # -- budget revisions (VERDICT r16 ask #6) ------------------------------

    def _max_processed_epoch(self) -> int | None:
        """Newest epoch with a committed state delta — max over live
        partitions AND the fold watermark (a crash between compact's
        meta swap and its directory sweep can leave orphan live
        partitions BELOW ``below``; taking max(live) alone would then
        under-report and let update_budgets revise an already-folded
        epoch's as-of view)."""
        meta = self._meta()
        live = [int(d.split("=", 1)[1])
                for d in (os.listdir(self.state_dir)
                          if os.path.isdir(self.state_dir) else [])
                if d.startswith("epoch=")
                and d.split("=", 1)[1].lstrip("-").isdigit()]
        cands = live + ([meta["below"] - 1] if meta["below"] > 0 else [])
        return max(cands) if cands else None

    def update_budgets(self, new_budgets: DataFrame,
                       effective_epoch: int) -> None:
        """Publish a budget revision taking effect at
        ``effective_epoch``: per-source latest-wins over the stored
        versions (a table naming ONE source revises only that source;
        a source absent from every version has no budget and admits
        nothing).  Refused when ``effective_epoch`` is not strictly
        above every processed epoch — processed epochs' as-of views
        must stay immutable for replay — or when re-publishing a
        DIFFERENT table at an existing effective epoch (identical
        re-publication is idempotent, the crash-retry shape)."""
        if effective_epoch <= 0:
            raise ValueError(
                "effective_epoch must be positive — effective=0 is the "
                "pinned construction base")
        done = self._max_processed_epoch()
        if done is not None and effective_epoch <= done:
            raise RuntimeError(
                f"budget revision at effective_epoch={effective_epoch} "
                f"is not above the newest processed epoch {done}; a "
                "replayed epoch must re-admit under the budgets it "
                "originally saw (no retroactive admission)")
        new_budgets = new_budgets.select(self.source_col, "token_budget")
        dup = (new_budgets.groupBy(self.source_col).count()
               .filter(F.col("count") > 1))
        if not dup.isEmpty():
            raise ValueError("budget revision names a source twice")
        dst = os.path.join(self.budgets_dir,
                           f"effective={int(effective_epoch)}")
        if os.path.isdir(dst):
            stored = new_budgets.sparkSession.read.parquet(dst)
            if self._tables_differ(stored, new_budgets):
                raise RuntimeError(
                    f"a different budget revision already exists at "
                    f"effective_epoch={effective_epoch}; pick a new "
                    "effective epoch")
            return
        new_budgets.write.mode("overwrite").parquet(dst)

    def _budgets_asof(self, spark, epoch_id: int) -> DataFrame:
        """(source, token_budget) as of ``epoch_id``: per source, the
        newest version with ``effective <= epoch_id``."""
        vers = (spark.read.parquet(self.budgets_dir)
                .filter(F.col("effective") <= int(epoch_id)))
        return (vers.groupBy(self.source_col)
                .agg(F.max_by("token_budget", "effective")
                     .alias("token_budget")))

    # -- compaction (ADVICE r16) --------------------------------------------

    def _meta(self) -> dict:
        import json as _json

        try:
            with open(self.meta_path) as f:
                return _json.load(f)
        except FileNotFoundError:
            return {"gen": -1, "below": 0}
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"corrupt admission-store meta at {self.meta_path}: "
                f"{exc!r}; refusing to silently drop compacted state"
            ) from exc

    def _read_dir(self, spark, path: str,
                  before_epoch: int) -> DataFrame | None:
        """Base generation + live epochs in [meta.below, before_epoch),
        epoch column dropped (neither consumer needs it back)."""
        from axonops_schema_registry_spark.streaming.dedup_store import (
            _read_epochs,
        )

        meta = self._meta()
        parts = []
        if meta["gen"] >= 0:
            base = os.path.join(path + "_base", f"g{meta['gen']}")
            if not os.path.isdir(base):
                raise RuntimeError(
                    f"admission-store meta {self.meta_path} references "
                    f"missing base generation {base}")
            parts.append(spark.read.parquet(base))
        live = _read_epochs(spark, path, before_epoch,
                            from_epoch=meta["below"])
        if live is not None:
            parts.append(live)
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def compact(self, spark, below_epoch: int) -> None:
        """Fold state-delta and admission epochs < ``below_epoch``
        (which must be at-or-below the streaming checkpoint's committed
        watermark — enforced on the ingest side by the ``__call__``
        guard) into the next generation base.  State deltas fold to
        one (n_seen, nt_seen) row per source; admissions fold
        row-preserving.  Crash-safe in the _EpochStore commit order."""
        import shutil as _shutil

        from axonops_schema_registry_spark.streaming.dedup_store import (
            _write_json_atomic,
        )

        meta = self._meta()
        if below_epoch <= meta["below"]:
            return  # nothing new to fold
        state = self._read_dir(spark, self.state_dir, below_epoch)
        adm = self._read_dir(spark, self.admissions_dir, below_epoch)
        if state is None and adm is None:
            return  # truly empty store
        if (state is None) != (adm is None):
            raise RuntimeError(
                f"admission store at {self.store_dir} has data in only "
                "one of state/admissions; corrupt layout — refusing "
                "to compact")
        new_gen = meta["gen"] + 1
        folded_state = (state.groupBy(self.source_col)
                        .agg(F.sum("n_seen").alias("n_seen"),
                             F.sum("nt_seen").alias("nt_seen")))
        folded_state.write.mode("overwrite").parquet(
            os.path.join(self.state_dir + "_base", f"g{new_gen}"))
        adm.write.mode("overwrite").parquet(
            os.path.join(self.admissions_dir + "_base", f"g{new_gen}"))
        _write_json_atomic(self.meta_path,
                           {"gen": new_gen, "below": below_epoch})
        for path in (self.state_dir, self.admissions_dir):
            for g in range(new_gen):
                _shutil.rmtree(os.path.join(path + "_base", f"g{g}"),
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
                        _shutil.rmtree(os.path.join(path, d),
                                       ignore_errors=True)

    # -- reads ----------------------------------------------------------------

    def _prior_state(self, spark, before_epoch: int) -> DataFrame | None:
        deltas = self._read_dir(spark, self.state_dir, before_epoch)
        if deltas is None:
            return None
        return (deltas.groupBy(self.source_col)
                .agg(F.sum("n_seen").alias("__prior_seen"),
                     F.sum("nt_seen").alias("__prior_nt")))

    def all_admissions(self, spark) -> DataFrame | None:
        """Every admitted document so far:
        (id, source, n_tokens, mix_rank, cum_tokens)."""
        adm = self._read_dir(spark, self.admissions_dir, 1 << 62)
        if adm is None:
            return None
        return adm.select(self.id_col, self.source_col, "n_tokens",
                          "mix_rank", "cum_tokens")

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        from axonops_schema_registry_spark.llm.sampling import (
            portable_hash,
        )

        spark = batch_df.sparkSession
        below = self._meta()["below"]
        if int(epoch_id) < below:
            raise RuntimeError(
                f"epoch {epoch_id} is below the compaction watermark "
                f"{below}; compact() must only fold epochs the "
                "streaming checkpoint can no longer replay")
        ex = (batch_df.select(self.id_col, self.source_col,
                              self.text_col)
              .withColumn("__h", portable_hash(
                  F.col(self.id_col).cast("string")))
              .withColumn("__nt", F.size(F.split(
                  F.col(self.text_col), " ")).cast("bigint")))
        prior = self._prior_state(spark, int(epoch_id))
        if prior is not None:
            ex = (ex.join(F.broadcast(prior), self.source_col, "left")
                  .na.fill({"__prior_seen": 0, "__prior_nt": 0}))
        else:
            ex = (ex.withColumn("__prior_seen", F.lit(0).cast("bigint"))
                  .withColumn("__prior_nt", F.lit(0).cast("bigint")))
        wsum = (Window.partitionBy(self.source_col)
                .orderBy("__h", self.id_col)
                .rowsBetween(Window.unboundedPreceding,
                             Window.currentRow))
        wr = (Window.partitionBy(self.source_col)
              .orderBy("__h", self.id_col))
        scored = (ex
                  .withColumn("cum_tokens",
                              F.col("__prior_nt")
                              + F.sum("__nt").over(wsum))
                  .withColumn("mix_rank",
                              (F.col("__prior_seen")
                               + F.row_number().over(wr))
                              .cast("bigint"))
                  .join(F.broadcast(
                      self._budgets_asof(spark, int(epoch_id))),
                      self.source_col)
                  .localCheckpoint(eager=True))  # feeds 2 writes
        admitted = (scored.filter(F.col("cum_tokens")
                                  <= F.col("token_budget"))
                    .select(self.id_col, self.source_col,
                            F.col("__nt").alias("n_tokens"),
                            "mix_rank", "cum_tokens"))
        # overwrite keeps an at-least-once replay idempotent
        admitted.write.mode("overwrite").parquet(
            os.path.join(self.admissions_dir, f"epoch={int(epoch_id)}"))
        # the state delta counts every SEEN document (admitted or not):
        # the cumulative is over the full prefix, which is exactly what
        # keeps a closed source closed
        delta = (scored.groupBy(self.source_col)
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_seen"),
                      F.sum("__nt").cast("bigint").alias("nt_seen")))
        delta.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"epoch={int(epoch_id)}"))
        release_checkpoint(scored)
