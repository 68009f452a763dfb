"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps no per-actor state beyond metrics counters; a
registry-analytics deployment wants *running* per-actor aggregates that
survive across micro-batches (cumulative request totals, cumulative
failure counts, last-seen timestamp).  That is exactly the shape
``applyInPandasWithState`` exists for: state is a typed tuple per group
key, batches arrive as Arrow frames, and every micro-batch emits the
updated running row (outputMode="update").

Scale notes: state is one tiny tuple per actor; the state store shards by
the group key, so cardinality scales with actors, not events.  For
unbounded actor spaces add a timeout (GroupStateTimeout.ProcessingTime)
and emit-and-forget idle actors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = ("actor_id bigint, total_requests bigint, total_failures bigint, "
              "last_event_id bigint")
STATE_DDL = "total bigint, failures bigint, last_event_id bigint"


def _update_actor_totals(key: tuple, batches: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    total, failures, last_event_id = (state.get if state.exists
                                      else (0, 0, -1))
    for pdf in batches:
        total += len(pdf)
        failures += int((pdf["outcome"] == "failure").sum())
        if len(pdf):
            last_event_id = int(pdf["event_id"].max())
    state.update((total, failures, last_event_id))
    yield pd.DataFrame({
        "actor_id": [key[0]],
        "total_requests": [total],
        "total_failures": [failures],
        "last_event_id": [last_event_id],
    })


def _bucket_replay(us_values, tokens: float, last_us: int,
                   rate: float, burst: float):
    """Shared token-bucket kernel (batch fold AND streaming state update).

    Continuous-refill semantics, exactly the reference's
    ``tokenBucket.allow`` (/root/reference/internal/auth/ratelimit.go:
    91-113): on each request, refill ``elapsed_seconds * rate`` capped at
    ``burst``, then consume one token iff at least one whole token is
    available.  A fresh bucket starts FULL with ``lastRefill = now`` —
    the first request sees ``burst`` tokens (newTokenBucket:82-89).

    Returns (allowed_flags, tokens_after, final_tokens, final_last_us).
    The arithmetic is plain IEEE-double adds/multiplies in arrival order,
    so a SQL replay with the identical expression sequence is bit-exact.
    """
    allowed, after = [], []
    for us in us_values:
        us = int(us)
        if last_us >= 0:
            tokens = tokens + ((us - last_us) / 1_000_000.0) * rate
            if tokens > burst:
                tokens = burst
        last_us = us
        if tokens >= 1.0:
            tokens -= 1.0
            allowed.append(True)
        else:
            allowed.append(False)
        after.append(tokens)
    return allowed, after, tokens, last_us


TB_OUTPUT_DDL = ("actor_id bigint, event_id bigint, allowed boolean, "
                 "tokens_after double")
TB_STATE_DDL = "tokens double, last_us bigint"


def token_bucket_flags(audit: DataFrame, rate: float, burst: float,
                       ts_col: str = "ts") -> DataFrame:
    """Per-actor continuous-refill token-bucket admission (the reference's
    RateLimiter with ``PerClient`` enabled, ratelimit.go:115-176) over an
    audit frame with (actor_id, event_id, ``ts_col``).

    Streaming input → ``applyInPandasWithState``: state is one (tokens,
    last_us) pair per actor — the exact footprint of the reference's
    ``clients`` map — sharded by the state store, so cardinality scales
    with actors, not events.  Events must arrive in event-time order
    across micro-batches (the file-replay source preserves it; out-of-
    order feeds need a watermark-sorted pre-stage).

    Batch input → one cogrouped fold per actor (same kernel), emitting
    the full admission log.  Keys parallelize; per-group state is O(1).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us")
    slim = audit.select("actor_id", "event_id", us)

    if not audit.isStreaming:
        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["us", "event_id"])
            allowed, after, _, _ = _bucket_replay(
                pdf["us"], burst, -1, rate, burst)
            return pd.DataFrame({
                "actor_id": pdf["actor_id"].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "allowed": allowed,
                "tokens_after": after,
            })

        return slim.groupBy("actor_id").applyInPandas(fold, TB_OUTPUT_DDL)

    def update(key: tuple, batches: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        tokens, last_us = (state.get if state.exists else (burst, -1))
        for pdf in batches:
            pdf = pdf.sort_values(["us", "event_id"])
            allowed, after, tokens, last_us = _bucket_replay(
                pdf["us"], tokens, last_us, rate, burst)
            yield pd.DataFrame({
                "actor_id": pdf["actor_id"].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "allowed": allowed,
                "tokens_after": after,
            })
        state.update((float(tokens), int(last_us)))

    return (slim.groupBy("actor_id")
            .applyInPandasWithState(
                update,
                outputStructType=TB_OUTPUT_DDL,
                stateStructType=TB_STATE_DDL,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def running_actor_totals(audit: DataFrame) -> DataFrame:
    """Cumulative per-actor totals across micro-batches (streaming) or in
    one pass (batch fallback via groupBy, same output schema)."""
    if not audit.isStreaming:
        from pyspark.sql import functions as F

        return (audit.groupBy("actor_id")
                .agg(F.count(F.lit(1)).alias("total_requests"),
                     F.sum(F.when(F.col("outcome") == "failure", 1)
                           .otherwise(0)).alias("total_failures"),
                     F.max("event_id").alias("last_event_id")))
    return (audit.groupBy("actor_id")
            .applyInPandasWithState(
                _update_actor_totals,
                outputStructType=OUTPUT_DDL,
                stateStructType=STATE_DDL,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


ED_OUTPUT_DDL = ("doc_id bigint, fingerprint string, is_dup boolean, "
                 "canonical_id bigint")
ED_STATE_DDL = "canonical_id bigint"


def exact_dedup_flags_stateful(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Exact-dedup admission with a REAL state store: first-wins
    per-content-fingerprint verdicts that survive across micro-batches.

    This is the state-store twin of ``llm.dedup.exact_dedup`` (dd1) the
    way ``IncrementalDedupSink`` is the foreachBatch twin of the
    near-dup filter: state is ONE bigint (the canonical id) per
    fingerprint, sharded by the state store, so cardinality scales with
    distinct content, not document count — the correct 100 TB footprint
    for ingest-time exact dedup.

    Batch input → one window pass (min id per fingerprint), identical
    output.  Streaming equality with the batch form holds whenever
    arrival order follows id order (the same contract dd7's streaming
    twin documents); within a micro-batch ties resolve by id.
    """
    slim = docs.select(F.col(id_col).alias("doc_id"),
                       F.sha2(F.col(text_col), 256).alias("fingerprint"))
    if not docs.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy("fingerprint")
        return (slim
                .withColumn("canonical_id", F.min("doc_id").over(w))
                .select("doc_id", "fingerprint",
                        (F.col("doc_id") != F.col("canonical_id"))
                        .alias("is_dup"),
                        "canonical_id"))

    def update(key: tuple, batches: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        canonical = state.get[0] if state.exists else None
        # drain ALL Arrow chunks before deciding the canonical: a group
        # larger than arrow.maxRecordsPerBatch arrives as several pdfs,
        # and sorting within one chunk would elect a first-chunk-min
        # (nondeterministic across runs) instead of the micro-batch min
        # the batch branch computes.  Group volume per micro-batch is
        # bounded by the trigger size, so the concat is safe.
        chunks = [pdf for pdf in batches]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   .sort_values("doc_id"))
            dup, canon = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                if canonical is None:
                    canonical = did
                dup.append(did != canonical)
                canon.append(canonical)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "fingerprint": key[0],
                "is_dup": dup,
                "canonical_id": canon,
            })
        if canonical is not None:
            state.update((int(canonical),))

    return (slim.groupBy("fingerprint")
            .applyInPandasWithState(
                update,
                outputStructType=ED_OUTPUT_DDL,
                stateStructType=ED_STATE_DDL,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
