"""applyInPandasWithState: per-actor running totals accumulate across
micro-batches and end equal to the one-pass batch aggregate."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.streaming.audit import (
    audit_stream_from_events,
    normalize_audit,
)
from axonops_schema_registry_spark.streaming.stateful import (
    _bucket_replay,
    running_actor_totals,
    token_bucket_flags,
)


def test_running_totals_accumulate_across_batches(spark, sf_dir):
    # split the events parquet into two files → two micro-batches
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    half = src.num_rows // 2
    d = tempfile.mkdtemp(prefix="stateful_src_")
    ckpt = tempfile.mkdtemp(prefix="stateful_ckpt_")
    try:
        pq.write_table(src.slice(0, half), os.path.join(d, "p0.parquet"))
        pq.write_table(src.slice(half), os.path.join(d, "p1.parquet"))

        stream = audit_stream_from_events(spark, d, max_files_per_trigger=1)
        q = (running_actor_totals(stream)
             .writeStream.format("memory").queryName("actor_totals")
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        # memory sink in update mode appends every emitted update; the
        # LAST row per actor is the final running total
        rows = spark.sql("SELECT * FROM actor_totals").collect()
        finals: dict[int, tuple] = {}
        for r in rows:  # emitted in batch order; later overwrite earlier
            finals[r.actor_id] = (r.total_requests, r.total_failures,
                                  r.last_event_id)
        assert len(rows) > len(finals), "expected updates across >1 batch"

        batch = normalize_audit(load_table(spark, sf_dir, "events"))
        want = {r.actor_id: (r.total_requests, r.total_failures,
                             r.last_event_id)
                for r in running_actor_totals(batch).collect()}
        assert finals == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# ---------------------------------------------------------------------------
# token bucket: refill edge cases on the shared kernel
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000
RATE = 1.0 / 14400.0  # 1 token per 4 h
BURST = 2.0


def test_bucket_first_request_consumes_from_full_burst():
    allowed, after, _, _ = _bucket_replay([0], BURST, -1, RATE, BURST)
    assert allowed == [True] and after == [BURST - 1.0]


def test_bucket_burst_then_deny_then_refill():
    # three back-to-back requests drain the burst; the third is denied
    # with ~0 tokens; after 4 h exactly one token has refilled
    ts = [0, 1, 2, 2 + 4 * HOUR_US]
    allowed, after, _, _ = _bucket_replay(ts, BURST, -1, RATE, BURST)
    assert allowed == [True, True, False, True]
    assert after[2] < 1.0 and after[3] < 1.0


def test_bucket_fractional_refill_accumulates():
    # drain burst, then two requests 2 h apart: 0.5 tokens → denied,
    # another 2 h → crosses 1.0 → allowed
    ts = [0, 2 * HOUR_US, 4 * HOUR_US]
    allowed, _, _, _ = _bucket_replay(ts, 1.0, -1, RATE, 1.0)
    assert allowed == [True, False, True]


def test_bucket_long_idle_clamps_at_burst():
    # a week idle must not bank more than `burst` tokens
    ts = [0, 7 * 24 * HOUR_US, 7 * 24 * HOUR_US + 1,
          7 * 24 * HOUR_US + 2]
    allowed, after, _, _ = _bucket_replay(ts, BURST, -1, RATE, BURST)
    # after the idle gap only `burst` (=2) requests pass back-to-back
    assert allowed == [True, True, True, False]


def test_bucket_state_carry_matches_one_shot():
    # replaying in two chunks with carried state == one-shot replay
    ts = [i * HOUR_US for i in range(10)]
    a1, f1, tok, last = _bucket_replay(ts[:4], BURST, -1, RATE, BURST)
    a2, f2, _, _ = _bucket_replay(ts[4:], tok, last, RATE, BURST)
    a, f, _, _ = _bucket_replay(ts, BURST, -1, RATE, BURST)
    assert a1 + a2 == a and f1 + f2 == f


def test_token_bucket_stream_equals_batch(spark, sf_dir):
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    half = src.num_rows // 2
    d = tempfile.mkdtemp(prefix="tb_src_")
    ckpt = tempfile.mkdtemp(prefix="tb_ckpt_")
    try:
        pq.write_table(src.slice(0, half), os.path.join(d, "p0.parquet"))
        pq.write_table(src.slice(half), os.path.join(d, "p1.parquet"))

        stream = audit_stream_from_events(spark, d, max_files_per_trigger=1)
        q = (token_bucket_flags(stream, rate=RATE, burst=BURST)
             .writeStream.format("memory").queryName("tb_flags")
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {r.event_id: (r.allowed, r.tokens_after)
               for r in spark.sql("SELECT * FROM tb_flags").collect()}

        batch = normalize_audit(load_table(spark, sf_dir, "events"))
        want = {r.event_id: (r.allowed, r.tokens_after)
                for r in token_bucket_flags(
                    batch, rate=RATE, burst=BURST).collect()}
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_exact_dedup_state_store_across_batches(spark, sf_dir):
    """State-store exact dedup: per-fingerprint first-wins verdicts
    accumulate across micro-batches and equal the one-pass batch
    window (ordered replay)."""
    import pyspark.sql.functions as F

    from axonops_schema_registry_spark.streaming.stateful import (
        exact_dedup_flags_stateful,
    )

    base = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text"))
    cut = base.approxQuantile("doc_id", [0.5], 0.0)[0]
    # the synthetic corpus has near-dups but no EXACT dups: plant
    # batch-2 exact copies of batch-1 texts under fresh high ids
    planted = (base.filter(f"doc_id < {cut}").limit(20)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                       "text"))
    docs = base.unionByName(planted)
    batches = (base.filter(f"doc_id < {cut}"),
               base.filter(f"doc_id >= {cut}").unionByName(planted))
    d = tempfile.mkdtemp(prefix="ed_src_")
    ckpt = tempfile.mkdtemp(prefix="ed_ckpt_")
    try:
        for i, bdf in enumerate(batches):
            sub = tempfile.mkdtemp(prefix="ed_part_")
            bdf.coalesce(1).write.mode("overwrite") \
                .parquet(sub)
            part = next(p for p in os.listdir(sub)
                        if p.endswith(".parquet"))
            dst = os.path.join(d, f"p{i}.parquet")
            shutil.copy(os.path.join(sub, part), dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
            shutil.rmtree(sub, ignore_errors=True)

        stream = (spark.readStream.schema("doc_id bigint, text string")
                  .option("maxFilesPerTrigger", 1).parquet(d))
        q = (exact_dedup_flags_stateful(stream)
             .writeStream.format("memory").queryName("ed_flags")
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        got = {r.doc_id: (r.is_dup, r.canonical_id)
               for r in spark.sql("SELECT * FROM ed_flags").collect()}
        want = {r.doc_id: (r.is_dup, r.canonical_id)
                for r in exact_dedup_flags_stateful(docs).collect()}
        assert got == want
        assert any(d_ for d_, _ in got.values()), "no dups in corpus?"
        # cross-batch state: a dup in batch 2 of an original from
        # batch 1 must point at the batch-1 canonical
        cross = [(d_, c) for d_, (dup, c) in got.items()
                 if dup and c < cut and d_ >= 1_000_000]
        assert len(cross) == 20, len(cross)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
