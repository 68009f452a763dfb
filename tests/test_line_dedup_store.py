"""`LineDedupStore` — ln1's persistent out-of-order repair domain
(VERDICT r14 ask #5).

Equality contract: under ordered id arrival the store's per-epoch
outputs equal one batch :func:`line_dedup` over the union (the
LineDedupSink pin, now for the store); under OUT-OF-ORDER arrival —
the case the sink explicitly scopes out to "the persistent store's
repair domain" — :meth:`repair` converges `all_results()` to the exact
batch answer, moving each keep from its arrival-first keeper to the
batch-global (id, block_idx) winner.  Repair is idempotent and its
victim set is bounded by the late batch's key set (asserted via the
returned repaired-doc count).
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest

from axonops_schema_registry_spark.llm.dedup import line_dedup
from axonops_schema_registry_spark.streaming.dedup_store import (
    LineDedupStore,
)

BLK_A = "a1 a2 a3 a4 a5"
BLK_B = "b1 b2 b3 b4 b5"
BLK_C = "c1 c2 c3 c4 c5"


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _batch_want(spark, rows):
    return {r.id: (r.n_blocks, r.n_removed, r.cleaned_text)
            for r in line_dedup(_mkdocs(spark, rows), "doc_id", "text",
                                block_words=5,
                                min_block_words=3).collect()}


def _store(spark, d):
    return LineDedupStore(spark, d, block_words=5, min_block_words=3)


def _got(store):
    return {r.id: (r.n_blocks, r.n_removed, r.cleaned_text)
            for r in store.all_results().collect()}


def test_line_store_ordered_arrival_equals_batch(spark):
    """In-id-order epochs: the store's union of outputs IS the batch
    answer with no repair at all, and re-delivering an epoch against
    post-stream state rewrites a value-identical partition."""
    e0 = [(1, f"{BLK_A} {BLK_B}"), (2, BLK_A)]
    e1 = [(3, f"{BLK_B} {BLK_C}"), (4, BLK_C)]
    d = tempfile.mkdtemp(prefix="ln_store_")
    try:
        store = _store(spark, d)
        store.process_batch(_mkdocs(spark, e0), 0)
        store.process_batch(_mkdocs(spark, e1), 1)
        want = _batch_want(spark, e0 + e1)
        assert _got(store) == want
        assert store.repair() == 0          # nothing out of order
        # at-least-once replay: epoch 0 re-delivered, value-identical
        store.process_batch(_mkdocs(spark, e0), 0)
        assert _got(store) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_line_store_out_of_order_repair_equals_batch(spark):
    """A late epoch carrying SMALLER doc ids: before repair the
    arrival-first keepers hold the duplicated blocks (sink semantics);
    after repair the batch-global winners do — all_results equals one
    batch line_dedup over the concatenated corpus, exactly."""
    e0 = [(10, f"{BLK_A} {BLK_B}"), (11, BLK_B)]
    late = [(1, BLK_A), (2, f"{BLK_B} {BLK_C}")]   # ids sort FIRST
    d = tempfile.mkdtemp(prefix="ln_store_")
    try:
        store = _store(spark, d)
        store.process_batch(_mkdocs(spark, e0), 0)
        store.process_batch(_mkdocs(spark, late), 1)
        want = _batch_want(spark, e0 + late)
        before = _got(store)
        assert before != want               # the divergence is real:
        # doc 10 kept A+B on arrival; batch wants doc 1 to keep A and
        # doc 2 to keep B+C
        n = store.repair()
        assert n > 0
        assert _got(store) == want
        # idempotent: a second repair finds the same winners
        assert store.repair() == n
        assert _got(store) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_line_store_foreachbatch_out_of_order_stream(spark, tmp_path):
    """End-to-end wiring: a structured-streaming file source delivers
    the HIGH-id file first and the low-id file second (out-of-order
    arrival through a real foreachBatch query), then one repair()
    converges the persisted results to the batch answer."""
    import os

    e0 = [(10, f"{BLK_A} {BLK_B}"), (11, BLK_B)]
    late = [(1, BLK_A), (2, f"{BLK_B} {BLK_C}")]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate((e0, late)):
        part_dir = str(tmp_path / f"b{i}")
        _mkdocs(spark, rows).coalesce(1).write.parquet(part_dir)
        part = next(p for p in os.listdir(part_dir)
                    if p.endswith(".parquet"))
        dst = os.path.join(src, f"part-{i}.parquet")
        import shutil as sh
        sh.copy(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    store = _store(spark, str(tmp_path / "store"))
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(store)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    want = _batch_want(spark, e0 + late)
    assert _got(store) != want          # arrival-first until repaired
    assert store.repair() > 0
    assert _got(store) == want


def test_line_store_repair_seeded_fuzz(spark):
    """Seeded random corpora split into shuffled-id epochs: repair
    always converges the store to the batch answer (the
    test_dedup_store_incremental convention for the line family)."""
    rng = random.Random(1507)
    vocab = [f"w{j}" for j in range(12)]
    for trial in range(4):
        rows = []
        for i in range(24):
            nblk = rng.randint(1, 4)
            blocks = [" ".join(rng.choice(vocab) for _ in range(5))
                      for _ in range(nblk)]
            rows.append((i, " ".join(blocks)))
        rng.shuffle(rows)
        cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
        epochs = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
        d = tempfile.mkdtemp(prefix="ln_fuzz_")
        try:
            store = _store(spark, d)
            for e, batch in enumerate(epochs):
                store.process_batch(_mkdocs(spark, batch), e)
            store.repair()
            assert _got(store) == _batch_want(spark, rows), \
                f"trial {trial} diverged after repair"
        finally:
            shutil.rmtree(d, ignore_errors=True)
