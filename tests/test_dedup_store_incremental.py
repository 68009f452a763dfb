"""`BucketedDedupStore.reflag_incremental` — the bounded out-of-order
repair (VERDICT r10 ask #4).

Equality contract: after repairing the SAME late epochs, the
incremental path must be indistinguishable from the full
:meth:`reflag` — identical flags, identical behavior for every future
ingest (which exercises the repaired fps/bucket/token views), and
identical to the one-shot batch operator over the concatenated corpus
(the store's documented ground truth).  Pinned deterministically and
with seeded random corpora; the cost shape (∝ batch, not store) is
measured separately in scripts/reflag_smoke.py → docs/SCALING.md.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pytest

from axonops_schema_registry_spark.llm.dedup import incremental_dedup_flags
from axonops_schema_registry_spark.streaming.dedup_store import (
    BucketedDedupStore,
)

_BASE = [f"tok{j}" for j in range(40)]


def _near(tag: str) -> str:
    ws = list(_BASE)
    ws[20] = str(tag)
    return " ".join(ws)


def _distinct(i) -> str:
    return " ".join(f"d{i}x{j}" for j in range(40))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _flags_dict(df) -> dict:
    return {r.doc_id: (r.is_dup, r.dup_of) for r in df.collect()}


def _two_stores(spark, batches):
    """Ingest identical epoch sequences into two fresh stores and
    return them (caller repairs one fully, one incrementally)."""
    dirs = [tempfile.mkdtemp(prefix="rfi_full_"),
            tempfile.mkdtemp(prefix="rfi_incr_")]
    stores = [BucketedDedupStore(spark, d) for d in dirs]
    for store in stores:
        for e, b in enumerate(batches):
            store(b, epoch_id=e)
    return stores, dirs


def test_incremental_equals_full_reflag_and_batch(spark):
    """The deterministic scenario from the full-reflag test: epoch 0
    carries larger ids (near-dup pair + distincts), epoch 1 backfills
    smaller ids including a byte-identical twin (rep re-key), a new
    near-dup, and a distinct doc."""
    b0 = _docs(spark, [(10, _near("pA")), (11, _near("pB")),
                       (12, _distinct(12)), (13, _distinct(13)),
                       (14, _distinct(14))])
    b1 = _docs(spark, [(0, _near("pA")), (1, _near("pC")),
                       (2, _distinct(2))])
    (full, incr), dirs = _two_stores(spark, [b0, b1])
    try:
        full.reflag(below_epoch=2)
        incr.reflag_incremental([1], below_epoch=2)
        want = _flags_dict(incremental_dedup_flags(b0.unionByName(b1)))
        assert _flags_dict(full.all_flags()) == want
        assert _flags_dict(incr.all_flags()) == want
        # the repair is an overlay, not a rewrite: epoch dirs intact,
        # one committed delta
        assert incr._meta().get("nrep", 0) == 1
        assert os.path.isdir(os.path.join(dirs[1], "repairs", "r0"))

        # future ingests read THROUGH the overlay: a doc byte-equal to
        # the re-keyed group and a near-dup of it must flag against
        # the TRUE original on both stores
        b2 = _docs(spark, [(30, _near("pA")), (31, _near("pB")),
                           (32, _distinct(32))])
        full(b2, epoch_id=2)
        incr(b2, epoch_id=2)
        want2 = _flags_dict(incremental_dedup_flags(
            b0.unionByName(b1).unionByName(b2)))
        assert _flags_dict(full.all_flags()) == want2
        assert _flags_dict(incr.all_flags()) == want2
        assert want2[30] == (True, 0)

        # a quiescent compact folds the overlay into the base and
        # sweeps it; verdicts unchanged
        incr.compact(below_epoch=3)
        assert _flags_dict(incr.all_flags()) == want2
        assert incr._meta().get("nrep", 0) == 0
        assert not os.path.isdir(os.path.join(dirs[1], "repairs"))
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


def test_incremental_reflag_preconditions(spark):
    b0 = _docs(spark, [(5, _distinct(5))])
    d = tempfile.mkdtemp(prefix="rfi_pre_")
    try:
        store = BucketedDedupStore(spark, d, max_bucket=4)
        store(b0, epoch_id=0)
        with pytest.raises(RuntimeError, match="max_bucket"):
            store.reflag_incremental([0], below_epoch=1)
        plain = BucketedDedupStore(spark, d)
        with pytest.raises(RuntimeError, match="quiescent"):
            plain.reflag_incremental([0], below_epoch=0)
        with pytest.raises(RuntimeError, match="live range"):
            plain.reflag_incremental([7], below_epoch=1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_incremental_equals_full_on_random_out_of_order(spark, seed):
    """Seeded random corpora: identical-text groups (rep re-keys),
    near-dup families (first-wins flips), and distincts, dealt into 3
    epochs with ids shuffled so later epochs carry smaller ids.
    Repairing all post-first epochs must equal the full reflag AND
    the one-shot batch answer, and a follow-up ingest must behave
    identically on both stores."""
    rng = random.Random(seed)
    texts = []
    for fam in range(4):                      # near-dup families
        for _ in range(rng.randint(1, 3)):
            texts.append(_near(f"f{fam}v{rng.randint(0, 2)}"))
    for g in range(3):                        # identical-text groups
        texts += [_near(f"ident{g}")] * rng.randint(2, 3)
    for i in range(6):
        texts.append(_distinct(f"s{seed}i{i}"))
    ids = list(range(len(texts)))
    rng.shuffle(ids)
    rows = list(zip(ids, texts))
    rng.shuffle(rows)
    cut1, cut2 = len(rows) // 3, 2 * len(rows) // 3
    batches = [_docs(spark, rows[:cut1]),
               _docs(spark, rows[cut1:cut2]),
               _docs(spark, rows[cut2:])]
    corpus = _docs(spark, rows)
    (full, incr), dirs = _two_stores(spark, batches)
    try:
        full.reflag(below_epoch=3)
        incr.reflag_incremental([1, 2], below_epoch=3)
        want = _flags_dict(incremental_dedup_flags(corpus))
        assert _flags_dict(full.all_flags()) == want
        assert _flags_dict(incr.all_flags()) == want

        nxt = _docs(spark, [(100 + seed, _near("ident0")),
                            (101 + seed, _near(f"f0v{seed % 3}")),
                            (102 + seed, _distinct(f"n{seed}"))])
        full(nxt, epoch_id=3)
        incr(nxt, epoch_id=3)
        want2 = _flags_dict(
            incremental_dedup_flags(corpus.unionByName(nxt)))
        assert _flags_dict(full.all_flags()) == want2
        assert _flags_dict(incr.all_flags()) == want2
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


def test_two_successive_incremental_repairs(spark):
    """Repairs stack: a second out-of-order wave after the first
    repair commits a second overlay (later overrides earlier), still
    converging to the batch answer."""
    b0 = _docs(spark, [(20, _near("pA")), (21, _distinct(21))])
    b1 = _docs(spark, [(10, _near("pA")), (11, _near("pB"))])   # late
    b2 = _docs(spark, [(30, _near("pB")), (31, _distinct(31))])
    b3 = _docs(spark, [(0, _near("pA")), (1, _distinct(1))])    # later
    d = tempfile.mkdtemp(prefix="rfi_stack_")
    try:
        store = BucketedDedupStore(spark, d)
        store(b0, epoch_id=0)
        store(b1, epoch_id=1)
        store.reflag_incremental([1], below_epoch=2)
        store(b2, epoch_id=2)
        store(b3, epoch_id=3)
        store.reflag_incremental([3], below_epoch=4)
        assert store._meta().get("nrep", 0) == 2
        want = _flags_dict(incremental_dedup_flags(
            b0.unionByName(b1).unionByName(b2).unionByName(b3)))
        assert _flags_dict(store.all_flags()) == want
        # full reflag folds both overlays away and agrees
        store.reflag(below_epoch=4)
        assert store._meta().get("nrep", 0) == 0
        assert _flags_dict(store.all_flags()) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
