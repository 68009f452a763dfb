#!/usr/bin/env python
"""LineDedupStore LIFECYCLE replay at a 10x corpus (r17, VERDICT r16
ask #7): the multi-cycle repair bug (intermediate winner kept a stale
copy) was caught at pytest scale in r16 — this replays the full
ingest → repair → compact → LATE ingest → repair → compact lifecycle
at 10x sf0.1 (50k docs) and equality-checks ``all_results`` against
one batch :func:`line_dedup` over the delivered corpus AFTER EVERY
MAINTENANCE STEP, so the per-epoch-first candidate-set argument gets
its big-corpus replay.

Corpus: 10 id-shifted replicas of sf0.1 documents (50k docs); docs with
``doc_id % 5 == 0`` keep their text UNSALTED in every replica (20%
cross-replica duplicate blocks), the rest are replica-salted
(content-distinct).  Replicas 2..9 arrive in order; replica 1 (smaller
ids — the new global winner for every shared block) arrives LATE and
is repaired; after a compact, replica 0 (smaller still) arrives — the
multi-cycle shape where the pre-0 keeper is an INTERMEDIATE winner
(replica 1's copy), exactly the candidate set the two-endpoint
shortcut missed in r16.

Appends the timing + equality table to docs/SCALING.md.
Usage: python scripts/r17_lnstore_lifecycle.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.llm.dedup import line_dedup  # noqa: E402
from axonops_schema_registry_spark.operators.core import (  # noqa: E402
    release_checkpoint,
)
from axonops_schema_registry_spark.session import get_spark  # noqa: E402
from axonops_schema_registry_spark.streaming.dedup_store import (  # noqa: E402
    LineDedupStore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MARKER = "\n## r17 appendix: LineDedupStore lifecycle replay at 10x"


def _replica(docs, i: int):
    """Replica i: shifted ids; text salted EXCEPT doc_id % 5 == 0
    (those stay shared content — the cross-replica duplicate blocks
    whose winners move as smaller-id replicas arrive late)."""
    d = docs.withColumn("doc_id",
                        F.col("doc_id") + F.lit(i * 10_000_000))
    if i == 0:
        return d
    return d.withColumn("text", F.when(
        F.col("doc_id") % 5 == 0, F.col("text")).otherwise(F.expr(
            f"array_join(transform(split(text, ' '), "
            f"w -> concat(w, '_r{i}')), ' ')")))


def _mismatch(store, delivered) -> int:
    """Rows differing between the store's current view and one batch
    line_dedup over the delivered corpus (both directions)."""
    want = (line_dedup(delivered, "doc_id", "text",
                       block_words=10, min_block_words=5)
            .select("id", "n_blocks", "n_removed", "cleaned_text"))
    got = store.all_results().select("id", "n_blocks", "n_removed",
                                     "cleaned_text")
    return got.exceptAll(want).count() + want.exceptAll(got).count()


def main() -> int:
    spark = get_spark("r17-lnstore-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(os.path.join(SF_DIR,
                                            "documents.parquet"))
            .select("doc_id", "text").localCheckpoint(eager=True))
    n = docs.count()
    reps = {i: _replica(docs, i).localCheckpoint(eager=True)
            for i in range(10)}

    d = tempfile.mkdtemp(prefix="lnstore_lc_")
    lines = [MARKER, "",
             f"Corpus: 10 delivered replicas x {n:,} docs "
             f"({10 * n:,} total), 20% cross-replica shared blocks; "
             "equality = all_results vs one batch line_dedup over the "
             "delivered corpus (exceptAll both ways), checked after "
             "every maintenance step.", "",
             "| step | store docs | sec | mismatch rows |",
             "|---|---|---|---|"]
    try:
        store = LineDedupStore(spark, d, block_words=10,
                               min_block_words=5)
        delivered = None
        # in-order head: replicas 2..9 as epochs 0..7
        t0 = time.perf_counter()
        for e, i in enumerate(range(2, 10)):
            release_checkpoint(store.process_batch(reps[i], e))
            delivered = (reps[i] if delivered is None
                         else delivered.unionByName(reps[i]))
        t_ingest = time.perf_counter() - t0
        delivered = delivered.localCheckpoint(eager=True)
        lines.append(f"| ingest replicas 2-9 (8 epochs) | {8 * n:,} "
                     f"| {t_ingest:.2f} | — |")

        # late cycle 1: replica 1 (new global winner for shared keys)
        t0 = time.perf_counter()
        release_checkpoint(store.process_batch(reps[1], 8))
        delivered = delivered.unionByName(reps[1]) \
            .localCheckpoint(eager=True)
        n_rep = store.repair()
        t1 = time.perf_counter() - t0
        mm1 = _mismatch(store, delivered)
        lines.append(f"| late replica 1 + repair ({n_rep:,} victims) "
                     f"| {9 * n:,} | {t1:.2f} | {mm1} |")

        # compact below the checkpoint watermark (epochs 0..8 folded)
        t0 = time.perf_counter()
        store.compact(below_epoch=9)
        t2 = time.perf_counter() - t0
        mm2 = _mismatch(store, delivered)
        lines.append(f"| compact(9) | {9 * n:,} | {t2:.2f} | {mm2} |")

        # late cycle 2 AFTER the repair+compact: replica 0 — the
        # current keeper of every shared key is replica 1's copy, an
        # INTERMEDIATE winner (the r16 candidate-set shape) at 10x
        t0 = time.perf_counter()
        release_checkpoint(store.process_batch(reps[0], 9))
        delivered = delivered.unionByName(reps[0]) \
            .localCheckpoint(eager=True)
        n_rep2 = store.repair()
        t3 = time.perf_counter() - t0
        mm3 = _mismatch(store, delivered)
        lines.append(f"| late replica 0 + repair ({n_rep2:,} victims, "
                     f"intermediate-winner cycle) | {10 * n:,} "
                     f"| {t3:.2f} | {mm3} |")

        # final full compact (folds overlays), then the last equality
        t0 = time.perf_counter()
        store.compact(below_epoch=10)
        t4 = time.perf_counter() - t0
        mm4 = _mismatch(store, delivered)
        lines.append(f"| compact(10) full fold | {10 * n:,} "
                     f"| {t4:.2f} | {mm4} |")
        ok = (mm1 == mm2 == mm3 == mm4 == 0) and n_rep > 0 \
            and n_rep2 > 0
        verdict = ("flags == batch at every step" if ok
                   else "MISMATCH")
        lines += ["", f"Verdict: {verdict} — repair cycles moved "
                  f"{n_rep:,} then {n_rep2:,} victims."]
    finally:
        shutil.rmtree(d, ignore_errors=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "docs", "SCALING.md")
    text = open(path).read()
    if MARKER in text:
        text = text[:text.index(MARKER)]
    with open(path, "w") as f:
        f.write(text + "\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
