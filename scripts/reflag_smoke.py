#!/usr/bin/env python
"""Cost shape of the out-of-order repair (VERDICT r10 ask #4): the
full `reflag` is one whole-store pass (measured linear in stored docs
— the right COMPLEXITY but the wrong UNIT at 100 TB, where one late
micro-batch should not cost a corpus scan), while
`reflag_incremental` bounds its shuffle/verify work by the late
batch's bucket neighborhood.

Protocol: grow a store to two sizes (40 k / 80 k docs of salted sf0.1
replicas).  At each size, clone the store directory twice, ingest the
SAME late batch into both clones (5 k docs, ids below everything
stored, texts byte-identical to stored batch-0 docs — every group
re-keys, the heavy repair case), then time the full reflag on one
clone and the incremental repair on the other, asserting their
all_flags() are identical.  Expectation: full ~doubles 40 k → 80 k;
incremental stays ~flat (same late batch → same repair work).

Appends one section to docs/SCALING.md (idempotent: rewrites only its
own marker section).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.catalog import load_table  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402
from axonops_schema_registry_spark.streaming.dedup_store import (  # noqa: E402
    BucketedDedupStore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCHES_PER_SIZE = 8
MARKER = ("\n## r11 appendix: incremental vs full reflag "
          "(cost ∝ batch, not store)")


def main() -> None:
    spark = get_spark("reflag-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batch_rows = docs0.count()

    def salted(i: int):
        return (docs0
                .withColumn("doc_id", F.col("doc_id")
                            + F.lit(i * 10_000_000))
                .withColumn("text", F.concat(F.col("text"),
                                             F.lit(f" rfsalt{i}"))))

    # the late batch: ids BELOW everything stored, texts byte-identical
    # to stored batch 0 — every fingerprint group re-keys to a new
    # smallest-id representative (the heavy repair case)
    late = (salted(0)
            .withColumn("doc_id", F.col("doc_id") - 1_000_000_000)
            .localCheckpoint(eager=True))
    # a 5x-smaller late batch for the BATCH axis of the cost claim
    # (the store axis alone cannot separate "cost follows the batch"
    # from "cost is just cheaper than the full pass")
    late_small = (late.orderBy("doc_id")
                  .limit(batch_rows // 5)
                  .localCheckpoint(eager=True))

    base_dir = tempfile.mkdtemp(prefix="reflag_smoke_")
    store = BucketedDedupStore(spark, base_dir)
    results = []
    epoch = 0
    try:
        for point in (1, 2):
            for _ in range(BATCHES_PER_SIZE):
                store(salted(epoch).localCheckpoint(eager=True),
                      epoch_id=epoch)
                epoch += 1
            n_stored = epoch * batch_rows
            print(f"store grown to {n_stored:,} docs", flush=True)
            clones = []
            for kind in ("full", "incr"):
                c = tempfile.mkdtemp(prefix=f"reflag_{kind}_")
                shutil.rmtree(c)
                shutil.copytree(base_dir, c)
                clones.append(BucketedDedupStore(spark, c))
            t = {}
            try:
                for s in clones:
                    s(late, epoch_id=epoch)   # same late ingest
                t0 = time.perf_counter()
                clones[0].reflag(below_epoch=epoch + 1)
                t["full"] = time.perf_counter() - t0
                t0 = time.perf_counter()
                clones[1].reflag_incremental([epoch],
                                             below_epoch=epoch + 1)
                t["incr"] = time.perf_counter() - t0
                a = {r.doc_id: (r.is_dup, r.dup_of)
                     for r in clones[0].all_flags().collect()}
                b = {r.doc_id: (r.is_dup, r.dup_of)
                     for r in clones[1].all_flags().collect()}
                assert a == b, "incremental != full reflag"
                print(f"{n_stored:,} docs + {batch_rows:,} late: "
                      f"full={t['full']:.2f}s incr={t['incr']:.2f}s "
                      f"(equal flags over {len(a):,} docs)", flush=True)
                results.append((n_stored, batch_rows,
                                t["full"], t["incr"]))
            finally:
                for s in clones:
                    shutil.rmtree(s.store_dir, ignore_errors=True)
            # BATCH axis at this store size: same store, 5x-smaller
            # late batch through the incremental path only
            c = tempfile.mkdtemp(prefix="reflag_small_")
            shutil.rmtree(c)
            shutil.copytree(base_dir, c)
            small = BucketedDedupStore(spark, c)
            try:
                small(late_small, epoch_id=epoch)
                t0 = time.perf_counter()
                small.reflag_incremental([epoch],
                                         below_epoch=epoch + 1)
                t_small = time.perf_counter() - t0
                print(f"{n_stored:,} docs + "
                      f"{batch_rows // 5:,} late (small): "
                      f"incr={t_small:.2f}s", flush=True)
                results.append((n_stored, batch_rows // 5,
                                None, t_small))
            finally:
                shutil.rmtree(c, ignore_errors=True)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        "Same late batch (5 k docs, smaller ids, byte-identical to a "
        "stored batch — every touched group re-keys) repaired at two "
        "store sizes; flags asserted identical between the two paths "
        "at both sizes.  The full pass re-derives first-wins over the "
        "whole store (cost follows the store); the incremental path's "
        "candidate join broadcasts the late reps' buckets against the "
        "stored table and verifies only the collision neighborhood "
        "(cost follows the batch).  The '—' rows measure the BATCH "
        "axis: the same store repaired for a 5x-smaller late batch "
        "through the incremental path — shuffle/verify work shrinks "
        "with the batch on top of the fixed store-scan floor.",
        "",
        "| store docs | late batch | full reflag s | incremental s | "
        "incr/full |",
        "|---|---|---|---|---|",
    ]
    for n, nb, tf, ti in results:
        tf_s = f"{tf:.2f}" if tf is not None else "—"
        ratio = f"{ti / tf:.2f}x" if tf is not None else "—"
        lines.append(f"| {n:,} | {nb:,} | {tf_s} | {ti:.2f} | "
                     f"{ratio} |")
    fullrows = [r for r in results if r[2] is not None]
    if len(fullrows) == 2:
        (n1, _, tf1, ti1), (n2, _, tf2, ti2) = fullrows
        lines += [
            "",
            f"Store doubled {n1:,} → {n2:,}: full reflag "
            f"{tf2 / tf1:.2f}x (a whole-store candidate+verify pass); "
            f"incremental {ti2 / ti1:.2f}x — its residual growth is "
            "the stored-table SCAN feeding the broadcast join (linear "
            "but cheap, and partition-prunable on (band, key) at "
            "scale), while the shuffle + Jaccard-verify work follows "
            "the batch; the gap to the full pass widens with the "
            f"store ({ti1 / tf1:.2f}x → {ti2 / tf2:.2f}x).",
        ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SCALING.md")
    with open(path) as fh:
        content = fh.read()
    if MARKER in content:
        head, _, rest = content.partition(MARKER)
        nxt = rest.find("\n## ")
        content = head + (rest[nxt:] if nxt >= 0 else "")
    with open(path, "w") as fh:
        fh.write(content.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("appended to docs/SCALING.md")


if __name__ == "__main__":
    main()
