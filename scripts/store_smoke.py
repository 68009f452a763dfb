#!/usr/bin/env python
"""Per-batch cost of the persistent bucketed dedup store as the corpus
grows: ingest K equal batches and time each.

The claim under test is the production contract of
``streaming.dedup_store.BucketedDedupStore``: per-batch cost is bounded
by the NEW batch's signatures plus its bucket collisions — NOT by
corpus size — because earlier documents are only touched through the
stored bucket/token tables, pruned by the bucket equi-join.  A
per-batch time that grows linearly with the store would falsify it.

Appends the results table to docs/SCALING.md.
Usage: python scripts/store_smoke.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.session import get_spark
from axonops_schema_registry_spark.streaming.dedup_store import (
    BucketedDedupStore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 8


def main() -> None:
    spark = get_spark("store-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # batches are content-distinct salted replicas of the corpus, so
    # cross-batch true-dup volume stays ~zero and measured growth can
    # only come from the store mechanism itself
    batches = [
        docs0.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
             .withColumn("text", F.concat(F.col("text"),
                                          F.lit(f" storesalt{i}")))
             .localCheckpoint(eager=True)
        for i in range(N_BATCHES)
    ]

    store_dir = tempfile.mkdtemp(prefix="store_smoke_")
    sink = BucketedDedupStore(spark, store_dir)
    rows = []
    try:
        for i, b in enumerate(batches):
            t0 = time.perf_counter()
            sink(b, epoch_id=i)
            dt = time.perf_counter() - t0
            rows.append((i + 1, (i + 1) * b.count(), dt))
            print(f"batch {i + 1}: corpus={rows[-1][1]:,} "
                  f"t={dt:.2f}s", flush=True)
        # the two maintenance jobs, timed at TWO store sizes (the
        # second point pins reflag's linear-in-store expectation —
        # it is one batch-operator-shaped pass over the WHOLE store,
        # amortized across many batches, never a per-batch cost):
        # reflag (global first-wins repair) and compact (fold epochs
        # into a base generation)
        size_1 = rows[-1][1]
        t0 = time.perf_counter()
        sink.reflag(below_epoch=N_BATCHES)
        t_reflag = time.perf_counter() - t0
        sink(batches[0].withColumn(
            "doc_id", F.col("doc_id") + 900_000_000),
            epoch_id=N_BATCHES)  # store stays usable post-reflag
        t0 = time.perf_counter()
        sink.compact(below_epoch=N_BATCHES + 1)
        t_compact = time.perf_counter() - t0
        print(f"reflag({size_1:,} docs)={t_reflag:.2f}s "
              f"compact={t_compact:.2f}s", flush=True)
        # double the store (fresh salts; the post-reflag probe batch
        # counts too) and reflag again — the second size point
        extra = [
            docs0.withColumn("doc_id", F.col("doc_id")
                             + F.lit((100 + i) * 10_000_000))
                 .withColumn("text", F.concat(F.col("text"),
                                              F.lit(f" storesaltB{i}")))
                 .localCheckpoint(eager=True)
            for i in range(N_BATCHES - 1)
        ]
        for i, b in enumerate(extra):
            sink(b, epoch_id=N_BATCHES + 1 + i)
        size_2 = size_1 * 2
        t0 = time.perf_counter()
        sink.reflag(below_epoch=2 * N_BATCHES)
        t_reflag2 = time.perf_counter() - t0
        print(f"reflag({size_2:,} docs)={t_reflag2:.2f}s", flush=True)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)

    first = rows[0][2]
    lines = [
        "",
        "## Bucketed dedup store: per-batch cost vs corpus size (sf0.1)",
        "",
        f"{N_BATCHES} equal content-distinct batches ingested through "
        "`BucketedDedupStore`; per-batch time must stay ~flat as the "
        "store grows (the batch only signs its own documents and joins "
        "its bucket keys against the stored table).  Linear growth "
        "would mean the corpus is being rescanned.",
        "",
        "| batch | corpus docs after | batch s | vs batch-1 |",
        "|---|---|---|---|",
    ]
    for i, n, dt in rows:
        lines.append(f"| {i} | {n:,} | {dt:.2f} | {dt / first:.2f}x |")
    lines += [
        "",
        f"Maintenance, two store sizes: `reflag` (global first-wins "
        f"repair after out-of-order ingestion — one "
        f"batch-operator-shaped pass over the whole store, committed "
        f"as a new base generation) = **{t_reflag:.2f} s** at "
        f"{size_1:,} docs and **{t_reflag2:.2f} s** at {size_2:,} "
        f"docs ({t_reflag2 / t_reflag:.2f}x for 2x the store — "
        "linear-in-store, as a full-store pass must be; amortize it "
        "across many batches).  `compact` (fold live epochs into the "
        f"base) = **{t_compact:.2f} s**.  Both are occasional jobs, "
        "not per-batch costs.",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SCALING.md")
    marker = "\n## Bucketed dedup store: per-batch cost vs corpus size"
    with open(path) as f:
        content = f.read()
    if marker in content:
        # idempotent: rewrite this script's own section only
        head, _, rest = content.partition(marker)
        nxt = rest.find("\n## ")
        content = head + (rest[nxt:] if nxt >= 0 else "")
    with open(path, "w") as f:
        f.write(content.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("appended to docs/SCALING.md")


if __name__ == "__main__":
    main()
