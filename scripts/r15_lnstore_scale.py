#!/usr/bin/env python
"""LineDedupStore cost shape (the store-family SCALING convention,
applied to the new block-keyed line-dedup store):

1. per-batch ingest cost as the store grows — K equal content-distinct
   batches; flat per-batch time = the batch only segments ITSELF and
   joins its block keys against the stored election table (a
   linearly-growing per-batch time would mean the corpus re-segments
   every epoch);
2. repair cost vs late-batch size at a FIXED store — out-of-order
   batches of two sizes repaired against the same store; repair time
   must follow the late batch's key set (victims are found on the
   elections table, only affected docs re-clean), not the store.

Appends both tables to docs/SCALING.md.
Usage: python scripts/r15_lnstore_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.session import get_spark  # noqa: E402
from axonops_schema_registry_spark.streaming.dedup_store import (  # noqa: E402
    LineDedupStore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 6
MARKER = "\n## r15 appendix: LineDedupStore per-batch + repair cost shape"


def _salted(docs, i: int):
    """Content-distinct batch i: shifted ids, per-batch word salt —
    constant true-dup density (the replica protocol)."""
    d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
    if i > 0:
        d = d.withColumn("text", F.expr(
            f"array_join(transform(split(text, ' '), "
            f"w -> concat(w, '_s{i}')), ' ')"))
    return d


def main() -> int:
    spark = get_spark("r15-lnstore-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text"))
    n = docs.count()

    lines = [MARKER, "",
             f"Per-batch ingest: {N_BATCHES} equal content-distinct "
             f"batches of {n:,} docs each through `LineDedupStore` "
             "(sf0.1).  Flat per-batch time = the batch segments only "
             "itself and joins block keys against the stored election "
             "table; growth would mean the corpus re-segments per epoch.",
             "",
             "| batch | store docs after | batch s | vs batch-2 |",
             "|---|---|---|---|"]
    d = tempfile.mkdtemp(prefix="lnstore_scale_")
    try:
        store = LineDedupStore(spark, os.path.join(d, "s1"))
        times = []
        for i in range(N_BATCHES):
            b = _salted(docs, i).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            store.process_batch(b, i)
            times.append(time.perf_counter() - t0)
            print(f"batch {i + 1}: {times[-1]:.2f}s", flush=True)
        for i, t in enumerate(times):
            lines.append(f"| {i + 1} | {(i + 1) * n:,} | {t:.2f} "
                         f"| {t / times[1]:.2f}x |")

        # repair cost vs late-batch size at a fixed store: rebuild the
        # same store twice (batches i=1.. so every stored id sits at
        # >= 1e7), append a late batch whose texts COPY batch 1's
        # content but whose ids are the small originals — every late
        # block steals its election, the worst case — at two sizes,
        # time repair()
        lines += ["",
                  "Repair vs late-batch size (fixed "
                  f"{N_BATCHES}×{n:,}-doc store; late batch texts copy "
                  "batch 1's content with SMALLER ids, so every late "
                  "block steals its election — the worst case):",
                  "",
                  "| late docs | repaired docs | repair s |",
                  "|---|---|---|"]
        for frac, tag in ((0.05, "small"), (0.5, "big")):
            sd = os.path.join(d, f"r_{tag}")
            st = LineDedupStore(spark, sd)
            for i in range(N_BATCHES):
                st.process_batch(_salted(docs, i + 1), i)
            late_n = int(n * frac)
            late = _salted(docs.orderBy("doc_id").limit(late_n), 1) \
                .withColumn("doc_id", F.col("doc_id") - F.lit(10_000_000))
            st.process_batch(late, N_BATCHES)
            t0 = time.perf_counter()
            repaired = st.repair()
            dt = time.perf_counter() - t0
            print(f"late {late_n}: repaired {repaired} in {dt:.2f}s",
                  flush=True)
            lines.append(f"| {late_n:,} | {repaired:,} | {dt:.2f} |")
        lines.append("")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SCALING.md")
        text = open(path).read()
        if MARKER in text:
            text = text[:text.index(MARKER)]
        with open(path, "w") as fh:
            fh.write(text + "\n".join(lines) + "\n")
        print("appended to docs/SCALING.md", flush=True)
        return 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
