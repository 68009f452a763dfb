#!/usr/bin/env python
"""Scaling smoke for the r10 DSIR operator
(`llm/sampling.py:dsir_log_weights`): 1x / 4x / 10x of sf0.1 with
word-salted replicas (content-distinct — each copy's features hash to
the same bounded bucket space, so the ratio-table size stays at
n_buckets regardless of corpus size; the corpus-scale work is one
explode + one (id, bucket) map-side-combinable agg, materialized once
via lazy checkpoint and consumed by raw LM, target LM, and scoring).

Appends one section to docs/SCALING.md (idempotent: rewrites its own
marker section only).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.catalog import load_table  # noqa: E402
from axonops_schema_registry_spark.llm.sampling import (  # noqa: E402
    dsir_log_weights,
)
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
MARKER = "\n### dsir1 at 1x / 4x / 10x (word-salted replicas)"


def replicate(df, k: int):
    if k == 1:
        return df
    copies = []
    for i in range(k):
        c = df.withColumn("doc_id",
                          F.col("doc_id") + F.lit(i * 1_000_000_000))
        if i > 0:
            c = c.withColumn(
                "text", F.expr(f"array_join(transform(split(text, ' '), "
                               f"w -> concat(w, '_s{i}')), ' ')"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def run_once(docs) -> float:
    target = docs.filter(F.col("source") == "src0").select("doc_id")
    t0 = time.time()
    (dsir_log_weights(docs, target, n_buckets=4096)
     .orderBy(F.desc("log_weight"), "doc_id").limit(50).count())
    return time.time() - t0


def main() -> None:
    spark = get_spark("dsir-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    run_once(docs0.limit(300))  # codegen warmup

    rows = []
    for k in FACTORS:
        docs = replicate(docs0, k).localCheckpoint(eager=True)
        n = docs.count()
        sec = min(run_once(docs) for _ in range(2))
        rows.append((k, n, sec))
        print(f"{k}x ({n} docs): {sec:.2f} s", flush=True)

    base = rows[0][2]
    lines = [MARKER, "",
             "Per-row cost vs corpus size (ratio normalized per row: "
             "sec / (k·base) — 1.0 = perfectly linear):", "",
             "| factor | docs | sec | per-row ratio |", "|---|---|---|---|"]
    for k, n, sec in rows:
        lines.append(f"| {k}x | {n:,} | {sec:.2f} "
                     f"| {sec / (k * base):.2f}x |")
    doc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SCALING.md")
    with open(doc) as f:
        txt = f.read()
    if MARKER in txt:
        # splice out ONLY this script's section (up to the next
        # heading) — a bare truncate would delete later sections
        head, _, rest = txt.partition(MARKER)
        nxt = rest.find("\n#")
        txt = head + (rest[nxt:] if nxt >= 0 else "")
    with open(doc, "w") as f:
        f.write(txt.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("appended to docs/SCALING.md", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
