#!/usr/bin/env python
"""Scaling smoke for the r10 composition capstone (cur2: span cut →
DSIR select → shard manifest) at 1x / 4x / 10x of sf0.1.

Replicas are word-salted (content-distinct in shingle space — the
engine-linearity regime, same as the sf1 rehearsal; the cut's
worst-case dup density is measured separately by es2_smoke.py).  The
chain runs the production forms: hash_grams cut, broadcast DSIR ratio
table, TakeOrdered select, scan-side shard hashing.

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
from axonops_schema_registry_spark.llm.dedup import (  # noqa: E402
    remove_duplicated_spans,
)
from axonops_schema_registry_spark.llm.export import (  # noqa: E402
    shard_manifest,
)
from axonops_schema_registry_spark.llm.sampling import (  # noqa: E402
    dsir_log_weights,
)
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
MARKER = "\n### cur2 composition (cut -> select -> export) at 1x / 4x / 10x"


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
    t0 = time.time()
    cleaned = (remove_duplicated_spans(docs, "doc_id", "text", k=8,
                                       min_count=2, hash_grams=True)
               .select(F.col("id").alias("doc_id"), "cleaned_text")
               .join(docs.select("doc_id", "source"), "doc_id"))
    target = (cleaned.filter(F.col("source") == "src0")
              .select("doc_id"))
    top = (dsir_log_weights(cleaned, target, id_col="doc_id",
                            text_col="cleaned_text", n_buckets=4096)
           .orderBy(F.desc("log_weight"), "doc_id").limit(100)
           .select("doc_id"))
    (shard_manifest(cleaned.join(F.broadcast(top), "doc_id"),
                    n_shards=8, id_col="doc_id",
                    text_col="cleaned_text").count())
    return time.time() - t0


def main() -> None:
    spark = get_spark("cur2-smoke")
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
             "Word-salted replicas (engine-linearity regime).  Per-row "
             "ratio = sec / (k·base); 1.0 = linear:", "",
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
