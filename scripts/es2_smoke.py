#!/usr/bin/env python
"""Scaling smoke for the r10 es2 cut step
(`llm/dedup.py:remove_duplicated_spans`): 1x / 4x / 10x of sf0.1
under the same worst-case dup density as the es1 rows (suffix-salted
replicas: every interior 8-gram duplicated across copies — the cut
then touches nearly every document).  The islands subgraph is es1's;
the increment this measures is the doc-keyed span-array shuffle plus
the row-local keep/drop scan.  Runs the 100 TB form (hash_grams=True,
8-byte shuffle keys); output equality with the raw path is pinned in
pytest.

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
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
MARKER = "\n### es2 span removal at 1x / 4x / 10x (worst-case dup density)"


def replicate_salted(df, k: int):
    if k == 1:
        return df
    copies = [df.withColumn("doc_id",
                            F.col("doc_id") + F.lit(i * 1_000_000_000))
              .withColumn("text", F.concat(F.col("text"),
                                           F.lit(f" copysalt{i}")))
              for i in range(k)]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def run_once(docs) -> tuple[float, int]:
    t0 = time.time()
    removed = (remove_duplicated_spans(docs, "doc_id", "text", k=8,
                                       min_count=2, hash_grams=True)
               .agg(F.sum("n_removed")).first()[0])
    return time.time() - t0, int(removed or 0)


def main() -> None:
    spark = get_spark("es2-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    run_once(docs0.limit(300))  # codegen warmup

    rows = []
    for k in FACTORS:
        docs = replicate_salted(docs0, k).localCheckpoint(eager=True)
        n = docs.count()
        best, removed = None, 0
        for _ in range(2):
            sec, removed = run_once(docs)
            best = sec if best is None else min(best, sec)
        rows.append((k, n, best, removed))
        print(f"{k}x ({n} docs): {best:.2f} s, {removed:,} words cut",
              flush=True)

    base = rows[0][2]
    lines = [MARKER, "",
             "Suffix-salted replicas (every interior 8-gram duplicated "
             "across copies — at 10x virtually every word position is "
             "covered, the worst case for the cut).  Per-row ratio = "
             "sec / (k·base); 1.0 = linear:", "",
             "| factor | docs | sec | words cut | per-row ratio |",
             "|---|---|---|---|---|"]
    for k, n, sec, removed in rows:
        lines.append(f"| {k}x | {n:,} | {sec:.2f} | {removed:,} "
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
