#!/usr/bin/env python
"""Scaling smoke for the r9 additions at 1x/4x/10x of sf0.1:

- bpe2 (10-round BPE trainer): per-round work is VOCABULARY-bounded —
  only the initial word count touches corpus-sized data — so total
  time grows sublinearly in corpus rows (ratio well under 1.0).
- es1 (exact-substring span islands): salted replicas share every
  INTERIOR 8-gram across copies, so at k copies every position is
  duplicated — the worst-case dup density.  Work must stay linear
  (gram counts, duplicated-position join, and island windows all
  scale with rows, never with pairs).

Appends one section to docs/SCALING.md (idempotent: rewrites its own
marker section only; run after scale_smoke.py, which owns the head).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.catalog import load_table  # noqa: E402
from axonops_schema_registry_spark.llm.text import bpe_merges  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
MARKER = "\n## r9 appendix: multi-round BPE trainer at 1x / 4x / 10x"


def replicate_salted_docs(df, k: int):
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


def main() -> None:
    from axonops_schema_registry_spark.llm.dedup import (
        duplicated_span_islands,
    )

    spark = get_spark("scale-smoke-r9")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    bpe_merges(docs0.limit(300), "text", k=3).collect()  # codegen warmup
    duplicated_span_islands(docs0.limit(300)).count()

    def timed(thunk) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            thunk().collect()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for k in FACTORS:
        docs = replicate_salted_docs(docs0, k)
        n = docs.count()
        t = timed(lambda d=docs: bpe_merges(d, "text", k=10))
        t_es = timed(lambda d=docs: duplicated_span_islands(d))
        rows.append((k, n, t, t_es))
        print(f"k={k}: docs={n:,} bpe2={t:.2f}s es1={t_es:.2f}s",
              flush=True)

    base = rows[0]
    lines = [
        "",
        MARKER.strip(),
        "",
        "Salted replicas; `bpe_merges(k=10)` — one corpus-sized word "
        "count, then 10 vocabulary-bounded rounds (pair count, "
        "one-row driver fetch, narrow replace projection); ratio "
        "expected well under 1.0 since only round zero sees "
        "corpus-sized data.  `duplicated_span_islands` (es1) — at k "
        "copies every interior 8-gram is shared across copies, so "
        "EVERY position is duplicated (worst-case dup density); work "
        "is per-row, never per-pair, so the ratio must hold ~1.0.  "
        "Ratio ≤ 1.0 = at-or-better than linear in rows.",
        "",
        "| factor | document rows | bpe2 s | bpe2 ratio | es1 s | "
        "es1 ratio |",
        "|---|---|---|---|---|---|",
    ]
    for k, n, t, t_es in rows:
        rr = n / base[1]
        lines.append(f"| {k}x | {n:,} | {t:.2f} | "
                     f"{t / base[2] / rr:.2f} | {t_es:.2f} | "
                     f"{t_es / base[3] / rr:.2f} |")
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
    rr10 = rows[-1][1] / base[1]
    ok = (rows[-1][2] / base[2] / rr10 <= 1.0
          and rows[-1][3] / base[3] / rr10 <= 1.2)
    print(f"acceptance (10x ratios: bpe2 <= 1.0, es1 <= 1.2): "
          f"{'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
