#!/usr/bin/env python
"""Explains (and fixes) the one super-linear row in the r10 sf1
rehearsal: `dd6_embedding_cosine_dedup` ran 11.9x for 10x vectors.

That is hyperplane-LSH arithmetic, not a plan bug: with n_bits FIXED
a bucket holds ~n/2^b vectors and the (table, bucket) self-join emits
Σ bucket² ≈ n²/2^b candidates per table — quadratic in n.  The scale
posture is occupancy-targeted bits, b = ceil(log2(n / target)), which
pins candidates at ~n × target (linear); recall at a given threshold
is then held by raising n_tables (standard AND/OR construction).

This smoke synthesizes the rehearsal's 10x embeddings corpus (rolled
copies, offset ids — cross-copy cosine ~1 pairs don't exist) and
times `lsh_cosine_pairs_portable` three ways:

  1x  corpus, n_bits=5                 (the dd6 spec literal)
  10x corpus, n_bits=5                 (the rehearsal's 11.9x row)
  10x corpus, n_bits=recommended(10n)  (the documented fix)

Appends the measured table to docs/SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.llm.similarity import (  # noqa: E402
    lsh_cosine_pairs_portable,
    recommended_lsh_bits,
)
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
OFF = 1_000_000_000
DIM = 64
MARKER = "\n### dd6 at 10x: fixed bits vs occupancy-targeted bits"


def replicate(emb):
    copies = []
    for i in range(K):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFF))
        if i > 0:
            c = c.withColumn(
                "embedding",
                F.expr(f"concat(slice(embedding, {i + 1}, {DIM - i}), "
                       f"slice(embedding, 1, {i}))"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def timed(df):
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    spark = get_spark("dd6-bits-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n1 = emb.count()
    big = replicate(emb).repartition(32).localCheckpoint(eager=True)
    n10 = big.count()
    b_rec = recommended_lsh_bits(n10)

    rows = []
    for label, corpus, bits, tables in (
            (f"1x ({n1} vecs), n_bits=5, n_tables=2", emb, 5, 2),
            (f"10x ({n10} vecs), n_bits=5, n_tables=2", big, 5, 2),
            (f"10x ({n10} vecs), n_bits={b_rec} (recommended), "
             "n_tables=2", big, b_rec, 2),
            (f"10x ({n10} vecs), n_bits={b_rec}, n_tables=4 "
             "(recall restored)", big, b_rec, 4)):
        # warm + measure: min of 2
        best, pairs = None, None
        for _ in range(2):
            sec, cnt = timed(lsh_cosine_pairs_portable(
                corpus, "vec_id", "embedding", threshold=0.4,
                n_bits=bits, n_tables=tables))
            best = sec if best is None else min(best, sec)
            pairs = cnt
        rows.append((label, best, pairs))
        print(f"{label}: {best:.2f} s, {pairs} pairs", flush=True)

    base = rows[0][1]
    lines = [MARKER, "",
             "The rehearsal's one super-linear row is LSH arithmetic, "
             "not a plan bug: fixed n_bits=5 leaves 32 buckets/table, "
             "so candidates grow as n²/2^b.  "
             "`recommended_lsh_bits(n)` (occupancy-targeted, "
             "b = ceil(log2(n/200))) restores linearity; oracle specs "
             "keep the literal 5 (the DuckDB replay must share it), "
             "production callers pass the helper's value.  Wider "
             "buckets trade recall on WEAK pairs (threshold here is "
             "0.4 — near-orthogonal pairs stop colliding; at the "
             "dedup-grade 0.9 threshold per-table collision stays "
             "high), and the standard OR-construction buys it back: "
             "the n_tables=4 row recovers most of the pair set at "
             "still-linear cost.  Measured (rolled 10x corpus, "
             "min-of-2, pairs = verified output rows):", "",
             "| corpus / bits | sec | ratio vs 1x | pairs |",
             "|---|---|---|---|"]
    for label, sec, pairs in rows:
        lines.append(f"| {label} | {sec:.2f} | {sec / base:.1f}x "
                     f"| {pairs} |")
    doc = os.path.join(ROOT, "docs", "SCALING.md")
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
