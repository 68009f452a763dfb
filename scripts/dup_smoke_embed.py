#!/usr/bin/env python
"""Embedding-store dup-heavy smoke (VERDICT r9 ask #7): the text
store's hot-bucket measurement (`dup_smoke.py`), replayed for
``EmbeddingDedupStore``.

Three sf0.1-scale corpora over the embeddings table (2,000 × dim 64),
each ingested as one batch into a FRESH store:

1. DISTINCT — the table as-is (baseline).
2. 90% BYTE-IDENTICAL — 90% of vectors replaced by ONE fixed vector.
   The store fingerprints (sha-256 of the JSON vector) and collapses
   exact groups BEFORE bucketing, so the 1.8k-copy group costs one
   representative — this row measures that guard's payoff.
3. 90% NEAR-IDENTICAL — the fixed vector plus a per-id 1e-9
   perturbation of coordinate 0: distinct fingerprints (collapse
   cannot help), cosine ≈ 1, and the perturbation is far too small to
   flip any hyperplane sign — every hot vector collides in every
   (table, bucket).  Run UNCAPPED (the quadratic candidate set,
   executed for real at this scale) and with ``max_bucket=8`` (the
   rank cap), with planted-dup recall for the capped run.

Acceptance: byte-identical within 2x of distinct; capped near-dup
within 2x of distinct; capped recall >= 0.99.  Appends one section to
docs/SCALING.md (own marker, idempotent rewrite of its own section).
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
    EmbeddingDedupStore,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
MARKER = ("\n## Embedding store, dup-heavy corpora: "
          "the hot-bucket guards, measured (sf0.1)")
DIM = 64


def main() -> None:
    spark = get_spark("axonops-dup-smoke-embed")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, SF_DIR, "embeddings") \
        .select("vec_id", "embedding")

    # one fixed dim-64 vector (values spread so no coordinate is 0)
    fixed = [1.0 + ((i * 37) % 13) / 13.0 for i in range(DIM)]
    fixed_lit = F.array(*[F.lit(float(v)) for v in fixed])
    is_hot = (F.col("vec_id") % 10) != 0  # deterministic 90%
    byte_dup = vecs.withColumn(
        "embedding", F.when(is_hot, fixed_lit)
        .otherwise(F.col("embedding")))
    # near-identical: perturb coordinate 0 by vec_id * 1e-9 — distinct
    # JSON fingerprints, cosine ~ 1, no hyperplane sign can flip
    perturbed = F.concat(
        F.array(F.lit(fixed[0])
                + F.col("vec_id").cast("double") * F.lit(1e-9)),
        F.slice(fixed_lit, 2, DIM - 1))
    near_dup = vecs.withColumn(
        "embedding", F.when(is_hot, perturbed)
        .otherwise(F.col("embedding")))
    corpora = {"distinct": vecs, "byte_dup": byte_dup,
               "near_dup": near_dup}
    for c in corpora.values():
        c.cache().count()

    def timed_ingest(corpus, runs=N_RUNS, **kw) -> float:
        best = float("inf")
        for _ in range(runs):
            d = tempfile.mkdtemp(prefix="embed_smoke_")
            try:
                store = EmbeddingDedupStore(spark, d, dim=DIM, **kw)
                t0 = time.perf_counter()
                store(corpus, epoch_id=0)
                best = min(best, time.perf_counter() - t0)
            finally:
                shutil.rmtree(d, ignore_errors=True)
        return best

    t_distinct = timed_ingest(vecs)
    t_byte = timed_ingest(byte_dup)
    t_near_uncap = timed_ingest(near_dup, runs=1)  # the quadratic run
    t_near_cap = timed_ingest(near_dup, max_bucket=8)

    # capped recall on the planted near-dups (fresh store, kept)
    d = tempfile.mkdtemp(prefix="embed_smoke_recall_")
    try:
        store = EmbeddingDedupStore(spark, d, dim=DIM, max_bucket=8)
        store(near_dup, epoch_id=0)
        flags = store.all_flags().cache()
        hot_ids = near_dup.filter(is_hot).select("vec_id")
        hot_total = hot_ids.count()
        hot_min = hot_ids.agg(F.min("vec_id")).first()[0]
        hot_flagged = (flags.filter(F.col("is_dup"))
                       .join(hot_ids, "vec_id").count())
        dup_of_ok = (flags.filter(F.col("is_dup"))
                     .filter(F.col("dup_of") == hot_min).count()
                     == hot_flagged)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    recall = hot_flagged / (hot_total - 1)

    # implied uncapped candidate volume: n_tables * C(hot, 2) (every
    # hot vector collides in every table), deduped to C(hot, 2)
    implied = (hot_total - 1) * hot_total // 2

    r_byte = t_byte / t_distinct
    r_cap = t_near_cap / t_distinct
    lines = [
        "",
        MARKER.strip(),
        "",
        f"90% of the sf0.1 embeddings table ({hot_total:,} of 2,000 "
        "vectors) replaced by one fixed vector (byte-identical) or "
        "its 1e-9-perturbed variant (near-identical, distinct "
        f"fingerprints), min of {N_RUNS} single-batch ingests into a "
        "fresh `EmbeddingDedupStore` (threshold 0.9, 8-bit "
        "hyperplane buckets, 4 tables).",
        "",
        "| corpus | guard | ingest s | vs distinct |",
        "|---|---|---|---|",
        f"| distinct | fingerprint collapse (always on) | "
        f"{t_distinct:.2f} | 1.00 |",
        f"| 90% byte-identical | fingerprint collapse | {t_byte:.2f} "
        f"| {r_byte:.2f} |",
        f"| 90% near-identical | UNCAPPED ({implied:,} candidate "
        f"pairs executed) | {t_near_uncap:.2f} | "
        f"{t_near_uncap / t_distinct:.2f} |",
        f"| 90% near-identical | max_bucket=8 | {t_near_cap:.2f} | "
        f"{r_cap:.2f} |",
        "",
        f"The cap's recall trade at this density, measured: "
        f"planted-near-dup recall {recall:.4f} "
        f"({hot_flagged}/{hot_total - 1}), every flagged vector "
        f"pointing at the true first-wins original "
        f"({'yes' if dup_of_ok else 'NO'}) — same mechanism as the "
        "text store: first-wins keeps smallest ids, exactly the ranks "
        "the rank cap preserves.",
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
    print("\n".join(lines))
    ok = r_byte < 2 and r_cap < 2 and recall >= 0.99
    print(f"\nacceptance (guarded dup-heavy within 2x of distinct, "
          f"capped recall >= 0.99): {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
