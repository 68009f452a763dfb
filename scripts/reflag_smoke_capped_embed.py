#!/usr/bin/env python
"""CAPPED embedding-store repair cost (r12): the max_bucket twin of
scripts/reflag_smoke_capped.py on `EmbeddingDedupStore` — capped
incremental vs capped full reflag at two store sizes.  Same protocol — grow a store (rolled content-distinct
replicas of the sf0.1 embeddings), clone at each size, ingest the
same late batch (byte-identical vectors with smaller ids → every
touched group re-keys) into both clones, time full vs incremental,
assert identical flags.

Appends one section to docs/SCALING.md (idempotent marker splice).
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
BATCHES_PER_SIZE = 8
DIM = 64
MARKER = ("\n## r12 appendix: capped embedding-store incremental vs "
          "full reflag")


MAX_BUCKET = 8


def main() -> None:
    spark = get_spark("reflag-smoke-embed-capped")
    spark.sparkContext.setLogLevel("ERROR")
    vecs0 = load_table(spark, SF_DIR, "embeddings") \
        .select("vec_id", "embedding")
    batch_rows = vecs0.count()

    def rolled(i: int):
        """Key-offset replica; rolled vectors for i > 0 so cross-copy
        cosine ~1 pairs don't exist (the sf1-rehearsal pattern)."""
        c = vecs0.withColumn("vec_id",
                             F.col("vec_id") + F.lit(i * 10_000_000))
        if i % DIM:
            r = i % DIM
            c = c.withColumn(
                "embedding",
                F.expr(f"concat(slice(embedding, {r + 1}, {DIM - r}), "
                       f"slice(embedding, 1, {r}))"))
        return c

    late = (rolled(0)
            .withColumn("vec_id", F.col("vec_id") - 1_000_000_000)
            .localCheckpoint(eager=True))

    base_dir = tempfile.mkdtemp(prefix="ereflag_cap_")
    store = EmbeddingDedupStore(spark, base_dir, dim=DIM,
                                max_bucket=MAX_BUCKET)
    results = []
    epoch = 0
    try:
        for _point in (1, 2):
            for _ in range(BATCHES_PER_SIZE):
                store(rolled(epoch).localCheckpoint(eager=True),
                      epoch_id=epoch)
                epoch += 1
            n_stored = epoch * batch_rows
            print(f"store grown to {n_stored:,} vectors", flush=True)
            clones = []
            for kind in ("full", "incr"):
                c = tempfile.mkdtemp(prefix=f"ereflag_cap_{kind}_")
                shutil.rmtree(c)
                shutil.copytree(base_dir, c)
                clones.append(EmbeddingDedupStore(
                    spark, c, dim=DIM, max_bucket=MAX_BUCKET))
            t = {}
            try:
                for s in clones:
                    s(late, epoch_id=epoch)
                t0 = time.perf_counter()
                clones[0].reflag(below_epoch=epoch + 1)
                t["full"] = time.perf_counter() - t0
                t0 = time.perf_counter()
                clones[1].reflag_incremental(below_epoch=epoch + 1)
                t["incr"] = time.perf_counter() - t0
                a = {r.vec_id: (r.is_dup, r.dup_of)
                     for r in clones[0].all_flags().collect()}
                b = {r.vec_id: (r.is_dup, r.dup_of)
                     for r in clones[1].all_flags().collect()}
                assert a == b, "capped incremental != capped full reflag"
                print(f"{n_stored:,} vectors + {batch_rows:,} late: "
                      f"full={t['full']:.2f}s incr={t['incr']:.2f}s "
                      f"(equal flags over {len(a):,})", flush=True)
                results.append((n_stored, batch_rows,
                                t["full"], t["incr"]))
            finally:
                for s in clones:
                    shutil.rmtree(s.store_dir, ignore_errors=True)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        f"max_bucket={MAX_BUCKET} stores, embedding twin of the capped "
        "text-store table above (late batch of byte-identical vectors "
        "with smaller ids; flags asserted identical to the capped "
        "full reflag at both sizes): the capped incremental adds the "
        "old-vs-new (table, bucket) ranking windows over the touched "
        "buckets' rows and the eviction-driven exact recompute.",
        "",
        "| store vectors | late batch | full reflag s | incremental s "
        "| incr/full |",
        "|---|---|---|---|---|",
    ]
    for n, nb, tf, ti in results:
        lines.append(f"| {n:,} | {nb:,} | {tf:.2f} | {ti:.2f} | "
                     f"{ti / tf:.2f}x |")
    if len(results) == 2:
        (n1, _, tf1, ti1), (n2, _, tf2, ti2) = results
        lines += [
            "",
            f"Store doubled {n1:,} → {n2:,}: full {tf2 / tf1:.2f}x, "
            f"incremental {ti2 / ti1:.2f}x "
            f"({ti1 / tf1:.2f}x → {ti2 / tf2:.2f}x of the full pass).",
            "",
            "Honest read: at this toy scale the capped incremental is "
            "barely ahead — the default 8 LSH bits give only 256 "
            "buckets per table, so a 2,000-rep late batch touches "
            "essentially EVERY bucket and the \"touched neighborhood\" "
            "the ranking windows scan is the whole store by "
            "construction.  The bound that matters is "
            "proportionality: touched buckets ∝ late reps × tables, "
            "independent of store size — on an occupancy-targeted "
            "store (expected_corpus sizing, the production default) "
            "bucket count grows with the corpus, a same-sized late "
            "batch touches a vanishing fraction of them, and the "
            "window/recompute work follows the batch exactly as the "
            "text-store table shows (its 16-band key space is already "
            "sparse at this scale: 0.56x → 0.46x).",
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
