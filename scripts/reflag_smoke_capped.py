#!/usr/bin/env python
"""Cost shape of the RANK-CAP-AWARE incremental repair (VERDICT r11
ask #2's measurement half): the two production features — the
max_bucket hot-bucket guard and the bounded out-of-order repair — now
compose, so this re-runs the reflag_smoke protocol on max_bucket=8
stores: grow to two sizes, clone, ingest the same late batch (ids
below everything stored, texts byte-identical to stored batch-0 docs —
every touched group re-keys, and the re-keyed reps shift their
buckets' rankings, the exact surface the cap couples verdicts to),
then time capped-full-reflag vs capped-incremental and assert their
all_flags() identical.

Appends one section to docs/SCALING.md (idempotent marker splice).
"""

from __future__ import annotations

import os
import random
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
MAX_BUCKET = 8
MARKER = ("\n## r12 appendix: capped (max_bucket) incremental vs full "
          "reflag")


_SKEW_BASE = [f"tok{j}" for j in range(40)]


def _hot(tag: str) -> str:
    ws = list(_SKEW_BASE)
    ws[20] = tag
    return " ".join(ws)


def skew_scenario(spark, seed: int = 13,
                  n_batches: int = 8, batch: int = 5_000,
                  hot_per_batch: int = 100,
                  late_hot: int = 500):
    """VERDICT r12 ask #6: the r12 equality pins used small planted
    fixtures (K=1/K=2); this runs ONE seeded-random capped-store
    scenario at the reflag-smoke scale — 40k docs, max_bucket=8, a
    5k late batch of which 500 docs are hot-family twins with
    smaller ids (every one re-keys the hot buckets' rankings) —
    asserting capped incremental ≡ capped full flags AND reporting
    the eviction superset's size against the touched rows (the
    over-inclusion the dedup_store docstring bounds by argument;
    this measures it)."""
    rng = random.Random(seed)

    def batch_df(e: int):
        rows = []
        for j in range(batch):
            did = e * 10_000_000 + j
            if j < hot_per_batch:  # hot near-dup family, one bucket
                rows.append((did, _hot(f"h{e}_{j}_{rng.randrange(9)}")))
            else:
                rows.append((did, " ".join(
                    f"b{e}d{j}x{t}" for t in range(40))))
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    late_rows = []
    for j in range(batch):
        did = j - 1_000_000_000
        if j < late_hot:  # the late wave lands IN the hot bucket
            late_rows.append((did, _hot(f"L{j}_{rng.randrange(9)}")))
        else:
            late_rows.append((did, " ".join(
                f"Ld{j}x{t}" for t in range(40))))
    late = spark.createDataFrame(late_rows,
                                 "doc_id bigint, text string")

    base_dir = tempfile.mkdtemp(prefix="reflag_skew_")
    store = BucketedDedupStore(spark, base_dir, max_bucket=MAX_BUCKET)
    try:
        for e in range(n_batches):
            store(batch_df(e).localCheckpoint(eager=True), epoch_id=e)
        clones = []
        for kind in ("full", "incr"):
            c = tempfile.mkdtemp(prefix=f"rfskew_{kind}_")
            shutil.rmtree(c)
            shutil.copytree(base_dir, c)
            clones.append(BucketedDedupStore(
                spark, c, max_bucket=MAX_BUCKET))
        try:
            for s in clones:
                s(late, epoch_id=n_batches)
            t0 = time.perf_counter()
            clones[0].reflag(below_epoch=n_batches + 1)
            t_full = time.perf_counter() - t0
            stats: dict = {}
            t0 = time.perf_counter()
            clones[1].reflag_incremental(below_epoch=n_batches + 1,
                                         stats=stats)
            t_incr = time.perf_counter() - t0
            a = {r.doc_id: (r.is_dup, r.dup_of)
                 for r in clones[0].all_flags().collect()}
            b = {r.doc_id: (r.is_dup, r.dup_of)
                 for r in clones[1].all_flags().collect()}
            assert a == b, ("SKEW scenario: capped incremental != "
                            "capped full reflag")
            n_docs = (n_batches + 1) * batch
            assert len(a) == n_docs
            # the over-inclusion bound, asserted not just reported:
            # the eviction superset must stay within the touched
            # buckets' rows — by construction it can never exceed
            # them, and on this hot-bucket wave it should be a small
            # fraction (each bucket evicts at most its old top-k)
            assert stats["evicted"] <= stats["touched_rows"], stats
            print(f"SKEW 40k+5k late (hot {late_hot}): "
                  f"full={t_full:.2f}s incr={t_incr:.2f}s "
                  f"touched={stats['touched_rows']:,} "
                  f"evicted={stats['evicted']:,} "
                  f"replaced={stats['replaced_reps']:,} "
                  f"(equal flags over {len(a):,} docs)", flush=True)
            return (n_docs - batch, batch, t_full, t_incr, stats)
        finally:
            for s in clones:
                shutil.rmtree(s.store_dir, ignore_errors=True)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


def main() -> None:
    spark = get_spark("reflag-smoke-capped")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batch_rows = docs0.count()

    def salted(i: int):
        return (docs0
                .withColumn("doc_id", F.col("doc_id")
                            + F.lit(i * 10_000_000))
                .withColumn("text", F.concat(F.col("text"),
                                             F.lit(f" rfcsalt{i}"))))

    late = (salted(0)
            .withColumn("doc_id", F.col("doc_id") - 1_000_000_000)
            .localCheckpoint(eager=True))

    base_dir = tempfile.mkdtemp(prefix="reflag_cap_")
    store = BucketedDedupStore(spark, base_dir, max_bucket=MAX_BUCKET)
    results = []
    epoch = 0
    try:
        for point in (1, 2):
            for _ in range(BATCHES_PER_SIZE):
                store(salted(epoch).localCheckpoint(eager=True),
                      epoch_id=epoch)
                epoch += 1
            n_stored = epoch * batch_rows
            print(f"capped store grown to {n_stored:,} docs", flush=True)
            clones = []
            for kind in ("full", "incr"):
                c = tempfile.mkdtemp(prefix=f"rfcap_{kind}_")
                shutil.rmtree(c)
                shutil.copytree(base_dir, c)
                clones.append(BucketedDedupStore(
                    spark, c, max_bucket=MAX_BUCKET))
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
                a = {r.doc_id: (r.is_dup, r.dup_of)
                     for r in clones[0].all_flags().collect()}
                b = {r.doc_id: (r.is_dup, r.dup_of)
                     for r in clones[1].all_flags().collect()}
                assert a == b, "capped incremental != capped full reflag"
                print(f"{n_stored:,} docs + {batch_rows:,} late: "
                      f"full={t['full']:.2f}s incr={t['incr']:.2f}s "
                      f"(equal flags over {len(a):,} docs)", flush=True)
                results.append((n_stored, batch_rows,
                                t["full"], t["incr"]))
            finally:
                for s in clones:
                    shutil.rmtree(s.store_dir, ignore_errors=True)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)

    skew = skew_scenario(spark)

    lines = [
        "",
        MARKER.strip(),
        "",
        f"max_bucket={MAX_BUCKET} stores, same protocol as the r11 "
        "appendix (late batch = batch-0 twins with smaller ids — "
        "every touched group re-keys and shifts its buckets' "
        "rankings).  The capped incremental path adds two bounded "
        "window passes (old-vs-new ranking over the TOUCHED buckets' "
        "rows only) and the eviction-driven exact recompute, on top "
        "of the uncapped repair's broadcast candidate join; flags "
        "asserted identical to the capped full reflag at both sizes.",
        "",
        "| store docs | late batch | capped full s | capped incr s | "
        "incr/full |",
        "|---|---|---|---|---|",
    ]
    for n, nb, tf, ti in results:
        lines.append(f"| {n:,} | {nb:,} | {tf:.2f} | {ti:.2f} | "
                     f"{ti / tf:.2f}x |")
    if len(results) == 2:
        (n1, _, tf1, ti1), (n2, _, tf2, ti2) = results
        lines += [
            "",
            f"Store doubled {n1:,} → {n2:,}: capped full reflag "
            f"{tf2 / tf1:.2f}x; capped incremental {ti2 / ti1:.2f}x — "
            "the ranking windows run over the touched buckets' rows "
            "(the late batch's collision neighborhood, near-constant "
            "here), so cost still follows the BATCH; the residual "
            "growth is the same stored-table scan the uncapped repair "
            f"pays ({ti1 / tf1:.2f}x → {ti2 / tf2:.2f}x of the full "
            "pass).",
        ]
    sn, sb, stf, sti, sst = skew
    lines += [
        "",
        "Seeded-random SKEWED scenario (r13, seed 13): 40k-doc store "
        "where each batch plants 100 docs of one hot near-dup family "
        "(single-token variants — one LSH bucket family far above "
        "max_bucket=8), late batch = 5k docs of which 500 are "
        "hot-family twins with smaller ids, so every touched hot "
        "bucket re-keys and sheds old top-k members.  Flags asserted "
        "identical to the capped full reflag; the eviction SUPERSET's "
        "over-inclusion measured (and asserted ≤ touched rows) via "
        "the repair's stats out-param:",
        "",
        "| store docs | late batch | capped full s | capped incr s | "
        "touched rows | evicted ids | evicted/touched |",
        "|---|---|---|---|---|---|---|",
        f"| {sn:,} | {sb:,} | {stf:.2f} | {sti:.2f} | "
        f"{sst['touched_rows']:,} | {sst['evicted']:,} | "
        f"{sst['evicted'] / max(sst['touched_rows'], 1):.3f} |",
        "",
        f"Replaced reps (exact recompute): {sst['replaced_reps']:,} "
        "— the withdrawal surface stays a small slice of the touched "
        "neighborhood even when the late wave aims at the hottest "
        "bucket, because eviction needs BOTH old rank ≤ K and new "
        "rank > K, and each bucket can only shed K old members per "
        "wave.",
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
