#!/usr/bin/env python
"""The composed r18 demonstration (VERDICT r17 ask #5): stream the
REAL sf0.1 fixture batch-equal through the CCNet streaming capstone.

r17 established the three pieces separately: `ord1` proved the real
corpus is NOT hash-order streamable as-is (456 late-winner block keys
under id-stripe epochs), `man1` CONSTRUCTS an order-safe manifest
(line-dedup first + exact `(h·n)>>48` hash-range epoch cuts), and
`ccn2` pinned stream ≡ batch on a planted order-compatible corpus.
This script composes them on the real corpus: feed man1's epochs into
``CCNetStreamSink`` in STRICT mode (acceptance of every batch is the
precondition witness — the sink refuses out-of-order batches before
mutating state) and pin ``final_receipt ≡ ccnet_receipt`` over the
same corpus, with ``order_report`` all-True recorded alongside.

Appends the result table to docs/SCALING.md.  The sf0.001 pytest twin
is tests/test_r18_advice_and_strict.py::
test_real_fixture_streams_batch_equal_via_man1.

Usage: python scripts/r18_man1_ccn2_real.py
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EPOCHS = 4
BUDGET = 20_000
N_QUALITY = 2_000
MARKER = ("\n## r18 appendix: the REAL fixture streamed batch-equal "
          "via man1 + strict ccn2")


def main() -> int:
    from axonops_schema_registry_spark.llm.ccnet import (
        ccnet_receipt,
        order_safe_manifest,
    )
    from axonops_schema_registry_spark.streaming.ccnet_stream import (
        CCNetStreamSink,
    )

    spark = get_spark("r18-man1-ccn2")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(os.path.join(SF_DIR,
                                            "documents.parquet"))
            .select("doc_id", "source", "text"))
    n_raw = docs.count()
    man = (order_safe_manifest(docs, n_epochs=N_EPOCHS)
           .select("doc_id", "source", "text", "epoch")
           .localCheckpoint(eager=True))
    sizes = {r["epoch"]: r["n"] for r in
             man.groupBy("epoch").agg(F.count("*").alias("n"))
             .collect()}
    corpus = man.select("doc_id", "source", "text")
    pos = sorted(r[0] for r in
                 docs.select("source").distinct().collect())[0]

    t0 = time.perf_counter()
    want = sorted(tuple(r) for r in ccnet_receipt(
        corpus, budget_tokens=BUDGET, n_quality=N_QUALITY,
        pos_source=pos).collect())
    t_batch = time.perf_counter() - t0

    d = tempfile.mkdtemp(prefix="man1_ccn2_")
    lines = [MARKER, "",
             f"sf0.1 documents ({n_raw:,} raw docs) → "
             f"`order_safe_manifest(n_epochs={N_EPOCHS})` "
             f"(dedup-first + hash-range cuts; epoch sizes "
             f"{[sizes.get(e, 0) for e in range(N_EPOCHS)]}) → "
             f"`CCNetStreamSink(strict=True, budget={BUDGET:,}, "
             f"n_quality={N_QUALITY:,})` one epoch per batch.  "
             f"Strict mode means every ACCEPTED batch is itself the "
             f"arrival-order precondition witness (the sink refuses "
             f"violations pre-mutation); ord1 showed the same corpus "
             f"under id-stripe epochs fails the line leg with "
             f"late-winner keys, so the manifest is doing real work "
             f"here.", ""]
    try:
        t0 = time.perf_counter()
        sink = CCNetStreamSink(corpus, d, budget_tokens=BUDGET,
                               n_quality=N_QUALITY, pos_source=pos,
                               strict=True)
        t_cal = time.perf_counter() - t0
        lines += [f"One-time calibration: {t_cal:.2f} s; batch "
                  f"`ccnet_receipt` reference: {t_batch:.2f} s.", "",
                  "| epoch | docs | sec | accepted (strict) |",
                  "|---|---|---|---|"]
        for e in range(N_EPOCHS):
            t0 = time.perf_counter()
            sink(man.filter(F.col("epoch") == e)
                 .select("doc_id", "source", "text"), e)
            lines.append(f"| {e} | {sizes.get(e, 0):,} | "
                         f"{time.perf_counter() - t0:.2f} | yes |")
        got = sorted(tuple(r)
                     for r in sink.final_receipt(spark).collect())
        rep = sink.order_report(spark).collect()
        all_ok = all(r.admission_order_ok and r.line_order_ok
                     for r in rep)
        equal = got == want
        lines += ["",
                  f"`final_receipt ≡ ccnet_receipt`: **{equal}** "
                  f"({len(want)} source rows, every column); "
                  f"`order_report` all-True over {len(rep)} epochs: "
                  f"**{all_ok}**."]
        if not equal or not all_ok:
            print("MISMATCH", file=sys.stderr)
            for a, b in zip(got, want):
                if a != b:
                    print(f"got  {a}\nwant {b}", file=sys.stderr)
            return 1
    finally:
        shutil.rmtree(d, ignore_errors=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "docs", "SCALING.md")
    text = open(path).read()
    if MARKER in text:
        text = text[:text.index(MARKER)]
    with open(path, "w") as f:
        f.write(text + "\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
