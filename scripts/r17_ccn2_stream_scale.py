#!/usr/bin/env python
"""ccn2 per-epoch cost shape (the stream-family SCALING convention
applied to the new CCNet streaming capstone): the sink composes two
disk-backed stores whose per-batch costs are individually pinned flat
(LineDedupStore: batch segments itself + joins stored elections;
TokenBudgetAdmissionSink: sources-sized state join) plus row-local
calibrated gates — so the COMPOSED per-epoch cost must also stay flat
as the stream grows.  This measures it: 6 equal content-distinct
batches of sf0.1 documents (5k docs each, stopword-PRESERVING salt so
the language gate keeps firing — the r16 fattener lesson), calibration
fitted once on the union, each epoch's full chain timed.

Appends the per-epoch table + the one-time calibration cost to
docs/SCALING.md.  Usage: python scripts/r17_ccn2_stream_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.llm.text import LANG_STOPWORDS  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402
from axonops_schema_registry_spark.streaming.ccnet_stream import (  # noqa: E402
    CCNetStreamSink,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = 6
MARKER = "\n## r17 appendix: ccn2 CCNetStreamSink per-epoch cost shape"


def _salted(docs, i: int):
    """Content-distinct batch i with the language profiles intact:
    shifted ids, content words salted, STOPWORDS untouched (salting
    them zeroes the stopword-profile gate — measured in r16)."""
    d = docs.withColumn("doc_id",
                        F.col("doc_id") + F.lit(i * 10_000_000))
    if i == 0:
        return d
    sw = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    lst = ", ".join("'{}'".format(w.replace("'", "''")) for w in sw)
    return d.withColumn("text", F.expr(
        f"array_join(transform(split(text, ' '), "
        f"w -> CASE WHEN w IN ({lst}) THEN w "
        f"ELSE concat(w, '_s{i}') END), ' ')"))


def main() -> int:
    spark = get_spark("r17-ccn2-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(os.path.join(SF_DIR,
                                            "documents.parquet"))
            .select("doc_id", "source", "text"))
    n = docs.count()
    batches = [_salted(docs, i).localCheckpoint(eager=True)
               for i in range(N_BATCHES)]
    full = batches[0]
    for b in batches[1:]:
        full = full.unionByName(b)
    full = full.localCheckpoint(eager=True)

    d = tempfile.mkdtemp(prefix="ccn2_scale_")
    lines = [MARKER, "",
             f"{N_BATCHES} equal content-distinct batches x {n:,} "
             "docs (stopword-preserving salt), calibration fitted "
             "once on the union; each row is one epoch's FULL chain "
             "(gate + normalize + line-store ingest + ppl/quality "
             "gates + admission + receipt write).  Flat per-epoch "
             "time = the composed sink inherits its stores' "
             "bounded-per-batch shapes; a growing time would mean a "
             "stage rescans the stream's past.", ""]
    try:
        t0 = time.perf_counter()
        sink = CCNetStreamSink(full, d)
        t_cal = time.perf_counter() - t0
        lines += [f"One-time calibration (the production "
                  f"train-once step) over {N_BATCHES * n:,} docs: "
                  f"{t_cal:.2f} s.", "",
                  "| epoch | store docs after | sec |", "|---|---|---|"]
        ts = []
        for e, b in enumerate(batches):
            t0 = time.perf_counter()
            sink(b, e)
            ts.append(time.perf_counter() - t0)
            lines.append(f"| {e} | {(e + 1) * n:,} | {ts[-1]:.2f} |")
        ratio = ts[-1] / ts[0] if ts[0] else float("inf")
        lines += ["", f"last/first epoch ratio: {ratio:.2f}x "
                  "(flat = per-epoch cost independent of stream "
                  "length; epoch 0 additionally pays first-use "
                  "codegen, so <=1.0x is expected on a healthy run)."]
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
