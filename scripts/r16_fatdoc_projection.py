#!/usr/bin/env python
"""100 TB projection rows for the r15/r16 operators (VERDICT r15 ask
#7): qf1/qf2/ccb1/mix5 shipped with 1x/4x/10x thin-doc rows but no
cluster-hours row in the projection appendix; this measures them — and
the r16 ccn1 capstone — on the FAT (~6 KB/doc) corpus of the r15
bytes-term appendix, so the projected walls carry the measured bytes
term directly (all five tokenize the text column, so the bytes term is
their dominant axis).

Same derivation as the r14 projection appendix and the r15 fat-doc
appendix: marginal docs/s = 45,000 / (t(10) − t(1)); projected wall =
2.5e10 docs / (docs/s × 8,000/32 cores).  Min-of-3 per point.  Unlike
r15_fatdoc_scale.py this REPLACES its own SCALING.md section in place
(the new_op_scale marker convention) instead of truncating the file
tail.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r15_fatdoc_scale import synthesize  # noqa: E402 (shared fattener)

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

FACTORS = (1, 4, 10)
RUNS = 3
MARKER = ("\n## r16 appendix: fat-document projection rows for the "
          "r15/r16 operators")
QUERIES = ("qf1_quality_filter", "qf2_quality_gated_mixture",
           "ccb1_perplexity_buckets", "mix5_token_budget_mixture",
           "ccn1_ccnet_pipeline")


def main() -> int:
    from pyspark.sql import functions as F

    spark = get_spark("r16-fatdoc")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="fatdoc16_")
    dirs = {}
    try:
        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synthesize(spark, d, k)
            dirs[k] = d
        stats = spark.read.parquet(
            os.path.join(dirs[1], "documents.parquet")) \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.avg(F.length("text")).alias("b")).collect()[0]
        print(f"fat corpus: {stats.n} docs, avg {stats.b:.0f} B/doc",
              flush=True)

        lines = [MARKER.strip(), "",
                 "Completes the projection table for the operators that "
                 "shipped after the r14 appendix (VERDICT r15 ask #7): "
                 "the same fat-corpus decomposition as the r15 appendix "
                 f"(~{stats.b / 1024:.1f} KB/doc), same derivation "
                 "(marginal docs/s = 45,000 / (t(10) − t(1)); projected "
                 "wall = 2.5e10 docs / (docs/s × 8,000/32 cores)), "
                 f"min-of-{RUNS} per point.  All five tokenize the text "
                 "column, so the bytes term measured here is their "
                 "dominant axis; the rank/limit gates inside qf2 and "
                 "ccn1 are corpus-size-invariant by construction and "
                 "contribute only to the fixed 1x term.", "",
                 "| query | 1x s | 4x s | 10x s | fat marginal docs/s "
                 "(32 cores) | projected wall @ 2.5e10 docs, 8,000 "
                 "cores |",
                 "|---|---|---|---|---|---|"]
        for name in QUERIES:
            spec = SPEC_BY_NAME[name]
            spec.build(spark, "/root/testdata/sf0.001").collect()
            t = {}
            for k in FACTORS:
                runs = []
                for _ in range(RUNS):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    spec.build(spark, dirs[k]).collect()
                    runs.append(time.perf_counter() - t0)
                t[k] = min(runs)
                print(f"{name} @ {k}x: {t[k]:.2f}s", flush=True)
            marg = t[10] - t[1]
            if marg <= 0:
                rate, wall = "scan-bound (t(10) <= t(1))", "< 0.1 h"
            else:
                dps = 45_000 / marg
                rate = f"{dps:,.0f}"
                wall = f"{2.5e10 / (dps * 8000 / 32) / 3600:.1f} h"
            lines.append(f"| {name} | {t[1]:.2f} | {t[4]:.2f} "
                         f"| {t[10]:.2f} | {rate} | {wall} |")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SCALING.md")
        content = open(path).read()
        if MARKER in content:
            head, _, rest = content.partition(MARKER)
            nxt = rest.find("\n## ")
            content = head + (rest[nxt:] if nxt >= 0 else "")
        with open(path, "w") as fh:
            fh.write(content.rstrip("\n") + "\n\n"
                     + "\n".join(lines) + "\n")
        print("appended to docs/SCALING.md", flush=True)
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
