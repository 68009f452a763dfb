#!/usr/bin/env python
"""Fat-document bytes-term measurement (VERDICT r14 ask #3).

The 100 TB projection appendix (docs/SCALING.md) assumes 4 KB/document
but was measured on ~0.3 KB fixture docs, so its bytes-term on
explode-heavy text operators is underestimated ~13x — the one
assumption in the flagship appendix a reviewer can attack.  This
script closes it by MEASURING: each fixture document is fattened to
~4 KB by concatenating 13 per-segment word-salted variants of its own
text (segment salts ``_f0..\_f12`` keep every block/gram
content-distinct WITHIN a document; the transform is identical across
documents, so cross-document duplicate structure — what es/ln/dd key
on — is preserved exactly), then the standard 1x/4x/10x
content-distinct replica decomposition runs on the FAT corpus for the
most text-bound projection rows:

    es1 / es1h (positioned-gram spans), es2 (span cut),
    ln1 (line dedup), tx9 (encoding scan), cur3 (curation capstone).

Output: a SCALING.md appendix with measured fat-marginal docs/s and
the bytes-corrected projected cluster wall at 2.5e10 x 4 KB docs —
replacing the "row-term with a bytes caveat" numbers for these rows.
Min-of-3 per point, the new_op_scale protocol.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
SEGMENTS = 13          # ~0.3 KB fixture text -> ~4 KB fat text
RUNS = 3
MARKER = "\n## r15 appendix: fat-document (4 KB/doc) bytes-term measurement"
QUERIES = ("es1_exact_substring_spans", "es1h_exact_substring_spans_hashed",
           "es2_span_removal", "ln1_line_dedup", "tx9_encoding_scan",
           "cur3_quality_dedup_split")


def fatten(col: str) -> str:
    """Spark SQL expr: 13 segment-salted variants of the text joined —
    content-distinct segments within a doc, identical transform across
    docs (cross-doc dup structure preserved)."""
    return (f"array_join(transform(sequence(0, {SEGMENTS - 1}), "
            f"j -> array_join(transform(split({col}, ' '), "
            f"w -> concat(w, '_f', j)), ' ')), ' ')")


def synthesize(spark, out_dir: str, k: int) -> None:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .withColumn("text", F.expr(fatten("text")))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dcopies, ecopies = [], []
    for i in range(k):
        d = docs.withColumn("doc_id",
                            F.col("doc_id") + F.lit(i * 10_000_000))
        e = emb.withColumn("vec_id",
                           F.col("vec_id") + F.lit(i * 10_000_000))
        if i > 0:
            d = d.withColumn(
                "text", F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"w -> concat(w, '_s{i}')), ' ')"))
            e = e.withColumn(
                "embedding", F.expr(
                    f"concat(slice(embedding, {i + 1}, {64 - i}), "
                    f"slice(embedding, 1, {i}))"))
        dcopies.append(d)
        ecopies.append(e)
    for copies, name in ((dcopies, "documents"), (ecopies, "embeddings")):
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        (out.repartition(32).write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"{name}.parquet")))


def main() -> int:
    spark = get_spark("r15-fatdoc")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="fatdoc_")
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

        lines = [MARKER, "",
                 "The projection appendix's bytes-term caveat, closed by "
                 "measurement: the standard 1x/4x/10x content-distinct "
                 "replica decomposition re-run on a corpus fattened to "
                 f"~{stats.b / 1024:.1f} KB/doc ({SEGMENTS} per-segment "
                 "word-salted variants per doc — segments content-distinct "
                 "within a doc, cross-doc dup structure preserved).  "
                 "Marginal docs/s = 45,000 / (t(10) − t(1)); projected "
                 "wall = 2.5e10 docs / (docs/s × 8,000/32 cores).  "
                 f"Min-of-{RUNS} per point.", "",
                 "| query | 1x s | 4x s | 10x s | fat marginal docs/s "
                 "(32 cores) | projected wall @ 2.5e10 docs, 8,000 cores |",
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
        lines.append("")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SCALING.md")
        text = open(path).read()
        if MARKER in text:
            text = text[:text.index(MARKER)]
        with open(path, "w") as fh:
            fh.write(text + "\n".join(lines) + "\n")
        print("appended to docs/SCALING.md", flush=True)
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
