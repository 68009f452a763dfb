#!/usr/bin/env python
"""Per-row scaling for the operators NEW in round 11 (the convention
every new operator follows: 1x/4x/10x content-distinct replicas,
per-row ratio r(k) = t(k)/(k·t(1)) — ≪1 is saturation headroom being
consumed, ≳0.8 flags per-row growth):

- es3_decontamination_cut — cross-corpus ExactSubstr cut; the eval
  slice (and so the gram set the membership join probes) scales WITH
  the corpus here, the worst case for the join's small side.
- mix3_temperature_mixture — one map-combinable token-mass aggregate
  plus a sources-sized quota broadcast.
- vg1_vocab_growth — first-occurrence shingle aggregate (the
  formulation chosen precisely so this stays one groupBy at scale).

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

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
MARKER = "\n## r11 appendix: new-operator scaling (es3, mix3, vg1)"
QUERIES = ("es3_decontamination_cut", "mix3_temperature_mixture",
           "vg1_vocab_growth")


def synthesize(spark, out_dir: str, k: int) -> None:
    src = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    copies = []
    for i in range(k):
        c = src.withColumn("doc_id",
                           F.col("doc_id") + F.lit(i * 10_000_000))
        if i > 0:
            # word-salt so copies share no grams/shingles (true-dup
            # density held constant — the engine-linearity question)
            c = c.withColumn(
                "text", F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"w -> concat(w, '_s{i}')), ' ')"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    (out.repartition(32).write.mode("overwrite")
     .parquet(os.path.join(out_dir, "documents.parquet")))


def main() -> None:
    spark = get_spark("scale-smoke-r11b")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(build, d, runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build(spark, d).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in QUERIES:  # codegen warm-up
        SPEC_BY_NAME[name].build(spark, "/root/testdata/sf0.001") \
            .collect()

    times: dict[str, dict[int, float]] = {n: {} for n in QUERIES}
    tmp = tempfile.mkdtemp(prefix="scale_r11b_")
    try:
        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synthesize(spark, d, k)
            for name in QUERIES:
                times[name][k] = timed(SPEC_BY_NAME[name].build, d)
                print(f"{name} @ {k}x: {times[name][k]:.2f}s",
                      flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        "Word-salted content-distinct replicas, min-of-3 at every "
        "scale; r(k) = t(k)/(k·t(1)).  es3's eval slice grows with "
        "the corpus here (the membership join's probe set scales too "
        "— worst case for its small side).",
        "",
        "| query | 1x s | 4x s | 10x s | r(4) | r(10) |",
        "|---|---|---|---|---|---|",
    ]
    for name, t in times.items():
        lines.append(f"| {name} | {t[1]:.2f} | {t[4]:.2f} | "
                     f"{t[10]:.2f} | {t[4] / (4 * t[1]):.2f} | "
                     f"{t[10] / (10 * t[1]):.2f} |")
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
