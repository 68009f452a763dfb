#!/usr/bin/env python
"""Per-row scaling for the operators NEW in round 12 (the standard
1x/4x/10x content-distinct protocol; r(k) = t(k)/(k·t(1)), ≳0.8 flags
per-row growth):

- ng1_ngram_novelty — gram-keyed first-occurrence aggregate + join
  back; the gram key space GROWS with the salted replicas (the
  dimension a real corpus scales).
- qn1_robust_length_normalization — two grouped exact-percentile
  passes on the source key; source count fixed, group sizes grow.
- out1_embedding_outliers — corpus×dim decimal aggregate, broadcast
  centroid join, one window per label (rolled vector replicas).

Appends one section to docs/SCALING.md (idempotent marker splice).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_smoke_r12 import synthesize  # noqa: E402  (same replicas)

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

FACTORS = (1, 4, 10)
MARKER = ("\n## r12 appendix: new-operator scaling "
          "(ng1, qn1, out1, cap1, ppl2, split1)")
QUERIES = ("ng1_ngram_novelty", "qn1_robust_length_normalization",
           "out1_embedding_outliers", "cap1_cluster_cap_sampling",
           "ppl2_bigram_perplexity", "split1_dataset_split")


def main() -> None:
    spark = get_spark("scale-smoke-r12b")
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
    tmp = tempfile.mkdtemp(prefix="scale_r12b_")
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
        "Word-salted / rolled content-distinct replicas, min-of-3 at "
        "every scale; r(k) = t(k)/(k·t(1)).  ng1's gram key space "
        "grows with the corpus (salted copies share no shingles); "
        "qn1's percentile groups deepen at fixed source count; out1's "
        "centroid table stays labels × dim while the explode grows "
        "linearly; cap1 rides dd4's pair+components path (decomposed "
        "separately above) plus one rank window per cluster; ppl2's "
        "bigram TYPE table grows with the salted replicas (each copy "
        "contributes fresh types — the score-table worst case); "
        "split1 is one scan-side hash.",
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
