#!/usr/bin/env python
"""The tx5-pattern 10-run single-process sweeps for the two r13 bench
draws flagged ``weak`` by the r13 verdict (ask #3):

  * gq1_gopher_quality — r13 driver draw 0.635 s vs best 0.388 s
    (1.64x, beyond the ±30% scatter band even after the 1.13x host
    gauge).  Plan verifiably untouched: the entire r13 diff to
    llm/text.py is a docstring; PLANS.md:4441 pins a two-column pruned
    scan -> map-side partial agg -> exchange.
  * dsir1_importance_selection — r13 draw 1.908 s vs best 1.301 s
    (1.47x, borderline after the gauge).  Plan untouched: the r13
    llm/sampling.py diff changed only temperature_quotas, which dsir1
    does not call; PLANS.md:1228 pins broadcast bounded LMs + one agg.

Decision rule (mirrors scripts/tx5_sweep.py / e3_sweep.py and the
VERDICT r13 'done =' clause): min-of-10 in a single process <= 1.3x
the BASELINE.md best -> host weather, pin the floor in a BASELINE.md
appendix.  Floor > 1.3x best -> plan regressed; diff the runtime plan
against the PLANS.md pin and fix (the tx5 lesson: a weather-flagged
query can still hide a real shuffle tax).

Prints all runs + min/median/max per query; exit 0 if both floors are
<= 1.3x best, 1 otherwise.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "10"))

#: (spec name, BASELINE.md best seconds, r13 driver draw seconds)
TARGETS = (
    ("gq1_gopher_quality", 0.388, 0.635),
    ("dsir1_importance_selection", 1.301, 1.908),
)


def sweep(spark, name: str, best: float, r13_draw: float) -> float:
    spec = SPEC_BY_NAME[name]
    spec.build(spark, "/root/testdata/sf0.001").collect()  # warm-up
    times = []
    for i in range(N):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).collect()
        times.append(time.perf_counter() - t0)
        print(f"  {name} run {i + 1}: {times[-1]:.3f}s", flush=True)
    mn = min(times)
    print(f"  min={mn:.3f}s  median={sorted(times)[N // 2]:.3f}s  "
          f"max={max(times):.3f}s  best={best:.3f}s  "
          f"ratio_vs_best={mn / best:.2f}  r13_draw={r13_draw:.3f}s")
    verdict = ("WEATHER (floor <= 1.3x best — pin in BASELINE.md)"
               if mn <= 1.3 * best
               else "PLAN-SUSPECT (floor stayed high — diff vs PLANS.md pin)")
    print(f"  verdict: {verdict}\n")
    return mn


def main() -> None:
    spark = get_spark("r14-sweeps")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for name, best, r13_draw in TARGETS:
        print(f"sweeping {name} at {SF_DIR} ({N} runs):")
        mn = sweep(spark, name, best, r13_draw)
        ok = ok and mn <= 1.3 * best
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
