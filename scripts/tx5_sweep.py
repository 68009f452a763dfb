#!/usr/bin/env python
"""The e3-pattern 10-run single-process sweep for the tx5 bench draw
(VERDICT r12 "what's wrong" #1): the r12 driver benched
tx5_dataset_card at 2.266 s — 1.88x its r6 best (1.205 s) and 1.82x
its r11 draw — with a verifiably untouched plan (no tx5 lines in the
r12 diff; PLANS.md entry unchanged) while the host gauge read only
1.09x.  The builder's same-day internal bench drew tx5 at ~1.26 s
(commit 285c1db), so the working hypothesis is a bimodal host draw
like e3's, but 1.88x is beyond the ±30% scatter band so it must be
adjudicated with data, not a shrug.

Decision rule (mirrors scripts/e3_sweep.py / the r6 BASELINE.md
appendix): if min-of-10 in a single process lands back at or below
1.3 s, the 2.266 s reading was host weather — pin the floor in
BASELINE.md.  If the floor stays above 1.5 s, the plan regressed —
diff the runtime plan against PLANS.md:218 (last tx5 plan change was
the r10 per-element-split fix).

Prints all runs + min/median/max; exit 0 if min <= 1.3 s, 1 otherwise.
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


def main() -> None:
    spark = get_spark("tx5-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spec = SPEC_BY_NAME["tx5_dataset_card"]
    spec.build(spark, "/root/testdata/sf0.001").collect()  # warm-up

    times = []
    for i in range(N):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).collect()
        times.append(time.perf_counter() - t0)
        print(f"run {i + 1}: {times[-1]:.3f}s", flush=True)
    mn = min(times)
    print(f"\nmin={mn:.3f}s  median={sorted(times)[N // 2]:.3f}s  "
          f"max={max(times):.3f}s")
    print("history: r6 best 1.205 s; r11 draw 1.243 s; r12 driver draw "
          "2.266 s; r12 builder same-day draw ~1.26 s")
    verdict = ("WEATHER (floor back inside the band — pin in BASELINE.md)"
               if mn <= 1.3
               else "PLAN-SUSPECT (floor stayed high — diff vs PLANS.md:218)")
    print(f"verdict: {verdict}")
    sys.exit(0 if mn <= 1.3 else 1)


if __name__ == "__main__":
    main()
