#!/usr/bin/env python
"""The r6-method 10-run single-process sweep for the e3 floor anomaly
(VERDICT r9 "what's wrong" #1): r9 benched e3_similarity_selfjoin at
1.343 s — 1.61x its r6 best — with the plan untouched and the host
gauge at 1.17x.  The r6 investigation showed e3's floor is bimodal on
this host (0.848–1.245 s across sweeps on identical code); this sweep
decides whether 1.343 was weather (min returns to the historical band)
or a real floor shift (min stays above ~1.0 s → diff the plan against
the r6 PLANS.md entry).

Prints all 10 times + min; exit 0 if min is inside the historical
band (< 1.0 s), 1 otherwise.  The verdict goes into BASELINE.md next
to the r6 root-cause section either way.
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
    spark = get_spark("e3-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spec = SPEC_BY_NAME["e3_similarity_selfjoin"]
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
    print(f"historical band (r6 investigation): 0.848–1.245 s; "
          f"r9 bench reading: 1.343 s")
    verdict = ("WEATHER (floor back inside the band)" if mn < 1.0
               else "PLAN-SUSPECT (floor stayed high — diff the plan)")
    print(f"verdict: {verdict}")
    sys.exit(0 if mn < 1.0 else 1)


if __name__ == "__main__":
    main()
