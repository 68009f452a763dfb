#!/usr/bin/env python
"""Time one or more specs under the bench protocol in a fresh JVM:
full-SF page-cache warm + per-plan smoke/full passes, then min-of-N
with clearCache before each timed run.  Usage:
    python scripts/r19_timeq.py <spec> [...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS (3).
"""

from __future__ import annotations

import glob
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE = "/root/testdata/sf0.001"


def main(argv: list[str]) -> None:
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark

    spark = get_spark("r19-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    for f in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        paths = ([f] if os.path.isfile(f) else
                 sorted(glob.glob(os.path.join(f, "*.parquet"))))
        for p in paths:
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name in argv:
        spec = SPEC_BY_NAME[name]
        spec.build(spark, SMOKE).collect()
        spark.catalog.clearCache()
        spec.build(spark, SF_DIR).collect()
        best, draws = float("inf"), []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.build(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            draws.append(round(dt, 3))
            best = min(best, dt)
        print(f"RESULT {name} min={best:.3f} draws={draws}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
