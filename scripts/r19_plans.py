#!/usr/bin/env python
"""Dump .explain("formatted") for the given specs into plans/r19/.

Usage: python scripts/r19_plans.py <suffix> <spec> [...]
  suffix: "before" or "after" — file becomes plans/r19/<spec>_<suffix>.txt
Run "before" from a pristine checkout (e.g. a git worktree of the prior
round's HEAD) and "after" from the working tree.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_PLAN_DIR",
                     os.path.join("/root/repo", "plans", "r19"))


def main(argv: list[str]) -> int:
    from axonops_schema_registry_spark import queries as q
    from axonops_schema_registry_spark.session import get_spark

    suffix = argv[0]
    spark = get_spark("r19-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in argv[1:]:
        spec = q.SPEC_BY_NAME[name]
        df = spec.build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)",
              flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
