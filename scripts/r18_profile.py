#!/usr/bin/env python
"""Per-query measurement harness for the r18 optimization round
(guide §1: measure first).

For each named spec (default: the bench set):
  * capture ``explain("formatted")`` into plans/r18/<name>_<tag>.txt
  * run the query N times exactly as bench.py does (collect, cache
    cleared), keep the min wall;
  * on the LAST run, scrape the Spark UI REST API for the stages that
    executed during the run window and report per-stage executor run
    time, shuffle read/write bytes and input bytes — the numbers that
    separate real compute from scheduling/planning overhead.

Usage:
    python scripts/r18_profile.py [--tag before] [--runs 3] [name ...]

Writes plans/r18/<name>_<tag>.txt and prints one summary line per
spec plus a per-stage table for the expensive ones.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axonops_schema_registry_spark import queries as q  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4050"))


def _get_spark():
    """bench.py's session (tuned builder) but with the UI on so the
    REST status API is scrapeable."""
    import os as _os

    from pyspark.sql import SparkSession

    cpus = int(_os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    return (
        SparkSession.builder.master(master)
        .appName("r18-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                _os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _app_id() -> str:
    return _rest("applications")[0]["id"]


def _stages_between(app: str, t0: float, t1: float) -> list[dict]:
    out = []
    for st in _rest(f"applications/{app}/stages?status=complete"):
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        # e.g. 2026-08-17T01:02:03.123GMT
        ts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
        if t0 - 1 <= ts <= t1 + 1:
            out.append(st)
    return out


def main(argv: list[str]) -> int:
    tag = "before"
    runs = 3
    names: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--runs":
            runs = int(next(it))
        else:
            names.append(a)
    specs = ([q.SPEC_BY_NAME[n] for n in names]
             if names else q.bench_specs())

    spark = _get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(ROOT, "plans", "r18"), exist_ok=True)

    # warm pass (bench.py parity): page-cache fault + smoke/full plan runs
    import glob
    for f in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        paths = ([f] if os.path.isfile(f) else
                 sorted(glob.glob(os.path.join(f, "*.parquet"))))
        for p in paths:
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    smoke = "/root/testdata/sf0.001"
    for spec in specs:
        try:
            if os.path.isdir(smoke) and smoke != SF_DIR:
                spec.build(spark, smoke).collect()
            spark.catalog.clearCache()
            spec.build(spark, SF_DIR).collect()
        except Exception as e:  # noqa: BLE001
            print(f"warm {spec.name}: {e}", flush=True)

    app = _app_id()
    rows = []
    for spec in specs:
        # pinned plan
        df = spec.build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(ROOT, "plans", "r18",
                               f"{spec.name}_{tag}.txt"), "w") as fh:
            fh.write(plan)

        best = float("inf")
        t0 = t1 = 0.0
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{spec.name}")
            t0 = time.time()
            spec.build(spark, SF_DIR).collect()
            t1 = time.time()
            best = min(best, t1 - t0)
        spark.sparkContext.setJobDescription(None)

        try:
            sts = _stages_between(app, t0, t1)
        except Exception:  # noqa: BLE001
            sts = []
        run_ms = sum(s.get("executorRunTime", 0) for s in sts)
        sh_r = sum(s.get("shuffleReadBytes", 0) for s in sts)
        sh_w = sum(s.get("shuffleWriteBytes", 0) for s in sts)
        inp = sum(s.get("inputBytes", 0) for s in sts)
        n_ex = plan.count("Exchange")
        rows.append({
            "name": spec.name, "wall_min_s": round(best, 3),
            "last_wall_s": round(t1 - t0, 3), "n_stages": len(sts),
            "task_time_s": round(run_ms / 1000, 2),
            "shuffle_read_mb": round(sh_r / 1e6, 2),
            "shuffle_write_mb": round(sh_w / 1e6, 2),
            "input_mb": round(inp / 1e6, 2),
            "n_exchange_nodes": n_ex,
        })
        print(json.dumps(rows[-1]), flush=True)

    with open(os.path.join(ROOT, "plans", "r18",
                           f"profile_{tag}.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"total wall_min {round(sum(r['wall_min_s'] for r in rows), 2)}s"
          f" over {len(rows)} specs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
