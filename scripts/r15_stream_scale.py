#!/usr/bin/env python
"""Audit/event-stream family scale proof (VERDICT r14 ask #9 — the one
operator family with correctness pins but no per-row SCALING rows).

Synthesizes a 1x/4x/10x EVENT stream from sf0.1's events.parquet
(100k rows, ~30 days): copy i shifts event ids (+i·1e7), actor ids
(+i·1e6) and timestamps (+i·32 days), so a k-times-larger corpus is a
k-times-LONGER stream with fresh actors — per-window and per-session
occupancy stays constant and the sweep measures ENGINE linearity, not
denser windows (the content-distinct-replica idea applied to time).

Rows-only timings (min-of-3) for the windowed-metrics, range-join,
rollup, rate-limit (both the declarative flags and the stateful token
bucket) and CEF/classification paths, plus the session-window operator
(audit.session_metrics — not a driver spec, timed directly).  Appends
the per-row table to docs/SCALING.md.
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
RUNS = 3
MARKER = "\n## r15 appendix: audit/event-stream family per-row decomposition"
SPECS = ("a10_event_metrics", "rj1_events_in_windows",
         "hr1_hypertable_rollup", "st6_rate_limit_flags",
         "st9_token_bucket", "aud2_event_type_analytics",
         "st2_filtered_cef_lines")


def synthesize(spark, out_dir: str, k: int) -> None:
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    copies = []
    for i in range(k):
        copies.append(
            ev.withColumn("event_id", F.col("event_id")
                          + F.lit(i * 10_000_000))
              .withColumn("user_id", F.col("user_id")
                          + F.lit(i * 1_000_000))
              .withColumn("ts", F.col("ts")
                          + F.expr(f"INTERVAL {i * 32} DAYS")))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    (out.repartition(32).write.mode("overwrite")
     .parquet(os.path.join(out_dir, "events.parquet")))


def time_once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    from axonops_schema_registry_spark.streaming.audit import (
        normalize_audit,
        session_metrics,
    )

    spark = get_spark("r15-stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="streamscale_")
    try:
        dirs = {}
        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synthesize(spark, d, k)
            dirs[k] = d

        def session_run(sf_dir):
            ev = spark.read.parquet(
                os.path.join(sf_dir, "events.parquet"))
            return session_metrics(normalize_audit(ev)).count()

        def spec_runner(name):
            return lambda d: SPEC_BY_NAME[name].build(spark, d).count()

        jobs = [(n, spec_runner(n)) for n in SPECS]
        jobs.append(("session_metrics (audit.py, gap=5m)", session_run))

        lines = [MARKER, "",
                 "Rows-only per-row decomposition for the stream family "
                 "(min-of-3; 1x = sf0.1's 100k events / ~30 days; copies "
                 "shift ids+actors+timestamps so the k x corpus is a "
                 "k x LONGER stream — constant per-window/session "
                 "occupancy, engine linearity measured, r(k) = "
                 "t(k)/(k·t(1))).", "",
                 "| query | 1x s | 4x s | 10x s | r(4) | r(10) |",
                 "|---|---|---|---|---|---|"]
        for name, runner in jobs:
            t = {}
            for k in FACTORS:
                runs = []
                for _ in range(RUNS):
                    spark.catalog.clearCache()
                    runs.append(time_once(lambda: runner(dirs[k])))
                t[k] = min(runs)
                print(f"{name} @ {k}x: {t[k]:.2f}s", flush=True)
            lines.append(
                f"| {name} | {t[1]:.2f} | {t[4]:.2f} | {t[10]:.2f} "
                f"| {t[4] / (4 * t[1]):.2f} | {t[10] / (10 * t[1]):.2f} |")
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
