#!/usr/bin/env python
"""Per-row decomposition of the 4.5–8x sf1-rehearsal rows (VERDICT r10
ask #3): asof1 (7.8x), st9 (6.2x), tx5 (4.6x), e3 (4.6x), w1 (3.4x).

The rehearsal's single-draw sf1 column cannot distinguish
core-saturation (fine: sf0.1 under-utilizes 32 cores, so ratios
between ~3x and 10x are expected) from per-row growth (a plan bug:
work per input row increasing with scale).  This smoke measures each
query at 1x/4x/10x content-distinct replicas with min-of-3 at EVERY
scale (the host shows multi-second noise bursts: a first min-of-2
draw flagged st9's variant at r(10) = 0.83 that a 5-run probe
resolved to 0.42) and reports the per-row ratio r(k) = t(k) / (k · t(1)) — r(10)
well below 1 is sub-linear total work per row (saturation headroom
being consumed); r(10) ≳ 0.8 flags per-row growth and gets a
diagnosis.

Two of the five fold over FIXED key spaces in the spec fixture (st9:
5 actors from ``user_id % 5``; asof1: the fixed event_type set), so
replicating events grows per-key chain length instead of key count —
the dimension a real corpus grows.  For those, a second VARIANT
measurement scales the key space with the data (actors/types salted
per replica), separating "long per-key chains on few partitions"
(fixture artifact) from the operator's own scaling.

Appends one section to docs/SCALING.md (idempotent: rewrites only its
own marker section).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.catalog import load_table  # noqa: E402
from axonops_schema_registry_spark.operators.core import as_of_join  # noqa: E402
from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402
from axonops_schema_registry_spark.streaming.audit import (  # noqa: E402
    normalize_audit,
)
from axonops_schema_registry_spark.streaming.stateful import (  # noqa: E402
    token_bucket_flags,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)
OFF = 10_000_000  # divisible by the %4/%10/%100 fixture derivations
MARKER = ("\n## r11 appendix: per-row decomposition of the 4.5–8x "
          "sf1 rows")
QUERIES = ("w1_latest_per_subject", "e3_similarity_selfjoin",
           "tx5_dataset_card", "st9_token_bucket",
           "asof1_config_at_event_time")


def synthesize(spark, out_dir: str, k: int) -> None:
    """k content-distinct replicas of the three input tables, the sf1
    rehearsal pattern: keys offset together, document words salted so
    copies share no shingles."""
    specs = {
        "orders": (["o_orderkey", "o_custkey"], None),
        "documents": (["doc_id"], "salt"),
        "events": (["event_id", "user_id"], None),
    }
    for name, (keys, mode) in specs.items():
        src = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        copies = []
        for i in range(k):
            c = src
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFF))
            if mode == "salt" and i > 0:
                c = c.withColumn(
                    "text", F.expr(
                        f"array_join(transform(split(text, ' '), "
                        f"w -> concat(w, '_s{i}')), ' ')"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        (out.repartition(32).write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"{name}.parquet")))


def st9_variant(spark, sf_dir: str):
    """st9 with the actor space scaling with the data: replica i's
    events belong to 5 FRESH actors (copy from the event_id offset) —
    the shape a growing client population has."""
    audit = normalize_audit(load_table(spark, sf_dir, "events"))
    copy = (F.col("event_id") / OFF).cast("bigint")
    audit = audit.withColumn("actor_id",
                             F.col("actor_id") % 5 + copy * 5)
    return token_bucket_flags(audit, rate=1.0 / 14400.0, burst=2.0)


def asof1_variant(spark, sf_dir: str):
    """asof1 with the event_type space scaling with the data: each
    replica's events form their own types (more configs, same-length
    histories — how a real corpus adds keys, not chain length)."""
    ev = load_table(spark, sf_dir, "events")
    copy = (F.col("event_id") / OFF).cast("bigint")
    ev = ev.withColumn("event_type",
                       F.concat("event_type", F.lit("#"),
                                copy.cast("string")))
    snaps = (ev.filter(F.col("event_id") % 10 == 0)
             .groupBy("event_type", "ts")
             .agg(F.max("value").alias("config_value")))
    lefts = (ev.filter(F.col("event_id") % 10 != 0)
             .select("event_id", "event_type",
                     F.col("ts").alias("event_ts")))
    return as_of_join(lefts, snaps, "event_type", "event_ts", "ts",
                      ["config_value"])


def main() -> None:
    spark = get_spark("scale-smoke-r11")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(thunk, runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            thunk().collect()
            best = min(best, time.perf_counter() - t0)
        return best

    jobs = {name: SPEC_BY_NAME[name].build for name in QUERIES}
    jobs["st9 (actors scale with data)"] = st9_variant
    jobs["asof1 (types scale with data)"] = asof1_variant

    # warm-up at smoke scale so codegen/JIT is out of the measurement
    for build in jobs.values():
        try:
            build(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

    times: dict[str, dict[int, float]] = {n: {} for n in jobs}
    tmp = tempfile.mkdtemp(prefix="scale_r11_")
    try:
        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synthesize(spark, d, k)
            for name, build in jobs.items():
                times[name][k] = timed(lambda b=build, dd=d:
                                       b(spark, dd))
                print(f"{name} @ {k}x: {times[name][k]:.2f}s",
                      flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        "Content-distinct replicas (sf1-rehearsal salting), min-of-3 "
        "at EVERY scale.  r(k) = t(k)/(k·t(1)) is the per-row ratio: "
        "≪1 = sub-linear total (the 32 cores had headroom at 1x); "
        "≳0.8 = per-row growth (flagged).  st9/asof1 fold over FIXED "
        "fixture key spaces (5 actors / ~20 event types), so their "
        "spec rows measure ever-longer per-key chains on few "
        "partitions; the variant rows scale the key space with the "
        "data — the dimension a real corpus grows.",
        "",
        "| query | 1x s | 4x s | 10x s | r(4) | r(10) | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, t in times.items():
        r4 = t[4] / (4 * t[1])
        r10 = t[10] / (10 * t[1])
        if r10 < 0.8:
            verdict = "sub-linear per-row — saturation headroom"
        else:
            verdict = "per-row growth ⚠"
        lines.append(f"| {name} | {t[1]:.2f} | {t[4]:.2f} | "
                     f"{t[10]:.2f} | {r4:.2f} | {r10:.2f} | "
                     f"{verdict} |")
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
