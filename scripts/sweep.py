#!/usr/bin/env python
"""Generalized tx5-protocol bench-flag sweep (VERDICT r14 ask #8):
the fourth hand-rolled copy of this harness (tx5_sweep, e3_sweep,
r14_sweeps) turned into the one-liner the adjudication protocol wants.

    python scripts/sweep.py <spec> [<spec> ...] [--runs N]
    python scripts/sweep.py --gauge [--runs N]

Per spec: N single-process runs at $SPARK_GRAFT_SF_DIR (default
sf0.1), cache cleared between runs, min/median/max printed, and the
tx5 decision rule applied against the spec's best-ever driver draw
(min over every BENCH_r*.json):

  floor (min-of-N) <= 1.3 x best  ->  WEATHER: pin the floor in a
                                      BASELINE.md appendix
  floor            >  1.3 x best  ->  PLAN-SUSPECT: diff the runtime
                                      plan against its PLANS.md pin

``--gauge`` sweeps the three stable untouched reference queries
(w1/q1/tx5 — the same-sitting gauge the r14 sweeps used) and reports
the host-weather ratio: ~1.0x means a calm window (safe to re-pin
bench floors), >>1x means the host is globally slow and per-query
flags are weather until proven otherwise.

Exit 0 iff every swept floor is <= 1.3x its best (gauge mode: always
0 — the gauge is a measurement, not a pass/fail).  A markdown row per
spec is printed for direct paste into the BASELINE.md appendix.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: stable, untouched-for-many-rounds queries spanning scan/agg (q1),
#: window (w1), and a composed text pipeline (tx5) — the same trio the
#: r14 gauge used, so gauge readings stay comparable across rounds
GAUGE_SPECS = ("w1_latest_per_subject", "q1_pricing_summary",
               "tx5_dataset_card")


def best_draws() -> dict[str, float]:
    """Best-ever per-query driver draw: min over every BENCH_r*.json."""
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        with open(path) as fh:
            record = json.load(fh)
        parsed = record.get("parsed") or {}
        for name, sec in (parsed.get("queries") or {}).items():
            best[name] = min(best.get(name, float("inf")), float(sec))
    return best


def sweep(spark, name: str, runs: int, best: float | None) -> float:
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME

    spec = SPEC_BY_NAME[name]
    # two-stage warm-up: sf0.001 compiles the plan, then ONE untimed
    # full-SF run warms the page cache and JIT on real data — without
    # it a sub-second query's floor reads ~25-40% high vs its
    # bench-context draw (the r15 w1 datum, BASELINE.md)
    spec.build(spark, "/root/testdata/sf0.001").collect()
    spec.build(spark, SF_DIR).collect()
    times = []
    for i in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, SF_DIR).collect()
        times.append(time.perf_counter() - t0)
        print(f"  {name} run {i + 1}: {times[-1]:.3f}s", flush=True)
    floor = min(times)
    med = sorted(times)[len(times) // 2]
    if best is None:
        print(f"  min={floor:.3f}s median={med:.3f}s max={max(times):.3f}s"
              f"  (no BENCH history — floor recorded, no verdict)")
        print(f"| {name} | {floor:.3f} | {med:.3f} | — | — | first pin |")
        return floor
    ratio = floor / best
    verdict = ("WEATHER" if ratio <= 1.3 else "PLAN-SUSPECT")
    print(f"  min={floor:.3f}s median={med:.3f}s max={max(times):.3f}s "
          f"best={best:.3f}s ratio_vs_best={ratio:.2f} -> {verdict}")
    print(f"| {name} | {floor:.3f} | {med:.3f} | {best:.3f} "
          f"| {ratio:.2f}x | {verdict} |")
    return floor


def main(argv: list[str]) -> int:
    runs = 10
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    gauge_mode = "--gauge" in argv
    names = list(GAUGE_SPECS) if gauge_mode \
        else [a for a in argv if not a.startswith("-")]
    assert names, __doc__

    from axonops_schema_registry_spark.session import get_spark

    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    best = best_draws()
    print(f"sweeping {names} at {SF_DIR}, {runs} runs each\n")
    print("| query | floor_s | median_s | best_s | ratio | verdict |")
    print("|---|---|---|---|---|---|")
    ok, ratios = True, []
    for name in names:
        b = best.get(name)
        floor = sweep(spark, name, runs, b)
        if b is not None:
            ratios.append(floor / b)
            ok = ok and floor <= 1.3 * b
    if gauge_mode and ratios:
        g = sum(ratios) / len(ratios)
        print(f"\nhost gauge (mean floor/best over {len(ratios)} stable "
              f"queries): {g:.2f}x "
              f"({'CALM — safe to re-pin floors' if g <= 1.1 else 'SLOW — treat per-query flags as weather'})")
        return 0
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
