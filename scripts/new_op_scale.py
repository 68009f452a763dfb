#!/usr/bin/env python
"""Generic new-operator scale protocol: sf1 hash-pin vs the DuckDB
oracle + 1x/4x/10x per-row decomposition, appended to docs/SCALING.md
under a marker derived from the spec names.  Usage:

    python scripts/new_op_scale.py <spec> [<spec> ...]

Replaces the per-round copy-pasted r1N_*_scale.py scripts (those stay
as the record of what ran).  Exit 0 iff every sf1 pin matches and
every r(10) <= 0.8.  Oracle-less specs get a rows-only sf1 run (the
driver's own weaker check) — noted in the appended table.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTORS = (1, 4, 10)


def main(names: list[str]) -> int:
    import duckdb

    from scale_smoke_r12 import synthesize as synth_docs
    from sf1_rehearsal import synthesize as synth_full

    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare

    assert names, "pass at least one spec name"
    marker = ("\n## scale appendix: " + "/".join(n.split("_")[0]
                                                 for n in names)
              + " sf1 pins + per-row decomposition")
    spark = get_spark("new-op-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # codegen warm-up
        SPEC_BY_NAME[name].build(spark, "/root/testdata/sf0.001") \
            .collect()

    failed = []
    pins = []
    times: dict[str, dict[int, float]] = {n: {} for n in names}
    tmp = tempfile.mkdtemp(prefix="new_op_scale_")
    try:
        big_dir = os.path.join(tmp, "sf1")
        os.makedirs(big_dir, exist_ok=True)
        synth_full(spark, big_dir)
        con = duckdb.connect()
        for t in TABLES:
            pat = os.path.join(big_dir, f"{t}.parquet", "*.parquet")
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{pat}')")
        for name in names:
            spec = SPEC_BY_NAME[name]
            t0 = time.perf_counter()
            try:
                if spec.oracle is not None:
                    compare(spark, con, spec, big_dir)
                    status = "match"
                else:
                    status = "rows-only (no oracle by design)"
            except Exception as exc:  # noqa: BLE001
                status = f"FAIL: {str(exc)[:200]}"
                failed.append(f"{name} sf1 pin")
            wall = time.perf_counter() - t0
            n_rows = spec.build(spark, big_dir).count()
            pins.append((name, n_rows, status, wall))
            print(f"{name} sf1 pin: {status} ({n_rows} rows, "
                  f"{wall:.0f}s)", flush=True)
        con.close()
        shutil.rmtree(big_dir, ignore_errors=True)

        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synth_docs(spark, d, k)
            for name in names:
                best = float("inf")
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    SPEC_BY_NAME[name].build(spark, d).collect()
                    best = min(best, time.perf_counter() - t0)
                times[name][k] = best
                print(f"{name} @ {k}x: {best:.2f}s", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    for name in names:
        r10 = times[name][10] / (10 * times[name][1])
        if r10 > 0.8:
            failed.append(f"{name} r(10)={r10:.2f} > 0.8")

    lines = [
        "", marker.strip(), "",
        "Standard new-operator protocol (sf1 answers + per-row rows; "
        "content-distinct replicas, min-of-3, r(k) = t(k)/(k·t(1))).",
        "", "| check | result | wall s |", "|---|---|---|",
    ]
    for name, n, status, wall in pins:
        lines.append(f"| {name} sf1 | {status} ({n:,} rows) "
                     f"| {wall:.0f} |")
    lines += ["", "| query | 1x s | 4x s | 10x s | r(4) | r(10) |",
              "|---|---|---|---|---|---|"]
    for name in names:
        t = times[name]
        lines.append(f"| {name} | {t[1]:.2f} | {t[4]:.2f} | "
                     f"{t[10]:.2f} | {t[4] / (4 * t[1]):.2f} | "
                     f"{t[10] / (10 * t[1]):.2f} |")
    path = os.path.join(ROOT, "docs", "SCALING.md")
    with open(path) as fh:
        content = fh.read()
    if marker in content:
        head, _, rest = content.partition(marker)
        nxt = rest.find("\n## ")
        content = head + (rest[nxt:] if nxt >= 0 else "")
    with open(path, "w") as fh:
        fh.write(content.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("appended to docs/SCALING.md")
    if failed:
        print("FAILED:", failed)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
