#!/usr/bin/env python
"""sf1 correctness + per-row decomposition for ln2_line_decontamination
(added late in round 14; same protocol as r14_ln1_kd1_scale.py).

ln2's oracle replay is exact: deterministic fixed-width segmentation
plus a block-membership anti-filter against the eval slice — no
recall caveat.  Both corpora segment row-locally off their scans and
the eval block set is one distinct over the small slice; sub-linear
per-row is the bar.

Appends one section to docs/SCALING.md (idempotent marker splice).
Exit 0 iff the sf1 pin matches and r(10) <= 0.8.
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

MARKER = "\n## r14 appendix: ln2 sf1 hash-pin + per-row decomposition"
NAME = "ln2_line_decontamination"
FACTORS = (1, 4, 10)


def main() -> int:
    import duckdb

    from scale_smoke_r12 import synthesize as synth_docs
    from sf1_rehearsal import synthesize as synth_full

    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare

    spark = get_spark("r14-ln2-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spec = SPEC_BY_NAME[NAME]
    spec.build(spark, "/root/testdata/sf0.001").collect()  # warm-up

    failed = []
    times: dict[int, float] = {}
    tmp = tempfile.mkdtemp(prefix="r14_ln2_")
    try:
        big_dir = os.path.join(tmp, "sf1")
        os.makedirs(big_dir, exist_ok=True)
        t0 = time.perf_counter()
        synth_full(spark, big_dir)
        print(f"synthesized 10x full tables in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        con = duckdb.connect()
        for t in TABLES:
            pat = os.path.join(big_dir, f"{t}.parquet", "*.parquet")
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{pat}')")
        t0 = time.perf_counter()
        try:
            compare(spark, con, spec, big_dir)
            status = "match"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {str(exc)[:200]}"
            failed.append("ln2 sf1 pin")
        wall = time.perf_counter() - t0
        n_rows = spec.build(spark, big_dir).count()
        print(f"{NAME} sf1 pin: {status} ({n_rows} rows, "
              f"{wall:.0f}s spark+oracle)", flush=True)
        con.close()
        shutil.rmtree(big_dir, ignore_errors=True)

        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synth_docs(spark, d, k)
            best = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                spec.build(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            print(f"{NAME} @ {k}x: {best:.2f}s", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    r10 = times[10] / (10 * times[1])
    if r10 > 0.8:
        failed.append(f"r(10)={r10:.2f} > 0.8")

    lines = [
        "",
        MARKER.strip(),
        "",
        "Same protocol as the ln1/kd1 section.  ln2's oracle replay is "
        "exact (deterministic segmentation + eval block membership — "
        "no recall caveat).",
        "",
        "| check | result | wall s |",
        "|---|---|---|",
        f"| {NAME} sf1 hash-pin | {status} ({n_rows:,} rows) "
        f"| {wall:.0f} |",
        "",
        "| query | 1x s | 4x s | 10x s | r(4) | r(10) |",
        "|---|---|---|---|---|---|",
        f"| {NAME} | {times[1]:.2f} | {times[4]:.2f} | "
        f"{times[10]:.2f} | {times[4] / (4 * times[1]):.2f} | "
        f"{times[10] / (10 * times[1]):.2f} |",
    ]
    path = os.path.join(ROOT, "docs", "SCALING.md")
    with open(path) as fh:
        content = fh.read()
    if MARKER in content:
        head, _, rest = content.partition(MARKER)
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
    sys.exit(main())
