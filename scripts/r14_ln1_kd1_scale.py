#!/usr/bin/env python
"""sf1 correctness + per-row decomposition for the two operators added
LATE in round 14 (same protocol as scripts/r14_new_ops_scale.py):

  * ln1_line_dedup — CCNet keep-first block dedup.  Oracle replay is
    exact (deterministic segmentation + keep-first election — no
    banding, no recall caveat).  Block-keyed election + join + one
    doc-keyed reassembly: sub-linear per-row is the bar.
  * kd1_key_skew_profile — 8-gram join-key skew diagnostic.  One
    corpus scan into a gram-keyed count (lazily checkpointed),
    distributed top-k after; exact integer ppm replays in DuckDB.

Appends one section to docs/SCALING.md (idempotent marker splice).
Exit 0 iff both sf1 pins match and both r(10) <= 0.8.
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

MARKER = "\n## r14 appendix: ln1/kd1 sf1 hash-pins + per-row decomposition"
NAMES = ("ln1_line_dedup", "kd1_key_skew_profile")
FACTORS = (1, 4, 10)


def main() -> int:
    import duckdb

    from scale_smoke_r12 import synthesize as synth_docs
    from sf1_rehearsal import synthesize as synth_full

    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare

    spark = get_spark("r14-ln1-kd1-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for name in NAMES:  # codegen warm-up
        SPEC_BY_NAME[name].build(spark, "/root/testdata/sf0.001") \
            .collect()

    failed = []
    pins = []
    times: dict[str, dict[int, float]] = {n: {} for n in NAMES}
    tmp = tempfile.mkdtemp(prefix="r14_ln1_kd1_")
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
        for name in NAMES:
            spec = SPEC_BY_NAME[name]
            t0 = time.perf_counter()
            try:
                compare(spark, con, spec, big_dir)
                status = "match"
            except Exception as exc:  # noqa: BLE001
                status = f"FAIL: {str(exc)[:200]}"
                failed.append(f"{name} sf1 pin")
            wall = time.perf_counter() - t0
            n_rows = spec.build(spark, big_dir).count()
            pins.append((name, n_rows, status, wall))
            print(f"{name} sf1 pin: {status} ({n_rows} rows, "
                  f"{wall:.0f}s spark+oracle)", flush=True)
        con.close()
        shutil.rmtree(big_dir, ignore_errors=True)

        for k in FACTORS:
            d = os.path.join(tmp, f"x{k}")
            synth_docs(spark, d, k)
            for name in NAMES:
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

    for name in NAMES:
        r10 = times[name][10] / (10 * times[name][1])
        if r10 > 0.8:
            failed.append(f"{name} r(10)={r10:.2f} > 0.8")

    lines = [
        "",
        MARKER.strip(),
        "",
        "Same protocol as the nn5/ctm6 section for the two specs "
        "added later in the round.  ln1's oracle replay is exact "
        "(deterministic segmentation, keep-first election — no "
        "recall caveat); kd1's integer ppm replays exactly.  "
        "Per-row protocol: content-distinct replicas, min-of-3, "
        "r(k) = t(k)/(k·t(1)).",
        "",
        "| check | result | wall s |",
        "|---|---|---|",
    ]
    for name, n, status, wall in pins:
        lines.append(f"| {name} sf1 hash-pin | {status} "
                     f"({n:,} rows) | {wall:.0f} |")
    lines += [
        "",
        "| query | 1x s | 4x s | 10x s | r(4) | r(10) |",
        "|---|---|---|---|---|---|",
    ]
    for name in NAMES:
        t = times[name]
        lines.append(f"| {name} | {t[1]:.2f} | {t[4]:.2f} | "
                     f"{t[10]:.2f} | {t[4] / (4 * t[1]):.2f} | "
                     f"{t[10] / (10 * t[1]):.2f} |")
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
