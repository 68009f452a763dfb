#!/usr/bin/env python
"""VERDICT r13 ask #4: pin ctm5_split_near_leakage at sf1 and
decompose it — the one r13-changed operator that shipped without an
sf1 hash-pin or a scale-smoke row.

Two halves, one appendix:

1. **sf1 hash-pin**: ctm5 hash-compared against its DuckDB oracle on
   the full 10x replica tables (same synthesis as the r11/r12/r13
   sf1 appendices — word-salted content-distinct document copies, so
   banding recall stays off the threshold margin per the r13 planted-
   chain lesson).  The oracle's all-pairs ``inter`` CTE already has
   the dd8 materialization treatment (``toks AS MATERIALIZED``); its
   wall is reported so the per-round sf1 sweep budget stays visible.

2. **1x/4x/10x per-row decomposition** (standard protocol:
   content-distinct replicas, min-of-3, r(k) = t(k)/(k·t(1))).
   ctm5 composes minhash_lsh_pairs like dd2 (r13: dd2 r(10) = 0.60),
   so the bar from the verdict is r(10) <= ~0.6.

Appends one section to docs/SCALING.md (idempotent marker splice).
Exit 0 iff the sf1 hash matches and r(10) <= 0.8 (generous ceiling —
the ask's bar is ~0.6; anything near 1.0 would mean a super-linear
term hiding in the pair-set joins).
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

MARKER = "\n## r14 appendix: ctm5 sf1 hash-pin + per-row decomposition"
NAME = "ctm5_split_near_leakage"
FACTORS = (1, 4, 10)


def main() -> int:
    import duckdb

    from scale_smoke_r12 import synthesize as synth_docs
    from sf1_rehearsal import synthesize as synth_full

    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare

    spark = get_spark("ctm5-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spec = SPEC_BY_NAME[NAME]
    spec.build(spark, "/root/testdata/sf0.001").collect()  # codegen warm

    failed = []
    tmp = tempfile.mkdtemp(prefix="ctm5_scale_")
    try:
        # -- half 1: sf1 hash-pin against the DuckDB oracle
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
            pin_status = "match"
        except Exception as exc:  # noqa: BLE001
            pin_status = f"FAIL: {str(exc)[:200]}"
            failed.append("sf1 hash-pin")
        pin_wall = time.perf_counter() - t0
        n_rows = spec.build(spark, big_dir).count()
        con.close()
        print(f"sf1 pin: {pin_status} ({n_rows} rows, {pin_wall:.0f}s "
              "spark+oracle)", flush=True)
        shutil.rmtree(big_dir, ignore_errors=True)

        # -- half 2: 1x/4x/10x per-row rows
        times: dict[int, float] = {}
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

    r4 = times[4] / (4 * times[1])
    r10 = times[10] / (10 * times[1])
    if r10 > 0.8:
        failed.append(f"r(10)={r10:.2f} > 0.8")

    lines = [
        "",
        MARKER.strip(),
        "",
        "ctm5 was the only r13-changed operator without an sf1 pin "
        "(VERDICT r13 \"what's wrong\" #3).  Half 1: hash-compared "
        "against its DuckDB oracle on the full 10x replica tables "
        "(word-salted content-distinct copies — banding recall stays "
        "off the threshold margin, the documented oracle contract in "
        "the ctm5 docstring).  Half 2: the standard per-row protocol "
        "(min-of-3, r(k) = t(k)/(k·t(1))) on content-distinct "
        "document replicas; ctm5 composes minhash_lsh_pairs like dd2 "
        "(r13: dd2 r(10) = 0.60), so sub-linear rows were the bar.",
        "",
        "| check | result | wall s |",
        "|---|---|---|",
        f"| sf1 hash-pin vs DuckDB oracle | {pin_status} "
        f"({n_rows:,} rows) | {pin_wall:.0f} |",
        "",
        "| query | 1x s | 4x s | 10x s | r(4) | r(10) |",
        "|---|---|---|---|---|---|",
        f"| {NAME} | {times[1]:.2f} | {times[4]:.2f} | "
        f"{times[10]:.2f} | {r4:.2f} | {r10:.2f} |",
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
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
