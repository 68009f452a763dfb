#!/usr/bin/env python
"""sf1 CORRECTNESS, not just sf1 wall-time (VERDICT r10 stretch ask
#7): the sf1 rehearsal pins seconds at 10x; this pins HASHES — the
five heaviest specs run against the same 10x replica tables with
their DuckDB oracles replayed on identical data, so the driver-style
value compare (columns sorted, rows sorted, exact values) holds at a
scale the driver never samples.

Specs are compared one at a time; the DuckDB replay is bounded
(and in practice fast — it parallelizes its own pipelines).

Appends one table to docs/SCALING.md (idempotent marker splice).
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

SPECS = ("cur1_curation_pass", "cur2_cut_select_export",
         "es2_span_removal", "dd2_minhash_lsh_dedup",
         "dsir1_importance_selection")
MARKER = "\n## r11 appendix: sf1 correctness (hash-match at 10x)"


def main() -> int:
    import duckdb

    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare
    from sf1_rehearsal import synthesize

    spark = get_spark("sf1-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="sf1_correctness_")
    big_dir = os.path.join(tmp, "sf1")
    os.makedirs(big_dir, exist_ok=True)
    rows = []
    failed = []
    try:
        t0 = time.perf_counter()
        synthesize(spark, big_dir)
        print(f"synthesized 10x tables in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        con = duckdb.connect()
        for t in TABLES:
            # Spark-written replicas are DIRECTORIES of part files
            pat = os.path.join(big_dir, f"{t}.parquet", "*.parquet")
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{pat}')")
        for name in SPECS:
            spec = SPEC_BY_NAME[name]
            t0 = time.perf_counter()
            try:
                compare(spark, con, spec, big_dir)
                status = "match"
            except Exception as exc:  # noqa: BLE001
                status = f"FAIL: {str(exc)[:200]}"
                failed.append(name)
            dt = time.perf_counter() - t0
            n = spec.build(spark, big_dir).count()
            rows.append((name, n, status, dt))
            print(f"{name}: {status} ({n} rows, {dt:.0f}s)", flush=True)
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        "The five heaviest specs hash-compared against their DuckDB "
        "oracles on the full 10x replica tables (sf1-rehearsal "
        "synthesis: content-distinct word-salted documents, rolled "
        "embeddings, keys offset together) — the driver-style exact "
        "value compare, at a scale the driver never samples.  Wall "
        "time covers synthesis-read + both engines on identical "
        "data.",
        "",
        "| spec | result rows @ sf1 | hash compare | wall s |",
        "|---|---|---|---|",
    ]
    for name, n, status, dt in rows:
        lines.append(f"| {name} | {n:,} | {status} | {dt:.0f} |")
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
