#!/usr/bin/env python
"""sf1 correctness for round 13: every spec NEW or CHANGED this round
hash-compared against its DuckDB oracle on the full 10x replica
tables —

- mix4_exact_budget_quotas (new): the largest-remainder top-up path.
- tx5_dataset_card: plan rewritten (token stats off the scan, slim
  dup join) — values must be unchanged.
- ctm4_split_leakage: refactored onto the shared split_leakage_flags.
- cap1_cluster_cap_sampling: flag now derived from CAP1_K.
- dd8_quality_representatives: ORACLE rewritten (materialized CTEs +
  window cluster_size, VERDICT r12 ask #8) — same values, and the
  oracle-side wall must drop from the r12 appendix's 98 s to keep
  the sf1 sweep a per-round habit.

Plus the measurement half of the ctm4 bloom escalation (ask #7): at a
30% test split — the too-big-to-broadcast scenario — the bloom path
must emit flags identical to the exact broadcast path at sf1, both
walls reported.

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

ORACLED = ("mix4_exact_budget_quotas", "tx5_dataset_card",
           "ctm4_split_leakage", "cap1_cluster_cap_sampling",
           "dd8_quality_representatives")
MARKER = ("\n## r13 appendix: sf1 correctness for the r13-changed "
          "operators + ctm4 bloom escalation")


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from axonops_schema_registry_spark.catalog import load_table
    from axonops_schema_registry_spark.llm.contamination import (
        split_leakage_flags,
    )
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare
    from sf1_rehearsal import synthesize

    spark = get_spark("sf1-correctness-r13")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="sf1_corr_r13_")
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
            pat = os.path.join(big_dir, f"{t}.parquet", "*.parquet")
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{pat}')")
        for name in ORACLED:
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

        # ctm4 bloom escalation at sf1, 30% test split: flags from the
        # bloom-prefilter path must equal the exact broadcast path
        docs = load_table(spark, big_dir, "documents")
        lab = (docs.withColumn(
            "split", F.when(F.col("doc_id") % 10 < 3, "test")
            .otherwise("train"))
            .localCheckpoint(eager=True))  # same input to both paths
        def force(df):
            # a bare count() lets Catalyst eliminate the left join
            # (aggregated keys are unique, cardinality preserved) —
            # hash every column so the wall measures the real audit
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*df.columns)).alias("h")).first()
            return r.n

        t0 = time.perf_counter()
        exact = split_leakage_flags(lab)
        n_exact = force(exact)
        t_exact = time.perf_counter() - t0
        t0 = time.perf_counter()
        bloom = split_leakage_flags(lab, broadcast_threshold=1000)
        n_bloom = force(bloom)
        t_bloom = time.perf_counter() - t0
        equal = (n_exact == n_bloom
                 and exact.exceptAll(bloom).isEmpty()
                 and bloom.exceptAll(exact).isEmpty())
        status = "match" if equal else "FAIL: flags differ"
        if not equal:
            failed.append("ctm4 bloom≡broadcast")
        rows.append((f"ctm4 bloom ≡ broadcast @30% test split "
                     f"(exact {t_exact:.0f}s, bloom {t_bloom:.0f}s)",
                     n_bloom, status, t_exact + t_bloom))
        print(f"ctm4 bloom≡broadcast @sf1: {status} "
              f"({n_exact} vs {n_bloom} rows; exact {t_exact:.0f}s, "
              f"bloom {t_bloom:.0f}s)", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        "Every spec new or changed in r13 hash-compared against its "
        "DuckDB oracle on the full 10x replica tables (same synthesis "
        "as the r11/r12 appendices).  dd8's wall is dominated by the "
        "ORACLE side — its r13 rewrite (materialized CTEs, window "
        "cluster_size instead of a correlated per-row subquery; the "
        "bpe2 lesson) is what the r12 98 s row is compared against.  "
        "The ctm4 row is the implemented bloom escalation at a 30% "
        "test split: identical flags, walls for both paths.",
        "",
        "| check | result rows @ sf1 | verdict | wall s |",
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
