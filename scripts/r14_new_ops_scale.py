#!/usr/bin/env python
"""sf1 correctness + per-row decomposition for the operators NEW in
round 14 — the repo's own protocol (sf1 answers for every new
operator's round; ctm5 was flagged in r13 for shipping without one):

  * nn5_multiprobe_lsh_topk — multi-probe LSH ANN.  Oracle replay is
    exact (integer XOR probes + the portable plane construction), so
    the sf1 pin has no recall caveat.  Per-row: probes are query-side
    (constant per query); candidate volume grows with bucket
    occupancy, i.e. linearly with the corpus — sub-linear per-row is
    the bar.
  * ctm6_contamination_report — per-source roll-up of the ctm4+ctm5
    audits.  Inherits ctm5's oracle banding-recall dependency (both
    docstrings note it); the 10x replicas are word-salted so recall
    stays off the threshold margin.  Composes the same banded-LSH
    pass as ctm5 (r14: ctm5 r(10) = 0.42), so r(10) <= ~0.6 is the
    bar.
  * zf1_zipf_diagnostics — per-source Zipf rank-frequency OLS.  One
    corpus scan into a vocab-bounded count aggregate (lazily
    checkpointed), windows over vocab-sized data after; the
    word-salted copies multiply vocabulary 10x but token MASS only
    10x too, so sub-linear per-row is the bar.  The ln() micro-unit
    margins are swept separately (test + scripts/r14_ulp_margin.py).
  * ev4_multiprobe_recall — recall@5 of nn5 vs the exact baseline.
    Composes nn5 with nn1's exact top-k; nn1's oracle side is the
    documented all-pairs baseline (10 queries x corpus), so the sf1
    pin also exercises the eval composition at 50k vectors.

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

MARKER = "\n## r14 appendix: nn5/ctm6 sf1 hash-pins + per-row decomposition"
NAMES = ("nn5_multiprobe_lsh_topk", "ctm6_contamination_report",
         "zf1_zipf_diagnostics", "ev4_multiprobe_recall")
FACTORS = (1, 4, 10)


def main() -> int:
    import duckdb

    from scale_smoke_r12 import synthesize as synth_docs
    from sf1_rehearsal import synthesize as synth_full

    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare

    spark = get_spark("r14-new-ops-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for name in NAMES:  # codegen warm-up
        SPEC_BY_NAME[name].build(spark, "/root/testdata/sf0.001") \
            .collect()

    failed = []
    pins = []
    times: dict[str, dict[int, float]] = {n: {} for n in NAMES}
    tmp = tempfile.mkdtemp(prefix="r14_new_ops_")
    try:
        # -- half 1: sf1 hash-pins against the DuckDB oracles
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

        # -- half 2: 1x/4x/10x per-row rows
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
        "The repo's per-round protocol for NEW operators (sf1 answers "
        "+ standard per-row rows — the gap ctm5 was flagged for in "
        "r13, closed in the same round this time).  nn5's oracle "
        "replay is exact (integer XOR probes); ctm6 inherits ctm5's "
        "banding-recall dependency, satisfied on the word-salted "
        "replicas.  Per-row protocol: content-distinct replicas, "
        "min-of-3, r(k) = t(k)/(k·t(1)).",
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
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
