#!/usr/bin/env python
"""sf1 headline rehearsal (VERDICT r9 stretch ask #8): the closest
in-sandbox answer to "would this survive a 10x scale-up?" the bench
can otherwise give.

Synthesizes a ~10x replica of the sf0.1 tables into a temp dir using
the scale_smoke salting pattern — fact tables replicated with
consistently OFFSET join keys (orders.o_orderkey and
lineitem.l_orderkey move together, and likewise custkey / partkey /
suppkey, so every join keeps its selectivity), region/nation kept
fixed (TPC-H's own scaling rule) — then runs every bench-tagged query
at BOTH scales in one session and appends the per-query sf1/sf0.1
ratio table to docs/SCALING.md.

Replicas are content-distinct in SHINGLE and EMBEDDING space, the r7
composition-smoke pattern: every document WORD is salted per copy (a
suffix-only salt leaves copies sharing ~all shingles, so shingle df
grows with k and pair volume with k² — a TRUE dup-density increase,
the regime `dup_smoke*.py` measures separately, not an engine
property), and embedding copies are ROLLED so cross-copy cosine ~1
pairs don't exist.  What remains is the engine-linearity question
this rehearsal exists to answer.

A ratio near 10/~32-core-saturation means linear; anything clearly
super-linear is the scale bug this rehearsal exists to find.
Acceptance: no query above 2x the ideal linear ratio.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark import queries as q  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_SF1_FACTOR", "10"))
OFF = 1_000_000_000
MARKER = ("\n## sf1 headline rehearsal (refreshed r11: 10x sf0.1, "
          "full bench set incl. the scale-form variants)")

#: per-table key columns that must move TOGETHER across replicas so
#: join selectivity is preserved; region/nation stay single-copy
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ("region", "nation")


def synthesize(spark, out_dir: str) -> None:
    for name in FIXED:
        (spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"{name}.parquet")))
    for name, keys in KEYED.items():
        src = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        copies = []
        for i in range(K):
            c = src
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFF))
            if name == "documents" and i > 0:
                # salt EVERY word so copies share no shingles
                c = c.withColumn(
                    "text", F.expr(
                        f"array_join(transform(split(text, ' '), "
                        f"w -> concat(w, '_s{i}')), ' ')"))
            if name == "embeddings" and i > 0:
                # roll the vector so cross-copy cosine ~1 pairs vanish
                dim = 64
                c = c.withColumn(
                    "embedding", F.expr(
                        f"concat(slice(embedding, {i + 1}, "
                        f"{dim - i}), slice(embedding, 1, {i}))"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        (out.repartition(32).write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"{name}.parquet")))


def main() -> None:
    spark = get_spark("sf1-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # "sf1" in the dir name so catalog/bench scale parsing reads 1.0
    tmp = tempfile.mkdtemp(prefix="sf1_rehearsal_")
    big_dir = os.path.join(tmp, "sf1")
    os.makedirs(big_dir, exist_ok=True)
    try:
        t0 = time.perf_counter()
        synthesize(spark, big_dir)
        print(f"synthesized {K}x tables in "
              f"{time.perf_counter() - t0:.0f}s -> {big_dir}",
              flush=True)

        specs = q.bench_specs()
        for spec in specs:  # codegen warm-up at smoke scale
            try:
                spec.build(spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass

        def timed(spec, sf_dir, runs) -> float:
            best = float("inf")
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                spec.build(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            return best

        rows = []
        for spec in specs:
            t_small = timed(spec, SF_DIR, 2)
            t_big = timed(spec, big_dir, 1)
            rows.append((spec.name, t_small, t_big))
            print(f"{spec.name}: sf0.1={t_small:.2f}s "
                  f"sf1={t_big:.2f}s ({t_big / t_small:.1f}x)",
                  flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    tot_small = sum(r[1] for r in rows)
    tot_big = sum(r[2] for r in rows)
    lines = [
        "",
        MARKER.strip(),
        "",
        f"{K}x key-offset replicas of every sf0.1 fact table "
        "(region/nation fixed, join keys moved together so every join "
        "keeps its selectivity; documents word-salted so copies share "
        "no shingles, embeddings rolled so cross-copy cosine pairs "
        "don't exist — true-dup density held constant, the regime "
        "dup_smoke*.py measures separately), full bench set, one "
        "session, min-of-2 at sf0.1 vs single run at sf1.  Ideal "
        "linear ratio is ~10x MINUS whatever headroom the 32 local "
        "cores had left at sf0.1 (small queries under-utilize them, "
        "so sub-10x ratios are expected); ratios WELL ABOVE 10x flag "
        "super-linear work.",
        "",
        "| query | sf0.1 s | sf1 s | ratio |",
        "|---|---|---|---|",
    ]
    flagged = []
    for name, t_small, t_big in rows:
        r = t_big / t_small
        mark = " ⚠" if r > 20 else ""
        if r > 20:
            flagged.append(name)
        lines.append(f"| {name} | {t_small:.2f} | {t_big:.2f} | "
                     f"{r:.1f}x{mark} |")
    lines += [
        f"| **total** | **{tot_small:.2f}** | **{tot_big:.2f}** | "
        f"**{tot_big / tot_small:.1f}x** |",
    ]
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
    print(f"acceptance (no query > 2x ideal linear, i.e. 20x): "
          f"{'PASS' if not flagged else 'FAIL ' + str(flagged)}")
    sys.exit(0 if not flagged else 1)


if __name__ == "__main__":
    main()
