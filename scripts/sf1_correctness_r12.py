#!/usr/bin/env python
"""sf1 correctness for the operators NEW in round 11 (VERDICT r11 ask
#5): the four oracle-checked specs (es3, dd8, mix3, vg1) hash-compared
against their DuckDB oracles on the full 10x replica tables, plus the
two bench-only scale forms re-pinned AT sf1:

- es1h ≡ es1: exact row-set equality at 10x, checked distributed
  (exceptAll both ways + equal counts — no driver collect).
- dd6b at 10x runs ABOVE the bit floor (recommended_lsh_bits(50k) >
  dd6's literal 5), so equality to dd6 no longer applies — the sf1
  pin is the precision contract instead: every emitted pair's cosine,
  recomputed from the vectors, is >= the threshold (precision 1.0;
  recall is the documented LSH trade).

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

ORACLED = ("es3_decontamination_cut", "dd8_quality_representatives",
           "mix3_temperature_mixture", "vg1_vocab_growth",
           # the r12 operators, covered in the same pass
           "ng1_ngram_novelty", "qn1_robust_length_normalization",
           "out1_embedding_outliers", "cap1_cluster_cap_sampling",
           "ppl2_bigram_perplexity", "split1_dataset_split",
           "cur3_quality_dedup_split", "ctm4_split_leakage")
MARKER = "\n## r12 appendix: sf1 correctness for the r11 + r12 operators"


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from axonops_schema_registry_spark.catalog import load_table
    from axonops_schema_registry_spark.llm.similarity import (
        recommended_lsh_bits,
    )
    from axonops_schema_registry_spark.queries import SPEC_BY_NAME
    from axonops_schema_registry_spark.session import get_spark
    from oracle_harness import TABLES, compare
    from sf1_rehearsal import synthesize

    spark = get_spark("sf1-correctness-r12")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="sf1_corr_r12_")
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

        # es1h ≡ es1 at 10x, distributed set equality
        t0 = time.perf_counter()
        es1 = SPEC_BY_NAME["es1_exact_substring_spans"].build(
            spark, big_dir)
        es1h = SPEC_BY_NAME["es1h_exact_substring_spans_hashed"].build(
            spark, big_dir)
        n1, n2 = es1.count(), es1h.count()
        equal = (n1 == n2 and es1.exceptAll(es1h).isEmpty()
                 and es1h.exceptAll(es1).isEmpty())
        status = "match" if equal else "FAIL: row sets differ"
        if not equal:
            failed.append("es1h≡es1")
        rows.append(("es1h ≡ es1 (row-set equality)", n2, status,
                     time.perf_counter() - t0))
        print(f"es1h≡es1 @10x: {status} ({n1} vs {n2} rows)",
              flush=True)

        # dd6b precision at 10x: above the bit floor, every emitted
        # pair must still be a true pair
        t0 = time.perf_counter()
        n_vec = load_table(spark, big_dir, "embeddings").count()
        bits = recommended_lsh_bits(n_vec)
        assert bits > 5, "10x corpus should sit above the bit floor"
        pairs = SPEC_BY_NAME["dd6b_embedding_cosine_dedup_scaled"] \
            .build(spark, big_dir)
        emb = load_table(spark, big_dir, "embeddings").select(
            F.col("vec_id").alias("id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            .alias("ev"))
        pa = emb.select(F.col("id").alias("id_a"),
                        F.col("ev").alias("ea"))
        pb = emb.select(F.col("id").alias("id_b"),
                        F.col("ev").alias("eb"))
        dot = F.expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), "
                     "CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)")
        na = F.sqrt(F.expr("aggregate(transform(ea, x -> x * x), "
                           "CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"))
        nb = F.sqrt(F.expr("aggregate(transform(eb, x -> x * x), "
                           "CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"))
        chk = (pairs.join(pa, "id_a").join(pb, "id_b")
               .select(F.round(dot / (na * nb), 4).alias("c"),
                       "cosine_sim"))
        bad = chk.filter((F.col("c") < 0.4)
                         | (F.col("c") != F.col("cosine_sim"))).count()
        npairs = pairs.count()
        status = ("match" if bad == 0 and npairs > 0
                  else f"FAIL: {bad} bad of {npairs}")
        if status != "match":
            failed.append("dd6b precision")
        rows.append((f"dd6b precision @ {bits} bits (true pairs only)",
                     npairs, status, time.perf_counter() - t0))
        print(f"dd6b precision @10x ({bits} bits): {status} "
              f"({npairs} pairs)", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lines = [
        "",
        MARKER.strip(),
        "",
        "The r11 AND r12 operators hash-compared against their DuckDB "
        "oracles "
        "on the full 10x replica tables (same synthesis as the r11 "
        "appendix), plus the bench-only scale forms re-pinned at 10x: "
        "es1h's row set equals es1's (distributed exceptAll, no "
        "collect); dd6b runs above the bit floor at this corpus size, "
        "so its sf1 pin is precision — every emitted pair recomputes "
        "to cosine >= threshold with the spec's own rounded value.",
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
