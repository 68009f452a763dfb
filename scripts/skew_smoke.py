#!/usr/bin/env python
"""Skew demonstration at bench scale (round-5 VERDICT ask #6).

Two experiments at sf0.1, each comparing a UNIFORM key distribution
against a pathological one where a single hot key carries 90% of rows:

1. hot-key JOIN: fact rows keyed 90/10 onto one mega key, joined to a
   small dimension — plain AQE join vs ``operators.skew.salted_join``.
2. mega-subject REGISTRATION: ``register_batch`` (declarative NONE mode,
   native fingerprints) with 90% of the incoming batch hitting ONE
   subject vs spread over 50 subjects.

The claim being evidenced: with AQE skew handling + the explicit salting
fallback, the skewed case stays within 2x of the uniform case — i.e. one
mega-subject cannot stall the 100 TB pipeline on a single straggler
task.  Appends the results table to docs/SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.catalog import load_table  # noqa: E402
from axonops_schema_registry_spark.operators.skew import salted_join  # noqa: E402
from axonops_schema_registry_spark.registry.registration import (  # noqa: E402
    register_batch,
)
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def keyed_fact(spark, skewed: bool):
    li = load_table(spark, SF_DIR, "lineitem")
    if skewed:
        # 90% of rows on key 0, the rest uniform over 1..1000
        key = (F.when(F.rand(7) < 0.9, F.lit(0))
               .otherwise((F.col("l_orderkey") % 1000 + 1)))
    else:
        key = F.col("l_orderkey") % 1001
    return li.withColumn("k", key.cast("long"))


def main() -> None:
    spark = get_spark("axonops-skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    dim = (spark.range(0, 1001).withColumnRenamed("id", "k")
           .withColumn("attr", (F.col("k") * 13 % 97).cast("long")))
    dim.cache().count()

    fact_u = keyed_fact(spark, skewed=False).cache()
    fact_s = keyed_fact(spark, skewed=True).cache()
    fact_u.count(), fact_s.count()

    agg = lambda df: df.groupBy("attr").agg(  # noqa: E731
        F.count(F.lit(1)), F.sum("l_quantity")).collect()

    # Emulate the 100 TB shape: the dimension is too big to broadcast, so
    # the join is a shuffle (sort-merge) join and the hot key's partition
    # lands on ONE task.  (With broadcast allowed, a tiny dim makes skew
    # a non-event — that's the first line of defense, but not the case
    # salting exists for.)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    skew_split = "spark.sql.adaptive.skewJoin.enabled"
    try:
        spark.conf.set(skew_split, "true")
        t_join_uniform = timed(lambda: agg(fact_u.join(dim, "k")))
        t_join_skew_aqe = timed(lambda: agg(fact_s.join(dim, "k")))
        # pathological baseline: no AQE skew split, no salting — the hot
        # partition serializes on one task
        spark.conf.set(skew_split, "false")
        t_join_skew_plain = timed(lambda: agg(fact_s.join(dim, "k")))
        t_join_skew_salted = timed(
            lambda: agg(salted_join(fact_s, dim, "k")))
    finally:
        spark.conf.set(skew_split, "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # --- registration: mega-subject vs uniform subjects ------------------
    docs = load_table(spark, SF_DIR, "documents")
    existing = spark.createDataFrame(
        [], "subject string, version int, schema_type string, "
            "schema_text string, deleted boolean")

    def incoming(skewed: bool):
        if skewed:
            subject = (F.when(F.rand(11) < 0.9, F.lit("mega-subject"))
                       .otherwise(F.concat(F.lit("s"),
                                           (F.col("doc_id") % 50)
                                           .cast("string"))))
        else:
            subject = F.concat(F.lit("s"),
                               (F.col("doc_id") % 50).cast("string"))
        return docs.select(subject.alias("subject"),
                           F.col("doc_id").alias("seq"),
                           F.lit("RAW").alias("schema_type"),
                           F.col("text").alias("schema_text"))

    inc_u = incoming(False).cache()
    inc_s = incoming(True).cache()
    inc_u.count(), inc_s.count()

    def reg(inc):
        register_batch(spark, existing, inc, mode="NONE",
                       native_fingerprint=True).collect()

    t_reg_uniform = timed(lambda: reg(inc_u))
    t_reg_skew = timed(lambda: reg(inc_s))

    j_aqe_ratio = t_join_skew_aqe / t_join_uniform
    j_salt_ratio = t_join_skew_salted / t_join_uniform
    j_plain_ratio = t_join_skew_plain / t_join_uniform
    r_ratio = t_reg_skew / t_reg_uniform
    lines = [
        "",
        "## Skew: one hot key carrying 90% of rows (sf0.1)",
        "",
        "90/10 skew onto a single key, min of "
        f"{N_RUNS} runs.  Joins run with broadcast DISABLED (emulating a "
        "dimension too big to broadcast at 100 TB) so the shuffle join "
        "actually exposes the hot partition.  Acceptance: the two "
        "mitigations (AQE skew split, salted_join) stay within 2x of "
        "uniform.",
        "",
        "| experiment | uniform s | skewed s | ratio |",
        "|---|---|---|---|",
        f"| shuffle join+agg, AQE skew split ON | {t_join_uniform:.2f} "
        f"| {t_join_skew_aqe:.2f} | {j_aqe_ratio:.2f} |",
        f"| shuffle join+agg, NO mitigation | {t_join_uniform:.2f} "
        f"| {t_join_skew_plain:.2f} | {j_plain_ratio:.2f} |",
        f"| shuffle join+agg, salted_join (skew split off) "
        f"| {t_join_uniform:.2f} "
        f"| {t_join_skew_salted:.2f} | {j_salt_ratio:.2f} |",
        f"| register_batch NONE-mode, mega-subject | {t_reg_uniform:.2f} "
        f"| {t_reg_skew:.2f} | {r_ratio:.2f} |",
        "",
        "AQE's runtime skew-join split is the production default; "
        "`salted_join` is the explicit fallback for a hot key whose "
        "matched rows exceed one executor's memory (it must beat the "
        "NO-mitigation row, not the uniform broadcast case).  The "
        "NONE-mode registration plan is window+join over (subject, "
        "fingerprint) — the mega-subject partitions by fingerprint "
        "inside the window, so the hot subject spreads across tasks.",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SCALING.md")
    with open(path) as fh:
        content = fh.read()
    marker = "\n## Skew: one hot key"
    if marker in content:
        content = content[:content.index(marker)]
    with open(path, "w") as fh:
        fh.write(content + "\n".join(lines) + "\n")
    print("\n".join(lines))
    ok = j_aqe_ratio < 2 and r_ratio < 2 \
        and t_join_skew_salted < max(t_join_skew_plain, t_join_uniform * 2)
    print(f"\nacceptance (mitigations within 2x, salted beats "
          f"unmitigated): {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
