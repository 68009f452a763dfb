#!/usr/bin/env python
"""ccn1 checkpoint experiment (the r14 cur1 lens applied to the new
capstone): ccn1 lazily checkpoints the GATED corpus — a full-text
frame — for its 3 consumers (lang count, line dedup, the 2-column
source re-attach).  The r14 cur1 experiment measured that
checkpointing TEXT-carrying frames can LOSE to pruned parquet
re-scans (the checkpoint serializes full rows where scans prune), so:
time the shipped shape against a no-gated-checkpoint variant that
recomputes the gate per consumer, min-of-7 each at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axonops_schema_registry_spark.queries import SPEC_BY_NAME  # noqa: E402
from axonops_schema_registry_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 7


def variant_no_gate_ckpt(spark, sf_dir):
    """ccn1 with the gated-corpus checkpoint REMOVED (every consumer
    recomputes the gate off the pruned scan); everything else
    identical."""
    from axonops_schema_registry_spark.catalog import load_table
    from axonops_schema_registry_spark.llm.dedup import line_dedup
    from axonops_schema_registry_spark.llm.sampling import (
        quality_filter_scores,
        token_budget_mixture,
    )
    from axonops_schema_registry_spark.llm.text import (
        normalize_text,
        perplexity_buckets,
        predict_lang,
    )

    docs = load_table(spark, sf_dir, "documents")
    srcs = (docs.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .localCheckpoint(eager=False))
    gated = (docs.filter(predict_lang("text") == "en")
             .select("doc_id", "source",
                     normalize_text("text").alias("text")))
    lang_c = gated.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lang"))
    ln = (line_dedup(gated, "doc_id", "text",
                     block_words=10, min_block_words=5)
          .select(F.col("id").alias("doc_id"), "n_removed",
                  "cleaned_text")
          .join(gated.select("doc_id", "source"), "doc_id")
          .localCheckpoint(eager=False))
    ded_c = ln.groupBy("source").agg(
        F.sum((F.col("cleaned_text") != "").cast("bigint"))
        .alias("n_dedup"),
        F.sum("n_removed").cast("bigint").alias("blocks_removed"))
    surv = (ln.filter(F.col("cleaned_text") != "")
            .select("doc_id", "source",
                    F.col("cleaned_text").alias("text")))
    pb = perplexity_buckets(surv)
    hm = (surv.join(pb.filter(F.col("bucket") <= 1)
                    .select("doc_id"), "doc_id")
          .localCheckpoint(eager=False))
    hm_c = hm.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_head_middle"))
    pos = hm.filter(F.col("source") == "src0").select("doc_id")
    top = (quality_filter_scores(hm, pos, n_buckets=4096)
           .orderBy(F.desc("score_micro"), "doc_id").limit(100)
           .select("doc_id").localCheckpoint(eager=False))
    qkept = hm.join(F.broadcast(top), "doc_id")
    q_c = qkept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_quality"))
    budgets = srcs.select("source").withColumn("token_budget",
                                               F.lit(120))
    manifest = token_budget_mixture(qkept, budgets)
    sel = (manifest.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_selected"),
                F.max("cum_tokens").alias("tokens_selected"),
                F.sum("doc_id").alias("id_checksum"),
                F.max("mix_rank").alias("max_rank")))
    out = srcs
    for frame in (lang_c, ded_c, hm_c, q_c, sel):
        out = out.join(frame, "source", "left")
    tail = ("n_lang", "n_dedup", "blocks_removed", "n_head_middle",
            "n_quality", "n_selected", "tokens_selected",
            "id_checksum", "max_rank")
    return (out.select(
        "source", "n_docs",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in tail])
        .orderBy("source"))


def main() -> int:
    spark = get_spark("ccn1-ckpt-exp")
    spark.sparkContext.setLogLevel("ERROR")

    def drop_persisted():
        for rdd in list(spark.sparkContext._jsc
                        .getPersistentRDDs().values()):
            rdd.unpersist(True)

    shipped = SPEC_BY_NAME["ccn1_ccnet_pipeline"].build
    variants = (("shipped (gated ckpt)", shipped),
                ("no gated ckpt", variant_no_gate_ckpt))
    # identical results first (an experiment that changes answers is
    # void)
    a = sorted(map(str, shipped(spark, SF).collect()))
    b = sorted(map(str, variant_no_gate_ckpt(spark, SF).collect()))
    assert a == b, "variant changed the answer — experiment void"
    print("results identical; timing...", flush=True)
    for label, fn in variants:
        fn(spark, "/root/testdata/sf0.001").collect()
        drop_persisted()
        fn(spark, SF).collect()  # warm
        times = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            drop_persisted()
            t0 = time.perf_counter()
            fn(spark, SF).collect()
            times.append(time.perf_counter() - t0)
        print(f"{label}: min {min(times):.2f}s "
              f"median {sorted(times)[len(times)//2]:.2f}s "
              f"max {max(times):.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
