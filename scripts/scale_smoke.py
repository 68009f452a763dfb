#!/usr/bin/env python
"""Empirical scaling smoke: replicate the fact tables k× (distinct keys)
and measure the headline plan shapes at 1x / 4x / 10x sf0.1 — evidence
that the scan+agg, star-join and window plans scale ~linearly in rows
(the property that carries to a 1000-executor cluster).

Writes docs/SCALING.md.  Usage: python scripts/scale_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.queries.base import dsum, psum
from axonops_schema_registry_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)


def replicate(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    """k distinct copies: shift every key column by i * 1e9 per copy."""
    if k == 1:
        return df
    copies = []
    for i in range(k):
        c = df
        for col in key_cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * 1_000_000_000))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def replicate_salted_docs(df: DataFrame, k: int) -> DataFrame:
    """k distinct copies of documents: ids shifted AND text salted per
    copy, so cross-copy near-dup pairs don't exist — true-pair volume
    stays linear and any super-linearity is the PLAN's fault."""
    if k == 1:
        return df
    copies = []
    for i in range(k):
        copies.append(df.withColumn("doc_id",
                                    F.col("doc_id") + F.lit(i * 1_000_000_000))
                      .withColumn("text", F.concat(F.col("text"),
                                                   F.lit(f" copysalt{i}"))))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    li0 = load_table(spark, SF_DIR, "lineitem")
    orders0 = load_table(spark, SF_DIR, "orders")
    supp = load_table(spark, SF_DIR, "supplier")
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")
    events0 = load_table(spark, SF_DIR, "events")
    emb_q = emb0.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    # warm-up: run each plan shape once so k=1 isn't charged for codegen
    li0.groupBy("l_returnflag").agg(dsum("l_quantity", 2, "s")).collect()
    li0.join(orders0, F.col("l_orderkey") == F.col("o_orderkey")) \
       .agg(F.count(F.lit(1))).collect()
    w0 = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"))
    orders0.withColumn("rn", F.row_number().over(w0)) \
           .filter(F.col("rn") == 1).agg(F.count(F.lit(1))).collect()

    from axonops_schema_registry_spark.llm.dedup import minhash_lsh_pairs
    from axonops_schema_registry_spark.llm.similarity import lsh_ann_topk

    # warm-up for the LLM shapes too
    lsh_ann_topk(emb_q, emb0.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec")), k=5).collect()
    minhash_lsh_pairs(docs0.limit(200), "doc_id", "text").collect()

    from axonops_schema_registry_spark.llm.sampling import (
        stratified_sample,
    )
    from axonops_schema_registry_spark.queries.streaming_queries import (
        _AUD3_PATH,
        _AUD3_PERM,
        _AUD3_STATUS,
        _AUD3_VERB,
    )
    from axonops_schema_registry_spark.streaming.audit import (
        audit_classify_sql,
    )

    def classify_shape(ev):
        """aud3: request-log synthesis + the classification CASE +
        map-side-combined rollup, all inside one codegen stage."""
        return (ev.selectExpr(f"{_AUD3_VERB} AS verb",
                              f"{_AUD3_PATH} AS path",
                              f"{_AUD3_PERM} AS is_permanent",
                              f"{_AUD3_STATUS} AS status")
                .selectExpr(f"{audit_classify_sql()} AS et")
                .groupBy("et").agg(F.count(F.lit(1))))

    def sample_shape(d):
        """smp1: scan-side deterministic hash filter."""
        rates = (d.select("source").distinct()
                 .withColumn("rate", F.lit(0.4)))
        return stratified_sample(d, rates).agg(F.count(F.lit(1)))

    classify_shape(events0.limit(1000)).collect()
    sample_shape(docs0.limit(1000)).collect()

    # --- r5/r6 curation shapes -------------------------------------------
    from axonops_schema_registry_spark.llm.contamination import (
        contamination_flags,
    )
    from axonops_schema_registry_spark.llm.dedup import (
        incremental_dedup_flags,
    )
    from axonops_schema_registry_spark.llm.sampling import dataset_mixture
    from axonops_schema_registry_spark.llm.text import pii_counts

    # the evaluation set stays FIXED while the training side grows —
    # exactly the real decontamination shape (broadcast eval spans)
    eval_docs = docs0.filter(F.col("source") == "src1") \
        .select("doc_id", "text")

    def dd7_shape(d):
        """incremental dedup: LSH banding + groupBy-min + left join."""
        return incremental_dedup_flags(d, "doc_id", "text", 0.8, 3) \
            .agg(F.count(F.lit(1)), F.sum(F.col("is_dup").cast("int")))

    def ctm1_shape(d):
        """contamination: big-side span scan vs broadcast eval spans."""
        return contamination_flags(d, eval_docs, "doc_id", "text", 5) \
            .agg(F.count(F.lit(1)))

    def tx7_shape(d):
        """PII scan: whole-stage-codegen regexp_count rollup."""
        return (d.select("source", *pii_counts("text"))
                .groupBy("source")
                .agg(F.sum("n_email"), F.sum("n_phone"), F.sum("n_ssn"),
                     F.sum("n_ipv4")))

    def mix1_shape(d):
        """mixture manifest: one per-source window, fixed quotas."""
        quotas = (d.select("source").distinct()
                  .withColumn("quota", F.lit(100)))
        return dataset_mixture(d, quotas).agg(
            F.count(F.lit(1)), F.max("mix_rank"))

    from axonops_schema_registry_spark.llm.packing import pack_manifest
    from axonops_schema_registry_spark.llm.text import (
        gopher_rules,
        gopher_stats,
    )
    from axonops_schema_registry_spark.operators.text import (
        tfidf_top_terms,
    )

    def pk1_shape(d):
        """sequence packing: per-source running-sum window + rollup."""
        return pack_manifest(d, 512).agg(F.count(F.lit(1)),
                                         F.sum("n_docs"))

    def gq1_shape(d):
        """gopher quality: pure-codegen stats + rule rollup."""
        stats = d.select("source", *gopher_stats("text"))
        rules = gopher_rules(F.col("n_words"), F.col("mean_word_len"),
                             F.col("symbol_ratio"), F.col("alpha_frac"),
                             F.col("stop_hits"))
        return (stats.select("source", *[v.alias(k)
                                         for k, v in rules.items()])
                .groupBy("source")
                .agg(*[F.sum(F.col(k).cast("int")) for k in rules]))

    def ti1_shape(d):
        """tf-idf: (doc,token) agg + token-keyed join + top-k window."""
        return tfidf_top_terms(d, "doc_id", "text", 3).agg(
            F.count(F.lit(1)))

    from axonops_schema_registry_spark.llm.dedup import (
        winnowing_fingerprints,
    )

    def wn1_shape(d):
        """winnowing: row-local selection, zero shuffles before the
        final count (a global SUM of 48-bit hashes would overflow
        int64 at replica scale — count + max instead)."""
        return winnowing_fingerprints(d, "doc_id", "text").agg(
            F.count(F.lit(1)), F.max("print_hash"))

    CURATION_SHAPES = (dd7_shape, ctm1_shape, tx7_shape, mix1_shape,
                       pk1_shape, gq1_shape, ti1_shape, wn1_shape)
    for shape in CURATION_SHAPES:
        shape(docs0.limit(200)).collect()  # warm-up

    rows = []
    cur_rows = []
    for k in FACTORS:
        li = replicate(li0, ["l_orderkey"], k)
        orders = replicate(orders0, ["o_orderkey"], k)
        docs = replicate_salted_docs(docs0, k)
        corpus = replicate(
            emb0.filter(F.col("vec_id") >= 10)
                .select(F.col("vec_id").alias("corpus_id"),
                        F.col("embedding").alias("corpus_vec")),
            ["corpus_id"], k)
        n = li.count()
        events = replicate(events0, ["event_id", "user_id"], k)

        def timed(thunk) -> float:
            """min-of-3 with a cache clear before each run: the first
            full-size run pays one-off codegen/broadcast costs, any
            cache() inside an operator must not carry over, and this
            host shows multi-second scheduling spikes (observed 3x on
            an unchanged plan) — all would masquerade as
            (anti-)scaling in the ratios."""
            best = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                thunk().collect()
                best = min(best, time.perf_counter() - t0)
            return best

        # scan + agg (q1 shape)
        t_agg = timed(lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
            dsum("l_quantity", 2, "sq"),
            psum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .alias("sd"),
            F.count(F.lit(1)).alias("c")))

        # fact-fact join + agg (q5 shape)
        t_join = timed(lambda: (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(F.broadcast(supp),
                    F.col("l_suppkey") == F.col("s_suppkey"))
              .groupBy("s_name")
              .agg(F.count(F.lit(1)).alias("c"))))

        # window (w1 shape)
        w = Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey"))
        t_win = timed(lambda: (
            orders.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1).agg(F.count(F.lit(1)))))

        # LSH-ANN (nn2, the similarity headline)
        t_ann = timed(lambda: lsh_ann_topk(emb_q, corpus, k=5)
                      .agg(F.count(F.lit(1))))

        # MinHash-LSH dedup (dd2 shape)
        t_dd = timed(lambda: minhash_lsh_pairs(docs, "doc_id", "text")
                     .agg(F.count(F.lit(1))))

        # audit classification (aud3 shape)
        t_cls = timed(lambda: classify_shape(events))

        # stratified sampling (smp1 shape)
        t_smp = timed(lambda: sample_shape(docs))

        rows.append((k, n, t_agg, t_join, t_win, t_ann, t_dd, t_cls,
                     t_smp))
        print(f"k={k}: rows={n:,} agg={t_agg:.2f}s join={t_join:.2f}s "
              f"window={t_win:.2f}s ann={t_ann:.2f}s dedup={t_dd:.2f}s "
              f"classify={t_cls:.2f}s sample={t_smp:.2f}s",
              flush=True)

        n_docs = docs.count()
        cur_times = [timed(lambda shape=shape: shape(docs))
                     for shape in CURATION_SHAPES]
        cur_rows.append((k, n_docs, *cur_times))
        print(f"k={k}: docs={n_docs:,} dd7={cur_times[0]:.2f}s "
              f"ctm1={cur_times[1]:.2f}s tx7={cur_times[2]:.2f}s "
              f"mix1={cur_times[3]:.2f}s pk1={cur_times[4]:.2f}s "
              f"gq1={cur_times[5]:.2f}s ti1={cur_times[6]:.2f}s",
              flush=True)

    base = rows[0]
    lines = [
        "# SCALING — empirical smoke at 1x / 4x / 10x of sf0.1",
        "",
        "Fact tables replicated with distinct keys; same plans as the",
        "benchmark set.  Near-linear time-vs-rows means the plan has no",
        "super-linear term (no cross products, bounded window state,",
        "map-side combine before every shuffle) — the property that",
        "transfers to a 1000-executor cluster.",
        "",
        "| factor | lineitem rows | scan+agg s | join+agg s | window s | "
        "lsh-ann s | minhash-dedup s | audit-classify s | sample s | "
        "agg ratio vs rows | join ratio | "
        "window ratio | ann ratio | dedup ratio | classify ratio | "
        "sample ratio |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for k, n, ta, tj, tw, tn, td, tc, ts_ in rows:
        rr = n / base[1]
        lines.append(
            f"| {k}x | {n:,} | {ta:.2f} | {tj:.2f} | {tw:.2f} | "
            f"{tn:.2f} | {td:.2f} | {tc:.2f} | {ts_:.2f} | "
            f"{ta / base[2] / rr:.2f} | {tj / base[3] / rr:.2f} | "
            f"{tw / base[4] / rr:.2f} | {tn / base[5] / rr:.2f} | "
            f"{td / base[6] / rr:.2f} | {tc / base[7] / rr:.2f} | "
            f"{ts_ / base[8] / rr:.2f} |")
    lines.append("")
    lines.append("Ratios near or below 1.0 = scaling at-or-better than "
                 "linear in rows (fixed per-job overhead amortizes; "
                 "values well above 1.0 would flag a super-linear term).  "
                 "LSH-ANN and MinHash-dedup replicas are content-distinct "
                 "(salted), so candidate volume — and measured time — "
                 "must stay linear in corpus size; a cross-product would "
                 "show up as a k² ratio here.")
    lines.append("")
    lines.append("## Curation operators (r5/r6) at 1x / 4x / 10x")
    lines.append("")
    lines.append("Same content-distinct salted document replicas.  The "
                 "contamination EVAL side stays fixed while the training "
                 "side grows (the real decontamination shape: broadcast "
                 "eval spans against one scan of the big side); dd7 "
                 "composes LSH banding + groupBy-min + left join; tx7 and "
                 "gq1 are pure codegen column expressions; mix1 and pk1 "
                 "are one per-source window each (mixture rank / packing "
                 "running sum); ti1 is two aggregates plus a token-keyed "
                 "join and a per-doc top-k window.")
    lines.append("")
    names = ("dd7 incr-dedup", "ctm1 contamination", "tx7 pii-scan",
             "mix1 mixture", "pk1 packing", "gq1 quality", "ti1 tf-idf",
             "wn1 winnowing")
    lines.append("| factor | document rows | "
                 + " | ".join(f"{n} s" for n in names) + " | "
                 + " | ".join(f"{n.split()[0]} ratio" for n in names)
                 + " |")
    lines.append("|---" * (2 + 2 * len(names)) + "|")
    cbase = cur_rows[0]
    for row in cur_rows:
        k, nd, ts = row[0], row[1], row[2:]
        rr = nd / cbase[1]
        cells = [f"{t:.2f}" for t in ts] + [
            f"{t / cbase[2 + i] / rr:.2f}" for i, t in enumerate(ts)]
        lines.append(f"| {k}x | {nd:,} | " + " | ".join(cells) + " |")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/SCALING.md")


if __name__ == "__main__":
    main()
