#!/usr/bin/env python
"""Scaling smoke for the r6/r7 composition shapes: cur1 (curation
pass), rel1 (release report), sem1 (semantic dedup + connected
components), ch1 (chunking), qz1 (int8 quantization), pk2 (segmented
packing), lab1 (label cohesion), mm4 (WAV sample decode) at 1x/4x/10x
of sf0.1 — the shapes VERDICT r6 asked to add to docs/SCALING.md.

APPENDS a section to docs/SCALING.md (scale_smoke.py owns the head of
the file and rewrites it; this script, like skew_smoke/store_smoke,
only appends).  Usage: python scripts/scale_smoke_r7.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)


def replicate_salted_docs(df: DataFrame, k: int) -> DataFrame:
    """k distinct copies: ids shifted AND text salted per copy, so
    cross-copy near-dup/contamination pairs don't exist — true-pair
    volume stays linear and any super-linearity is the PLAN's fault."""
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


def replicate_rolled_emb(df: DataFrame, k: int) -> DataFrame:
    """k distinct embedding copies: vec_id shifted and the vector
    ROLLED by i positions per copy — rolled directions decorrelate, so
    cross-copy cosine pairs at high thresholds don't exist and sem1's
    true-pair volume stays linear in corpus size."""
    if k == 1:
        return df
    copies = []
    for i in range(k):
        c = df.withColumn("vec_id",
                          F.col("vec_id") + F.lit(i * 1_000_000_000))
        if i:
            c = c.withColumn(
                "embedding",
                F.expr(f"concat(slice(embedding, {i + 1}, "
                       f"size(embedding) - {i}), "
                       f"slice(embedding, 1, {i}))"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    spark = get_spark("scale-smoke-r7")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")

    from axonops_schema_registry_spark.llm import CurationPipeline
    from axonops_schema_registry_spark.llm.contamination import (
        contamination_flags,
    )
    from axonops_schema_registry_spark.llm.dedup import (
        connected_components,
        incremental_dedup_flags,
    )
    from axonops_schema_registry_spark.llm.multimodal import (
        decode_samples,
        synthesize_wav_media,
    )
    from axonops_schema_registry_spark.llm.packing import (
        chunk_documents,
        pack_assignments_segmented,
    )
    from axonops_schema_registry_spark.llm.similarity import (
        quantize_int8,
        label_cohesion,
        lsh_cosine_pairs_portable,
    )
    from axonops_schema_registry_spark.llm.text import pii_redact

    # the evaluation set stays FIXED while the training side grows —
    # the real decontamination shape (broadcast eval spans)
    eval_docs = docs0.filter(F.col("source") == "src1") \
        .select("doc_id", "source", "text")

    def cur1_shape(d):
        """cur1: dedup + decontaminate + PII-redact in one DAG."""
        train = d.filter(F.col("source") != "src1")
        dedup = incremental_dedup_flags(train, "doc_id", "text", 0.8, 3)
        contam = (contamination_flags(train, eval_docs, "doc_id",
                                      "text", 5)
                  .select("doc_id", F.col("n_shared_spans")
                          .alias("n_eval_spans")))
        kept = ~F.col("is_dup") & (F.col("n_eval_spans") == 0)
        return (train.join(dedup, "doc_id")
                .join(contam, "doc_id", "left")
                .na.fill({"n_eval_spans": 0})
                .withColumn("clean_len",
                            F.when(kept, F.length(pii_redact("text"))))
                .agg(F.count(F.lit(1)), F.sum("clean_len")))

    def rel1_shape(d):
        """rel1: the full release-report composition per source."""
        train = d.filter(F.col("source") != "src1")
        return (CurationPipeline(train).release_report(eval_docs)
                .agg(F.count(F.lit(1)), F.sum("n_released")))

    def sem1_shape(e):
        """sem1: LSH cosine pairs (t=0.4) -> connected components."""
        pairs = lsh_cosine_pairs_portable(e, "vec_id", "embedding",
                                          threshold=0.4)
        comp = connected_components(pairs.select("id_a", "id_b"))
        return comp.agg(F.count(F.lit(1)), F.max("cluster_size"))

    def ch1_shape(d):
        """ch1: overlapping chunk manifest — explode + slice only."""
        return chunk_documents(d, 256, 192).agg(
            F.count(F.lit(1)), F.max("n_chunk_words"))

    def qz1_shape(e):
        """qz1: row-local int8 quantization of every vector."""
        q = quantize_int8(e, "vec_id", "embedding")
        return q.agg(F.count(F.lit(1)), F.max("scale"))

    def pk2_shape(d):
        """pk2: hash-range segmented packing (sources x 8 windows)."""
        a = pack_assignments_segmented(d, 512, n_segments=8)
        return a.agg(F.count(F.lit(1)), F.max("pack_id"))

    def lab1_shape(e):
        """lab1: posexplode centroid sums + broadcast cosine join —
        the no-member-list shape (r7 rewrite)."""
        return label_cohesion(e).agg(F.count(F.lit(1)),
                                     F.min("min_cos_to_centroid"))

    def mm4_shape(d):
        """mm4: WAV synth + full PCM sample decode, mapInPandas."""
        return decode_samples(synthesize_wav_media(d, "doc_id")).agg(
            F.count(F.lit(1)), F.sum("sum_amp"))

    DOC_SHAPES = (("cur1 curation", cur1_shape),
                  ("rel1 release", rel1_shape),
                  ("ch1 chunking", ch1_shape),
                  ("pk2 seg-packing", pk2_shape),
                  ("mm4 wav-decode", mm4_shape))
    EMB_SHAPES = (("sem1 sem-dedup", sem1_shape),
                  ("qz1 int8-quant", qz1_shape),
                  ("lab1 cohesion", lab1_shape))

    # warm-up at reduced size so 1x isn't charged for codegen
    for _, shape in DOC_SHAPES:
        shape(docs0.limit(300)).collect()
    for _, shape in EMB_SHAPES:
        shape(emb0.limit(300)).collect()

    def timed(thunk) -> float:
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            thunk().collect()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    for k in FACTORS:
        docs = replicate_salted_docs(docs0, k)
        emb = replicate_rolled_emb(emb0, k)
        n_docs = docs.count()
        times = ([timed(lambda s=shape: s(docs))
                  for _, shape in DOC_SHAPES]
                 + [timed(lambda s=shape: s(emb))
                    for _, shape in EMB_SHAPES])
        rows.append((k, n_docs, *times))
        print(f"k={k}: docs={n_docs:,} " + " ".join(
            f"{name.split()[0]}={t:.2f}s" for (name, _), t in
            zip(DOC_SHAPES + EMB_SHAPES, times)), flush=True)

    names = [n for n, _ in DOC_SHAPES + EMB_SHAPES]
    lines = [
        "",
        "## Composition shapes (r7) at 1x / 4x / 10x",
        "",
        "Same content-distinct replicas (salted text; embedding copies "
        "ROLLED so cross-copy cosine pairs don't exist and sem1's true-"
        "pair volume stays linear).  cur1/rel1 compose dedup + "
        "decontamination (+ quality/PII) in one DAG against a FIXED "
        "broadcast eval side; sem1 chains LSH cosine pairs into the "
        "checkpointed connected-components loop (the r7 lineage fix); "
        "lab1 is the no-member-list centroid shape; ch1/qz1/mm4 are "
        "row-local; pk2 windows on (source, hash-range segment).",
        "",
        "| factor | document rows | "
        + " | ".join(f"{n} s" for n in names) + " | "
        + " | ".join(f"{n.split()[0]} ratio" for n in names) + " |",
        "|---" * (2 + 2 * len(names)) + "|",
    ]
    base = rows[0]
    for row in rows:
        k, nd, ts = row[0], row[1], row[2:]
        rr = nd / base[1]
        cells = [f"{t:.2f}" for t in ts] + [
            f"{t / base[2 + i] / rr:.2f}" for i, t in enumerate(ts)]
        lines.append(f"| {k}x | {nd:,} | " + " | ".join(cells) + " |")
    lines.append("")
    lines.append("Ratios ≤ 1.0 = at-or-better than linear in rows.")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SCALING.md")
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to docs/SCALING.md")


if __name__ == "__main__":
    main()
