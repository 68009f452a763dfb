#!/usr/bin/env python
"""Scaling smoke, r7 appendix: ppl1 (unigram perplexity), ctm3
(semantic decontamination), nn4 (PQ-ADC search), mix2 (segmented
mixture) at 1x / 4x / 10x of sf0.1.  APPENDS to docs/SCALING.md.

Usage: python scripts/scale_smoke_r7b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.session import get_spark
from scripts.scale_smoke_r7 import (  # noqa: E402
    replicate_rolled_emb,
    replicate_salted_docs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 10)


def main() -> None:
    spark = get_spark("scale-smoke-r7b")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")

    from axonops_schema_registry_spark.llm.sampling import (
        dataset_mixture_segmented,
    )
    from axonops_schema_registry_spark.llm.similarity import (
        lsh_cosine_pairs_portable,
        pq_adc_topk,
    )
    from axonops_schema_registry_spark.llm.text import unigram_surprisal

    # fixed 10-query set; the corpus side grows — the ANN serving shape
    emb_q = emb0.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))

    def ppl1_shape(d):
        """corpus-fitted unigram LM + per-doc surprisal rollup."""
        return unigram_surprisal(d).agg(
            F.count(F.lit(1)), F.max("mean_surprisal"))

    def ctm3_shape(e):
        """cross-side LSH cosine screen (eval slice vs corpus)."""
        pairs = lsh_cosine_pairs_portable(e, "vec_id", "embedding",
                                          threshold=0.35)
        ea, eb = F.col("id_a") % 11 == 3, F.col("id_b") % 11 == 3
        return pairs.filter(ea != eb).agg(F.count(F.lit(1)))

    def nn4_shape(e):
        """PQ encode the corpus + ADC top-5 for the fixed queries."""
        corpus = e.filter(F.col("vec_id") >= 10).select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("corpus_vec"))
        return pq_adc_topk(emb_q, corpus, k=5).agg(
            F.count(F.lit(1)), F.min("adc_dist"))

    def mix2_shape(d):
        """segmented mixture manifest, rank-exact."""
        quotas = (d.select("source").distinct()
                  .withColumn("quota", F.lit(100)))
        return dataset_mixture_segmented(d, quotas, n_segments=8).agg(
            F.count(F.lit(1)), F.max("mix_rank"))

    DOC_SHAPES = (("ppl1 perplexity", ppl1_shape),
                  ("mix2 seg-mixture", mix2_shape))
    EMB_SHAPES = (("ctm3 sem-contam", ctm3_shape),
                  ("nn4 pq-adc", nn4_shape))
    for _, s in DOC_SHAPES:
        s(docs0.limit(300)).collect()
    for _, s in EMB_SHAPES:
        s(emb0.limit(300)).collect()

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
        times = ([timed(lambda s=s: s(docs)) for _, s in DOC_SHAPES]
                 + [timed(lambda s=s: s(emb)) for _, s in EMB_SHAPES])
        rows.append((k, n_docs, *times))
        print(f"k={k}: docs={n_docs:,} " + " ".join(
            f"{n.split()[0]}={t:.2f}s" for (n, _), t in
            zip(DOC_SHAPES + EMB_SHAPES, times)), flush=True)

    names = [n for n, _ in DOC_SHAPES + EMB_SHAPES]
    lines = [
        "",
        "## r7 appendix: perplexity / semantic-contamination / "
        "PQ-ADC / segmented mixture at 1x / 4x / 10x",
        "",
        "ppl1's vocabulary (and so its broadcast score table) is "
        "bounded by the corpus's token diversity, not its row count; "
        "ctm3 reuses the sem1 replicas (rolled copies, linear "
        "true-pair volume); nn4 holds the query set FIXED while the "
        "corpus grows — the ANN serving shape, so time tracks the "
        "encode pass; mix2's window is sharded by hash-range segment.",
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
