"""Correctness pins for the bench-only 100 TB-form specs (VERDICT r10
ask #2): ``es1h`` (gram-hash shuffle keys) and ``dd6b``
(occupancy-targeted LSH bits) carry no DuckDB oracle — their
oracle-checked twins must keep the literal parameters the SQL replay
shares — so their correctness is pinned here instead:

- es1h's span output must equal es1's exactly (the hash only narrows
  the shuffled key; a 64-bit collision is the documented vanishing
  exception, absent at test scale).
- dd6b must use exactly ``recommended_lsh_bits(corpus)`` and emit only
  true pairs (cosine >= threshold, verified against brute force); at
  corpora at-or-below the occupancy target the helper floors to dd6's
  5 bits, making the pair sets identical — asserted, so the two bench
  rows measure the same work at sf0.001 and diverge only at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from axonops_schema_registry_spark.queries import SPEC_BY_NAME


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_es1h_spec_equals_es1_spec(spark, sf_dir):
    raw = SPEC_BY_NAME["es1_exact_substring_spans"].build(spark, sf_dir)
    hashed = SPEC_BY_NAME["es1h_exact_substring_spans_hashed"].build(
        spark, sf_dir)
    assert raw.columns == hashed.columns
    assert _rows(raw) == _rows(hashed)


def test_dd6b_uses_recommended_bits_and_matches_dd6_at_floor(
        spark, sf_dir):
    from axonops_schema_registry_spark.catalog import load_table
    from axonops_schema_registry_spark.llm.similarity import (
        recommended_lsh_bits,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    # at sf0.001/sf0.01 the corpus (500 vectors) is above the 200
    # occupancy target but below 200*2^5: the helper floors to 5 bits
    # == dd6's literal, so the two specs must agree EXACTLY
    assert recommended_lsh_bits(n) == 5
    dd6 = SPEC_BY_NAME["dd6_embedding_cosine_dedup"].build(spark, sf_dir)
    dd6b = SPEC_BY_NAME["dd6b_embedding_cosine_dedup_scaled"].build(
        spark, sf_dir)
    assert dd6.columns == dd6b.columns
    assert _rows(dd6) == _rows(dd6b)


def test_dd6b_pairs_are_true_pairs_under_wider_bits(spark, sf_dir):
    """The scale regime (bits above the floor): every emitted pair
    must be a TRUE pair (cosine >= threshold, brute-force verified) —
    precision 1.0 by construction; recall is the documented LSH trade.
    Exercised by calling the underlying operator with a wider bucket
    width than the floor, the shape dd6b takes on a large corpus."""
    from axonops_schema_registry_spark.catalog import load_table
    from axonops_schema_registry_spark.llm.similarity import (
        lsh_cosine_pairs_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    got = _rows(lsh_cosine_pairs_portable(
        emb, "vec_id", "embedding", threshold=0.4, n_bits=7))
    # brute-force truth: all pairs with round(cosine, 4) >= 0.4
    v = emb.select(F.col("vec_id").alias("id"),
                   F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
                   .alias("ev"))
    a = v.select(F.col("id").alias("id_a"), F.col("ev").alias("ea"))
    b = v.select(F.col("id").alias("id_b"), F.col("ev").alias("eb"))
    dot = F.expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), "
                 "CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)")
    na = F.sqrt(F.expr("aggregate(transform(ea, x -> x * x), "
                       "CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"))
    nb = F.sqrt(F.expr("aggregate(transform(eb, x -> x * x), "
                       "CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"))
    truth = {(r.id_a, r.id_b): r.cosine_sim
             for r in (a.crossJoin(b)
                       .filter(F.col("id_a") < F.col("id_b"))
                       .withColumn("cosine_sim",
                                   F.round(dot / (na * nb), 4))
                       .filter(F.col("cosine_sim") >= 0.4)
                       .collect())}
    assert len(got) > 0
    for id_a, id_b, cos in got:
        assert (id_a, id_b) in truth
        assert cos == truth[(id_a, id_b)]
