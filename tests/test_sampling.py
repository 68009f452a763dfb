"""Property tests for llm/sampling.py: determinism, rate accuracy,
exact quotas, and cross-engine hash portability."""

import duckdb
import pytest
from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.llm.sampling import (
    HASH_SPACE,
    dataset_mixture,
    portable_hash,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _rates(docs, rate: float):
    return (docs.select("source").distinct()
            .withColumn("rate", F.lit(rate)))


def test_sampling_is_deterministic(spark, docs):
    rates = _rates(docs, 0.4)
    a = {r.doc_id for r in stratified_sample(docs, rates).collect()}
    b = {r.doc_id for r in stratified_sample(docs, rates).collect()}
    assert a == b and a


def test_sampling_rate_accuracy(spark, docs):
    n_total = docs.count()
    for rate in (0.2, 0.5, 0.8):
        n = stratified_sample(docs, _rates(docs, rate)).count()
        assert abs(n / n_total - rate) < 0.08, (rate, n, n_total)


def test_sampling_is_monotone_in_rate(spark, docs):
    """A lower rate selects a SUBSET of a higher rate's picks — the
    property that lets a pipeline re-sample without churn."""
    lo = {r.doc_id for r in
          stratified_sample(docs, _rates(docs, 0.2)).collect()}
    hi = {r.doc_id for r in
          stratified_sample(docs, _rates(docs, 0.6)).collect()}
    assert lo <= hi


def test_mixture_exact_quotas(spark, docs):
    quotas = (docs.select("source").distinct()
              .withColumn("quota", F.lit(7)))
    out = (dataset_mixture(docs, quotas)
           .groupBy("source").agg(F.count(F.lit(1)).alias("n"),
                                  F.max("mix_rank").alias("mx"))
           .collect())
    for r in out:
        assert r.n == 7 and r.mx == 7, r


def test_portable_hash_matches_duckdb(spark):
    ids = [str(i * 7919) for i in range(200)]
    sdf = spark.createDataFrame([(x,) for x in ids], "k string")
    got = {r.k: r.h for r in
           sdf.select("k", portable_hash(F.col("k")).alias("h"))
           .collect()}
    con = duckdb.connect()
    for k in ids:
        want = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 12)) AS BIGINT)",
            [k]).fetchone()[0]
        assert got[k] == want, k
        assert 0 <= want < HASH_SPACE
