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


def _mass_docs(spark, masses: dict):
    """One doc per source with exactly `masses[source]` tokens."""
    rows = [(i, s, " ".join(f"w{j}" for j in range(n)))
            for i, (s, n) in enumerate(sorted(masses.items()))]
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string")


@pytest.mark.parametrize("budget", [1, 7, 100, 333])
def test_exact_budget_quota_sums(spark, budget):
    """VERDICT r12 ask #5: exact_budget=True meets the budget
    EXACTLY (the floor-only default may fall short by up to
    n_sources-1), and every quota is floor or floor+1."""
    from axonops_schema_registry_spark.llm.sampling import (
        temperature_quotas,
    )

    docs = _mass_docs(spark, {"a": 17, "b": 31, "c": 5, "d": 90,
                              "e": 64, "f": 3})
    fl = {r.source: r.quota
          for r in temperature_quotas(docs, budget).collect()}
    ex = {r.source: r.quota
          for r in temperature_quotas(
              docs, budget, exact_budget=True).collect()}
    assert sum(ex.values()) == budget
    assert 0 <= budget - sum(fl.values()) < len(fl)
    assert all(ex[s] in (fl[s], fl[s] + 1) for s in fl)


def test_exact_budget_tie_break_by_source_name(spark):
    """Equal masses → equal weights → equal remainders: the remainder
    seats must go to the lexicographically SMALLEST source names, and
    repeat runs must agree (the determinism the contract promises)."""
    from axonops_schema_registry_spark.llm.sampling import (
        temperature_quotas,
    )

    # four identical sources, budget 6: floor = 1 each, shortfall 2,
    # remainders all equal → seats to 'pa' and 'pb' by name
    docs = _mass_docs(spark, {"pd": 16, "pc": 16, "pb": 16, "pa": 16})
    for _ in range(2):
        got = {r.source: r.quota
               for r in temperature_quotas(
                   docs, 6, exact_budget=True).collect()}
        assert got == {"pa": 2, "pb": 2, "pc": 1, "pd": 1}


def test_exact_budget_zero_shortfall_is_noop(spark):
    """When floor division already meets the budget the top-up must
    change nothing (rank <= 0 matches no row)."""
    from axonops_schema_registry_spark.llm.sampling import (
        temperature_quotas,
    )

    # two sources with equal weights, even budget: no remainder
    docs = _mass_docs(spark, {"x": 25, "y": 25})
    fl = {r.source: r.quota
          for r in temperature_quotas(docs, 10).collect()}
    ex = {r.source: r.quota
          for r in temperature_quotas(
              docs, 10, exact_budget=True).collect()}
    assert fl == ex == {"x": 5, "y": 5}
