"""Storage-conformance analog (SURVEY.md §5): the reference runs one
suite against all four storage backends and demands identical semantics;
here the same corpus derivation runs against parquet, JSON, CSV and ORC copies
of the same data and must produce identical results (ordering,
soft-delete visibility, version assignment)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from axonops_schema_registry_spark.catalog import load_table


def _corpus_from(docs: DataFrame) -> DataFrame:
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.select(
        F.col("source").alias("subject"),
        F.row_number().over(w).cast("int").alias("version"),
        F.sha2(F.col("text"), 256).alias("fingerprint"),
        (F.col("doc_id") % 20 == 0).alias("deleted"),
    )


@pytest.fixture(scope="module")
def sources(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("conformance")
    docs = load_table(spark, sf_dir, "documents")
    json_dir = str(base / "docs_json")
    csv_dir = str(base / "docs_csv")
    orc_dir = str(base / "docs_orc")
    docs.write.mode("overwrite").json(json_dir)
    docs.write.mode("overwrite").option("header", True) \
        .option("quoteAll", True).csv(csv_dir)
    docs.write.mode("overwrite").orc(orc_dir)
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    return {
        "parquet": docs,
        "json": spark.read.schema(schema).json(json_dir),
        "csv": spark.read.schema(schema).option("header", True).csv(csv_dir),
        "orc": spark.read.orc(orc_dir),
    }


def _collect(df: DataFrame) -> list:
    return sorted(map(str, df.collect()))


def test_latest_live_identical_across_backends(sources):
    results = {}
    for backend, docs in sources.items():
        corpus = _corpus_from(docs).filter(~F.col("deleted"))
        w = Window.partitionBy("subject").orderBy(F.desc("version"))
        results[backend] = _collect(
            corpus.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1).drop("rn"))
    assert results["parquet"] == results["json"] == results["csv"] == results["orc"]
    assert len(results["parquet"]) > 0


def test_versions_view_identical_across_backends(sources):
    results = {}
    for backend, docs in sources.items():
        corpus = _corpus_from(docs)
        results[backend] = _collect(
            corpus.groupBy("subject")
                  .agg(F.max("version").alias("latest"),
                       F.count(F.lit(1)).alias("n"),
                       F.sum(F.when(F.col("deleted"), 1).otherwise(0))
                       .alias("n_deleted")))
    assert results["parquet"] == results["json"] == results["csv"] == results["orc"]
