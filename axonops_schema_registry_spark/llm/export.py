"""Training-shard export: deterministic sharding, an auditable
manifest, and the partitioned writer — the last mile of a
training-data pipeline (the reference's exporter,
`internal/exporter/exporter.go`, ships registry rows with offsets and
state; a training pipeline ships document shards with a manifest).

Design for 100 TB:

- Shard assignment is a pure hash of the document id — computed
  inside the scan's codegen stage, no shuffle, no state, and STABLE:
  re-running the export (or running it on another engine) assigns
  every document to the same shard, so incremental re-exports and
  cross-engine audits line up.
- The manifest aggregates per shard with map-side combine: counts,
  token totals, and an ORDER-INDEPENDENT content checksum (sum of
  per-document 48-bit content hashes mod 2^48 — commutative, so the
  aggregation order Spark picks can't change it, and DuckDB replays
  it bit-for-bit).
- The writer repartitions BY the shard column only (one shuffle,
  n_shards output groups) and writes ``partitionBy(shard_id)`` so
  each shard is one directory a downstream loader can mount; the
  manifest is the receipt to verify the write against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.llm.sampling import (
    HASH_SPACE,
    portable_hash,
)


def assign_shards(docs: DataFrame, n_shards: int = 16,
                  id_col: str = "doc_id") -> DataFrame:
    """Add a deterministic ``shard_id`` column: the engine-portable
    48-bit hash of the id, mod ``n_shards``.  A pure projection —
    evaluates scan-side, survives re-runs and engine swaps."""
    return docs.withColumn(
        "shard_id",
        (portable_hash(F.col(id_col).cast("string"))
         % n_shards).cast("int"))


def shard_manifest(docs: DataFrame, n_shards: int = 16,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The export receipt: per shard — document count, whitespace
    token total, min/max id, and an order-independent content
    checksum (Σ hash48(id || ':' || text) mod 2^48).  Every column is
    exact integer arithmetic, so an independent engine auditing the
    export reproduces the manifest bit-for-bit."""
    h = portable_hash(F.concat(F.col(id_col).cast("string"),
                               F.lit(":"), F.col(text_col)))
    return (assign_shards(docs, n_shards, id_col)
            .groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.size(F.split(F.col(text_col), " "))
                       .cast("bigint")).alias("n_tokens"),
                 F.min(id_col).alias("min_id"),
                 F.max(id_col).alias("max_id"),
                 # sum in DECIMAL(38,0): 48-bit terms × billions of
                 # docs overflows BIGINT (DuckDB's SUM widens to
                 # HUGEINT on its own)
                 (F.sum(h.cast("decimal(38,0)")) % HASH_SPACE)
                 .cast("bigint").alias("content_checksum")))


def write_shards(docs: DataFrame, out_dir: str, n_shards: int = 16,
                 id_col: str = "doc_id", text_col: str = "text",
                 max_records_per_file: int | None = None) -> DataFrame:
    """Write the corpus as ``out_dir/shard_id=K/`` parquet shards and
    return the manifest computed FROM THE WRITTEN FILES (not the
    input) — the receipt proves what landed on disk.  One shuffle
    (repartition by shard); ``partitionBy`` prunes any later
    per-shard read to its directory.

    ``max_records_per_file`` caps rows per parquet file inside a
    shard directory — at 100 TB a shard is billions of documents and
    one writer task per shard would emit one unmanageable file;
    the cap rolls files so downstream loaders stream fixed-size
    pieces."""
    sharded = assign_shards(docs, n_shards, id_col)
    writer = (sharded.repartition(n_shards, "shard_id")
              .write.mode("overwrite").partitionBy("shard_id"))
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile",
                               max_records_per_file)
    writer.parquet(out_dir)
    written = docs.sparkSession.read.parquet(out_dir)
    return shard_manifest(written, n_shards, id_col, text_col)
