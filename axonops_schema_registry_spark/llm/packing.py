"""Sequence packing for training-context assembly.

Pretraining consumes fixed-length contexts (e.g. 512/4096 tokens), not
documents: the pipeline concatenates documents in a deterministic order
and cuts the token stream every ``context_len`` tokens ("concat-then-
chunk" packing).  The operator assigns every document to the pack where
its FIRST token lands and reports per-pack occupancy plus boundary
straddles — the stats a data loader needs to build index manifests.

Determinism: documents are ordered by the engine-portable 48-bit md5
hash (ties by key), the same shuffle order the mixture/sampling
operators use, so two engines — or two runs — produce identical packs.

Scale design: packing runs PER SOURCE (each source is packed into its
own context stream, matching how mixture shards are materialized), so
the running-sum window partitions by source and its state is bounded by
per-source cardinality — never a single global ordering.  At extreme
scale :func:`pack_assignments_segmented` splits each source's stream
into hash-range segments packed independently (sources × segments
window tasks), and :func:`pack_documents_whole` provides the
no-straddle next-fit policy as an ``applyInPandas`` fold per segment —
all three shapes are oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from axonops_schema_registry_spark.llm.sampling import portable_hash


def pack_assignments(docs: DataFrame, context_len: int,
                     key_col: str = "doc_id",
                     source_col: str = "source",
                     text_col: str = "text") -> DataFrame:
    """Per-document pack assignment: (key, source, n_tokens,
    start_offset, pack_id, straddles) — ``pack_id`` is the pack holding
    the document's first token; ``straddles`` marks documents whose
    tokens cross a pack boundary (they continue into pack_id+1...)."""
    toks = F.size(F.split(F.col(text_col), "\\s+")).cast("bigint")
    w = (Window.partitionBy(source_col).orderBy("__h", key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .withColumn("__h", portable_hash(F.col(key_col)
                                             .cast("string")))
            .withColumn("n_tokens", toks)
            .withColumn("__cum", F.sum("n_tokens").over(w))
            .withColumn("start_offset", F.col("__cum") - F.col("n_tokens"))
            .withColumn("pack_id",
                        F.floor(F.col("start_offset") / context_len)
                        .cast("bigint"))
            .withColumn("straddles",
                        F.floor((F.col("__cum") - 1) / context_len)
                        != F.col("pack_id"))
            .select(F.col(key_col), F.col(source_col), "n_tokens",
                    "start_offset", "pack_id", "straddles"))


def pack_assignments_segmented(docs: DataFrame, context_len: int,
                               n_segments: int = 16,
                               key_col: str = "doc_id",
                               source_col: str = "source",
                               text_col: str = "text") -> DataFrame:
    """Hash-range segmented packing — the shape that survives 100 TB.

    :func:`pack_assignments` windows on ``source`` alone, so a handful
    of sources means a handful of running-sum tasks no matter how many
    executors exist.  Here each source's hash-ordered document stream
    is cut into ``n_segments`` contiguous HASH RANGES (segment =
    ``floor(__h * n / 2^48)`` — a range split, not a modulus, so
    concatenating segments in segment order reproduces the single
    stream's global order with pack boundaries forced at segment
    edges), and every (source, segment) packs independently: the window
    partitions by both, parallelism = sources × segments, per-task
    state bounded by one segment's documents.

    Output adds ``segment``; ``pack_id`` is segment-local, so a data
    loader's shard key is (source, segment, pack_id).  Fully
    SQL-expressible — the pk2 oracle replays it in DuckDB verbatim.
    """
    toks = F.size(F.split(F.col(text_col), "\\s+")).cast("bigint")
    seg = F.floor(F.col("__h") * n_segments / (1 << 48)).cast("bigint")
    w = (Window.partitionBy(source_col, "segment")
         .orderBy("__h", key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .withColumn("__h", portable_hash(F.col(key_col)
                                             .cast("string")))
            .withColumn("segment", seg)
            .withColumn("n_tokens", toks)
            .withColumn("__cum", F.sum("n_tokens").over(w))
            .withColumn("start_offset", F.col("__cum") - F.col("n_tokens"))
            .withColumn("pack_id",
                        F.floor(F.col("start_offset") / context_len)
                        .cast("bigint"))
            .withColumn("straddles",
                        F.floor((F.col("__cum") - 1) / context_len)
                        != F.col("pack_id"))
            .select(F.col(key_col), F.col(source_col), "segment",
                    "n_tokens", "start_offset", "pack_id", "straddles"))


def pack_manifest(docs: DataFrame, context_len: int,
                  key_col: str = "doc_id",
                  source_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """Per-pack manifest: how many documents start in each pack, their
    token mass, and how many straddle into the next pack — the index a
    data loader materializes next to the packed shards."""
    a = pack_assignments(docs, context_len, key_col, source_col, text_col)
    return (a.groupBy(source_col, "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("tok_sum"),
                 F.sum(F.col("straddles").cast("int")).cast("bigint")
                 .alias("n_straddles"),
                 F.min(key_col).alias("first_doc"),
                 F.max(key_col).alias("last_doc")))


def chunk_documents(docs: DataFrame, chunk_words: int = 256,
                    stride_words: int = 192,
                    key_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping word-aligned chunking — the context-preparation
    sibling of packing (RAG indexing / long-doc training splits):
    chunk ``i`` covers words ``[i*stride+1, i*stride+chunk_words]``,
    consecutive chunks overlap by ``chunk_words - stride_words``.

    Output: (key, chunk_id, start_word, n_chunk_words, chunk_hash) —
    the hash stands in for the chunk text so manifests stay narrow;
    join back on (key, start_word) to materialize text.

    Scale: pure explode + slice column expressions — no shuffle at all
    until whatever the caller aggregates; chunk count per document is
    ceil(max(n_words - chunk_words, 0) / stride) + 1, linear in
    document length.
    """
    assert 0 < stride_words <= chunk_words
    chunk = (F.col("chunk_id") * stride_words + 1).cast("bigint")
    # split once before the explode — the slice below otherwise
    # re-splits per exploded chunk row
    return (docs
            .withColumn("__ws", F.split(F.col(text_col), " "))
            .withColumn("chunk_id", F.explode(F.expr(
                f"sequence(0, CAST(ceil(greatest(size(__ws) "
                f"- {chunk_words}, 0) / {float(stride_words)}) "
                f"AS BIGINT))")))
            .withColumn("start_word", chunk)
            .withColumn("__slice", F.expr(
                f"slice(__ws, chunk_id * {stride_words} + 1, "
                f"{chunk_words})"))
            .select(F.col(key_col), F.col("chunk_id").cast("bigint"),
                    "start_word",
                    F.size("__slice").cast("bigint")
                    .alias("n_chunk_words"),
                    F.sha2(F.array_join("__slice", " "), 256)
                    .alias("chunk_hash")))


def pack_documents_whole(docs: DataFrame, context_len: int,
                         n_segments: int = 16,
                         key_col: str = "doc_id",
                         source_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """Whole-document (no-straddle) packing — the SFT-style policy
    where a document is never split across contexts: documents are
    taken in deterministic hash order and assigned NEXT-FIT — if the
    current pack cannot hold the document, a new pack opens (an
    oversize document occupies a pack alone).

    Next-fit is inherently sequential per stream, which is exactly what
    the concat-then-chunk operators avoid — so this is the family's
    honest ``applyInPandas`` member: each (source, hash-range segment)
    group folds in pandas with O(group) state, parallelism =
    sources × segments like pk2.  The fold is order-deterministic
    (hash, key), so a SQL oracle replays it with a recursive CTE.

    Output: (key, source, segment, n_tokens, pack_id, fill_after) —
    ``pack_id`` is segment-local, ``fill_after`` the pack occupancy
    after placing the document.
    """
    import pandas as pd

    toks = F.size(F.split(F.col(text_col), "\\s+")).cast("bigint")
    seg = F.floor(F.col("__h") * n_segments / (1 << 48)).cast("bigint")
    prepared = (docs
                .withColumn("__h", portable_hash(F.col(key_col)
                                                 .cast("string")))
                .withColumn("segment", seg)
                .withColumn("n_tokens", toks)
                .select(key_col, source_col, "segment", "n_tokens",
                        "__h"))

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__h", key_col]).reset_index(drop=True)
        pack_ids, fills = [], []
        pack, fill = 0, 0
        for i, n in enumerate(pdf["n_tokens"]):
            if i > 0 and fill + n > context_len:
                pack += 1
                fill = 0
            fill += int(n)
            pack_ids.append(pack)
            fills.append(fill)
        pdf["pack_id"] = pack_ids
        pdf["fill_after"] = fills
        return pdf.drop(columns=["__h"])

    # derive key/source types from the input instead of hardcoding —
    # string-keyed corpora must work exactly like the window-based
    # siblings, which just pass the columns through
    in_types = dict((f.name, f.dataType.simpleString())
                    for f in prepared.schema.fields)
    out_schema = (f"{key_col} {in_types[key_col]}, "
                  f"{source_col} {in_types[source_col]}, "
                  "segment bigint, n_tokens bigint, pack_id bigint, "
                  "fill_after bigint")
    return (prepared.groupBy(source_col, "segment")
            .applyInPandas(pack_group, schema=out_schema))
