"""Streaming ingestion dedup: the first-wins near-dup filter as a
``foreachBatch`` sink.

Each micro-batch is flagged against everything ingested before it plus
itself — exactly :func:`...llm.dedup.incremental_dedup_flags` over the
growing prefix, which is order-independent (earlier = smaller key), so
the streaming run produces the identical flags to one batch run over
the full corpus (pinned by tests/test_streaming.py).

State: the seen-document set.  This in-process variant keeps it as a
unioned DataFrame (test scale); a production deployment appends
accepted documents to a bucketed parquet/Delta table and joins each
micro-batch against ONLY the colliding LSH buckets — the same
equi-join shape ``minhash_lsh_pairs`` already uses, so per-batch cost
is bounded by candidate volume, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from axonops_schema_registry_spark.llm.dedup import incremental_dedup_flags


class IncrementalDedupSink:
    """foreachBatch target: flags each arriving document against the
    ingested-so-far corpus and accumulates the per-document verdicts."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, ngram: int = 3) -> None:
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.ngram = threshold, ngram
        self.seen: DataFrame | None = None
        self.flags: dict[int, tuple[bool, int | None]] = {}

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        new = batch_df.select(self.id_col, self.text_col)
        corpus = (new if self.seen is None
                  else self.seen.unionByName(new))
        batch_flags = (incremental_dedup_flags(
            corpus, self.id_col, self.text_col, self.threshold,
            self.ngram)
            .join(new.select(self.id_col), self.id_col))
        for r in batch_flags.collect():
            self.flags[r[self.id_col]] = (r["is_dup"], r["dup_of"])
        # ALL documents join the seen set — matching against every
        # earlier document (dup or not) is what keeps the flags
        # identical to one batch run over the full corpus; the cleaned
        # output is simply the is_dup=false subset of self.flags
        self.seen = corpus
