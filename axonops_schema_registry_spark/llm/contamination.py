"""Train/test contamination detection for training-data curation.

Benchmark decontamination is a distinct operation from near-dup
removal: a training document is CONTAMINATED when it contains an exact
n-gram span that also appears in an evaluation set, even when the two
documents are globally dissimilar (a quoted test question inside a long
web page).  The standard pipeline step removes or flags such documents
before training.

Scale design: the evaluation set is orders of magnitude smaller than
the training corpus, so its exploded span set is the BROADCAST side of
one equi-join against the training corpus's spans — a single scan of
the 100 TB side, no shuffle of the big table beyond the final
per-document rollup (map-side combinable).  At extreme scale the spans
of the small side become a bloom filter pushed into the scan; the
equi-join here is the exact variant an oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_spans(df: DataFrame, id_col: str, text_col: str,
                n: int = 5) -> DataFrame:
    """Distinct word n-gram spans per document (id, span).

    Documents with fewer than ``n`` tokens contribute no spans: Spark's
    ``sequence(1, 0)`` is the DESCENDING ``[1, 0]`` (not empty like
    DuckDB's ``generate_series(1, 0)``) and ``slice(arr, 0, n)`` throws
    INVALID_PARAMETER_VALUE.START, so the short-doc case must be gated
    to an explicit empty array rather than relying on the bound.
    """
    spans = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> array_join(slice(split({text_col}, ' '), i, {n}), ' ')) "
        f"ELSE array() END")
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(spans).alias("span"))
              .distinct())


def contamination_flags(train: DataFrame, test: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        n: int = 5) -> DataFrame:
    """Per-training-document contamination report: how many distinct
    evaluation spans it contains and how many evaluation documents it
    collides with.  ``test`` is the small side — its span set
    broadcasts."""
    train_spans = ngram_spans(train, id_col, text_col, n)
    test_spans = (ngram_spans(test, id_col, text_col, n)
                  .withColumnRenamed("id", "test_id"))
    hits = train_spans.join(F.broadcast(test_spans), "span")
    return (hits.groupBy(F.col("id").alias(id_col))
                .agg(F.countDistinct("span").alias("n_shared_spans"),
                     F.countDistinct("test_id").alias("n_test_docs")))
