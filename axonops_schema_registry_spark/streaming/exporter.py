"""Schema-linking exporter transformations (S8).

The reference exporter pushes filtered, renamed schema events to a remote
registry (/root/reference/internal/exporter/exporter.go:229-324; subject
filter ``matchesFilters`` :274-305; config model
/root/reference/internal/storage/storage.go:176-194):

- ``subjects``: glob list — a schema event is exported when ANY glob
  matches its subject;
- ``subject_rename_format``: ``${subject}`` template applied on the way
  out;
- ``context_type``: NONE (keep), CUSTOM (re-home into ``context``) —
  subject addressing ``:.ctx:subject`` per
  /root/reference/internal/context/context.go:47-60.

Pure DataFrame → DataFrame (same code batch and streaming); the streaming
deployment wires it before a ``foreachBatch`` push with checkpointing
(see streaming.audit.CollectingWebhookSink).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.operators.text import glob_to_regex


def subject_filter(subject_col: Column, globs: list[str]) -> Column:
    """matchesFilters: any-glob-matches, case-insensitive."""
    cond = F.lit(False)
    for g in globs:
        cond = cond | F.lower(subject_col).rlike(glob_to_regex(g.lower()))
    return cond


def exporter_transform(df: DataFrame, subjects: list[str],
                       subject_rename_format: str | None = None,
                       context_type: str = "NONE",
                       context: str = ".") -> DataFrame:
    """Filter + rename + re-home schema events for export."""
    out = df.filter(subject_filter(F.col("subject"), subjects))
    exported = F.col("subject")
    if subject_rename_format:
        pre, _, post = subject_rename_format.partition("${subject}")
        exported = F.concat(F.lit(pre), exported, F.lit(post))
    if context_type.upper() == "CUSTOM":
        exported = F.concat(F.lit(f":.{context}:"), exported)
    return out.withColumn("exported_subject", exported)
