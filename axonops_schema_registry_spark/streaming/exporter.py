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

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from axonops_schema_registry_spark.operators.text import glob_to_regex


def subject_filter(subject_col: Column, globs: list[str]) -> Column:
    """matchesFilters: any-glob-matches, case-insensitive."""
    cond = F.lit(False)
    for g in globs:
        cond = cond | F.lower(subject_col).rlike(glob_to_regex(g.lower()))
    return cond


class IdempotentExporterSink:
    """Exactly-once exporter delivery on top of ``foreachBatch``'s
    at-least-once redelivery — the reference exporter's offset
    semantics (/root/reference/internal/exporter/exporter.go:199-324:
    the offset write IS the delivery commit; a crash between sending
    and recording re-sends, and the remote upsert absorbs it).

    Spark's contract: if the sink function returns but the query dies
    before the checkpoint's offset commit, the SAME micro-batch is
    re-delivered on restart with the SAME ``epoch_id``.  This sink
    turns that into exactly-once by making the epoch the commit unit:
    each batch lands atomically as ``epoch=<id>.json`` (tmp write +
    ``os.replace``), and a re-delivered epoch whose file already
    exists is skipped (recorded in ``redelivered`` for observability).
    Epoch files double as the offset store — ``offset()`` recovers
    the delivered-row count from disk after a restart, like the
    reference re-reading its stored offset on resume.

    ``fail_after_epoch`` is the failure-injection hook for the
    crash-window test: raise AFTER the epoch file is durably
    committed but BEFORE returning to Spark — exactly the window
    between delivery and Spark's own offset write."""

    def __init__(self, out_dir: str,
                 fail_after_epoch: int | None = None) -> None:
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.fail_after_epoch = fail_after_epoch
        self.redelivered: list[int] = []
        self.delivered: list[int] = []

    def _path(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch_id}.json")

    def committed_epochs(self) -> list[int]:
        return sorted(int(f[len("epoch="):-len(".json")])
                      for f in os.listdir(self.out_dir)
                      if f.startswith("epoch=") and f.endswith(".json"))

    def committed_rows(self) -> list[dict]:
        rows: list[dict] = []
        for e in self.committed_epochs():
            with open(self._path(e)) as fh:
                rows.extend(json.load(fh))
        return rows

    def offset(self) -> int:
        """Delivered-row count recovered from the epoch files — the
        restart-surviving offset (reference: stored per-exporter
        offset, exporter.go:199-231)."""
        return len(self.committed_rows())

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        path = self._path(epoch_id)
        if os.path.exists(path):
            # at-least-once redelivery of an already-committed epoch:
            # the idempotent skip that makes the pipeline exactly-once
            self.redelivered.append(epoch_id)
            return
        rows = [r.asDict(recursive=True) for r in batch_df.collect()]
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rows, fh, default=str)
        os.replace(tmp, path)  # atomic: the delivery commit point
        self.delivered.append(epoch_id)
        if self.fail_after_epoch == epoch_id:
            raise RuntimeError(
                f"injected crash: epoch {epoch_id} delivered but "
                "checkpoint offset not yet written")


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
