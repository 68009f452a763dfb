"""applyInPandasWithState: per-actor running totals accumulate across
micro-batches and end equal to the one-pass batch aggregate."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq

from axonops_schema_registry_spark.catalog import load_table
from axonops_schema_registry_spark.streaming.audit import (
    audit_stream_from_events,
    normalize_audit,
)
from axonops_schema_registry_spark.streaming.stateful import (
    running_actor_totals,
)


def test_running_totals_accumulate_across_batches(spark, sf_dir):
    # split the events parquet into two files → two micro-batches
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    half = src.num_rows // 2
    d = tempfile.mkdtemp(prefix="stateful_src_")
    ckpt = tempfile.mkdtemp(prefix="stateful_ckpt_")
    try:
        pq.write_table(src.slice(0, half), os.path.join(d, "p0.parquet"))
        pq.write_table(src.slice(half), os.path.join(d, "p1.parquet"))

        stream = audit_stream_from_events(spark, d, max_files_per_trigger=1)
        q = (running_actor_totals(stream)
             .writeStream.format("memory").queryName("actor_totals")
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        # memory sink in update mode appends every emitted update; the
        # LAST row per actor is the final running total
        rows = spark.sql("SELECT * FROM actor_totals").collect()
        finals: dict[int, tuple] = {}
        for r in rows:  # emitted in batch order; later overwrite earlier
            finals[r.actor_id] = (r.total_requests, r.total_failures,
                                  r.last_event_id)
        assert len(rows) > len(finals), "expected updates across >1 batch"

        batch = normalize_audit(load_table(spark, sf_dir, "events"))
        want = {r.actor_id: (r.total_requests, r.total_failures,
                             r.last_event_id)
                for r in running_actor_totals(batch).collect()}
        assert finals == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
