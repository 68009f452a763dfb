"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps no per-actor state beyond metrics counters; a
registry-analytics deployment wants *running* per-actor aggregates that
survive across micro-batches (cumulative request totals, cumulative
failure counts, last-seen timestamp).  That is exactly the shape
``applyInPandasWithState`` exists for: state is a typed tuple per group
key, batches arrive as Arrow frames, and every micro-batch emits the
updated running row (outputMode="update").

Scale notes: state is one tiny tuple per actor; the state store shards by
the group key, so cardinality scales with actors, not events.  For
unbounded actor spaces add a timeout (GroupStateTimeout.ProcessingTime)
and emit-and-forget idle actors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = ("actor_id bigint, total_requests bigint, total_failures bigint, "
              "last_event_id bigint")
STATE_DDL = "total bigint, failures bigint, last_event_id bigint"


def _update_actor_totals(key: tuple, batches: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    total, failures, last_event_id = (state.get if state.exists
                                      else (0, 0, -1))
    for pdf in batches:
        total += len(pdf)
        failures += int((pdf["outcome"] == "failure").sum())
        if len(pdf):
            last_event_id = int(pdf["event_id"].max())
    state.update((total, failures, last_event_id))
    yield pd.DataFrame({
        "actor_id": [key[0]],
        "total_requests": [total],
        "total_failures": [failures],
        "last_event_id": [last_event_id],
    })


def running_actor_totals(audit: DataFrame) -> DataFrame:
    """Cumulative per-actor totals across micro-batches (streaming) or in
    one pass (batch fallback via groupBy, same output schema)."""
    if not audit.isStreaming:
        from pyspark.sql import functions as F

        return (audit.groupBy("actor_id")
                .agg(F.count(F.lit(1)).alias("total_requests"),
                     F.sum(F.when(F.col("outcome") == "failure", 1)
                           .otherwise(0)).alias("total_failures"),
                     F.max("event_id").alias("last_event_id")))
    return (audit.groupBy("actor_id")
            .applyInPandasWithState(
                _update_actor_totals,
                outputStructType=OUTPUT_DDL,
                stateStructType=STATE_DDL,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
