"""Structured Streaming surface: the reference's audit event bus, sink
fanout, exporter, and request-metrics pipelines (SURVEY.md §2.11)
re-expressed with event-time watermarks."""

from axonops_schema_registry_spark.streaming.audit import (  # noqa: F401
    audit_stream_from_events,
    cef_format,
    dedup_by_request_id,
    filter_event_types,
    rate_limit_flags,
    windowed_metrics,
)
