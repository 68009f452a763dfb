"""Prometheus metrics surface — name/label/type parity with the
reference's metrics registry.

The reference exposes ~45 metric families at ``GET /metrics``
(`/root/reference/internal/metrics/metrics.go:94-460`): request
middleware counters/histograms, registry gauges refreshed from storage,
registration/compatibility/storage/cache/auth counters, MCP tool-call
and confirmation metrics, audit-output telemetry, and a
Confluent-wire-compatible ``kafka_schema_registry_*`` family (including
per-endpoint ``jersey_metrics`` series keyed by Confluent's
@PerformanceMetric endpoint names, `metrics.go:633-708`).

This module is pure Python (no client library): a tiny metric store
plus a text-exposition renderer.  The BDD metrics features replay
against it, and ``corpus_gauge_rows`` re-expresses the storage-derived
gauges (subjects_total / schemas_total / schema_versions) as a Spark
aggregation for the ``met1`` driver spec — at 100 TB the gauge refresh
IS a distributed aggregation, not a driver loop.
"""

from __future__ import annotations

import math
from typing import Any

#: prometheus.DefBuckets
DEF_BUCKETS = (.005, .01, .025, .05, .1, .25, .5, 1.0, 2.5, 5.0, 10.0)
#: AuditWebhookBatchSize buckets (metrics.go:352-358)
BATCH_BUCKETS = (1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0, 1000.0)

#: (name, kind, label names, help) — order mirrors metrics.go
METRIC_DEFS: tuple[tuple[str, str, tuple[str, ...], str], ...] = (
    ("schema_registry_requests_total", "counter",
     ("method", "path", "status"), "Total number of HTTP requests"),
    ("schema_registry_request_duration_seconds", "histogram",
     ("method", "path"), "HTTP request latency in seconds"),
    ("schema_registry_requests_in_flight", "gauge", (),
     "Number of HTTP requests currently being processed"),
    ("schema_registry_schemas_total", "gauge", ("type",),
     "Total number of schemas by type"),
    ("schema_registry_subjects_total", "gauge", (),
     "Total number of subjects"),
    ("schema_registry_schema_versions", "gauge", ("subject",),
     "Number of versions per subject"),
    ("schema_registry_registrations_total", "counter",
     ("type", "status"), "Total number of schema registrations"),
    ("schema_registry_compatibility_checks_total", "counter",
     ("type", "level", "result"),
     "Total number of compatibility checks"),
    ("schema_registry_compatibility_errors_total", "counter",
     ("type", "level"), "Total number of compatibility check errors"),
    ("schema_registry_storage_operations_total", "counter",
     ("backend", "operation"), "Total number of storage operations"),
    ("schema_registry_storage_latency_seconds", "histogram",
     ("backend", "operation"), "Storage operation latency in seconds"),
    ("schema_registry_storage_errors_total", "counter",
     ("backend", "operation"), "Total number of storage errors"),
    ("schema_registry_cache_hits_total", "counter", ("cache",),
     "Total number of cache hits"),
    ("schema_registry_cache_misses_total", "counter", ("cache",),
     "Total number of cache misses"),
    ("schema_registry_cache_size", "gauge", ("cache",),
     "Current cache size"),
    ("schema_registry_auth_attempts_total", "counter", ("method",),
     "Total number of authentication attempts"),
    ("schema_registry_auth_failures_total", "counter",
     ("method", "reason"), "Total number of authentication failures"),
    ("schema_registry_auth_latency_seconds", "histogram", ("method",),
     "Authentication latency in seconds"),
    ("schema_registry_auth_ldap_fallbacks_total", "counter",
     ("username",),
     "Total number of LDAP authentication failures that fell back to "
     "database/htpasswd auth"),
    ("schema_registry_rate_limit_hits_total", "counter", ("client",),
     "Total number of rate limit hits"),
    ("schema_registry_mcp_tool_calls_total", "counter",
     ("tool", "status"), "Total number of MCP tool invocations"),
    ("schema_registry_mcp_tool_call_duration_seconds", "histogram",
     ("tool",), "MCP tool call latency in seconds"),
    ("schema_registry_mcp_tool_call_errors_total", "counter",
     ("tool",), "Total number of MCP tool calls that returned errors"),
    ("schema_registry_mcp_tool_calls_active", "gauge", (),
     "Number of MCP tool calls currently being processed"),
    ("schema_registry_mcp_confirmations_total", "counter",
     ("outcome",), "Total number of MCP two-phase confirmation events"),
    ("schema_registry_mcp_policy_denials_total", "counter",
     ("reason",), "Total number of MCP policy denial events"),
    ("schema_registry_mcp_permission_denied_total", "counter",
     ("tool", "scope"),
     "Total number of MCP tool calls blocked by permission scopes"),
    ("schema_registry_audit_events_total", "counter",
     ("output", "status"),
     "Total number of audit events written per output and status"),
    ("schema_registry_audit_output_errors_total", "counter",
     ("output",),
     "Total number of audit output write errors per output"),
    ("schema_registry_audit_buffer_dropped_total", "counter", (),
     "Total number of audit events dropped due to async buffer "
     "overflow"),
    ("schema_registry_audit_webhook_dropped_total", "counter", (),
     "Total number of audit events dropped due to webhook buffer "
     "overflow"),
    ("schema_registry_audit_webhook_batch_size", "histogram", (),
     "Distribution of webhook batch sizes (number of events per "
     "flush)"),
    ("schema_registry_audit_webhook_flush_duration_seconds",
     "histogram", (),
     "Time taken to flush webhook batches to the HTTP endpoint"),
    ("kafka_schema_registry_registered_count", "counter", (),
     "Total number of schemas registered (Confluent-compatible)"),
    ("kafka_schema_registry_deleted_count", "counter", (),
     "Total number of schemas deleted (Confluent-compatible)"),
    ("kafka_schema_registry_api_success_count", "counter", (),
     "Total number of successful API calls (Confluent-compatible)"),
    ("kafka_schema_registry_api_failure_count", "counter", (),
     "Total number of failed API calls (Confluent-compatible)"),
    ("kafka_schema_registry_schemas_created", "counter",
     ("schema_type",),
     "Total number of schemas created by type (Confluent-compatible)"),
    ("kafka_schema_registry_schemas_deleted", "counter",
     ("schema_type",),
     "Total number of schemas deleted by type (Confluent-compatible)"),
    ("kafka_schema_registry_master_slave_role", "gauge", (),
     "1.0 if this node is the active leader, 0.0 if follower "
     "(Confluent-compatible). Always 1.0 for standalone deployments."),
    ("kafka_schema_registry_node_count", "gauge", (),
     "Number of schema registry nodes in the cluster "
     "(Confluent-compatible). Always 1 for standalone deployments."),
    ("kafka_schema_registry_jersey_metrics_request_total", "counter",
     ("endpoint",),
     "Total number of requests per endpoint (Confluent-compatible)"),
    ("kafka_schema_registry_jersey_metrics_request_latency_seconds",
     "histogram", ("endpoint",),
     "Request latency per endpoint in seconds (Confluent-compatible)"),
    ("kafka_schema_registry_jersey_metrics_request_error_total",
     "counter", ("endpoint",),
     "Total number of request errors per endpoint "
     "(Confluent-compatible)"),
    # registered only when per-principal metrics are enabled
    # (metrics.go:817-835); the BDD auth environment enables them
    ("schema_registry_principal_requests_total", "counter",
     ("principal", "method", "path", "status"),
     "Total HTTP requests per authenticated principal"),
    ("schema_registry_principal_mcp_calls_total", "counter",
     ("principal", "tool", "status"),
     "Total MCP tool calls per authenticated principal"),
)

_DEF_BY_NAME = {d[0]: d for d in METRIC_DEFS}


def _fmt_val(v: float) -> str:
    if v == math.inf:
        return "+Inf"
    if float(v).is_integer():
        return str(int(v))
    return repr(float(v))


def _series(name: str, labels: dict[str, str], value: float) -> str:
    if labels:
        inner = ",".join(f'{k}="{v}"' for k, v in labels.items())
        return f"{name}{{{inner}}} {_fmt_val(value)}"
    return f"{name} {_fmt_val(value)}"


class MetricsRegistry:
    """Counter/gauge/histogram store with Prometheus text exposition.

    Unlabeled metrics render even at zero (a registered plain collector
    always exposes a sample); labeled families render only the label
    combinations that have been touched — matching client_golang.
    """

    def __init__(self) -> None:
        self.values: dict[tuple[str, tuple[str, ...]], float] = {}
        self.hist: dict[tuple[str, tuple[str, ...]],
                        dict[str, Any]] = {}
        self.set("kafka_schema_registry_master_slave_role", 1.0)
        self.set("kafka_schema_registry_node_count", 1.0)

    # -- write path -------------------------------------------------------
    def _key(self, name: str, labels: tuple[str, ...]):
        d = _DEF_BY_NAME[name]
        assert len(labels) == len(d[2]), (name, labels)
        return (name, tuple(str(x) for x in labels))

    def inc(self, name: str, *labels: str, by: float = 1.0) -> None:
        k = self._key(name, labels)
        self.values[k] = self.values.get(k, 0.0) + by

    def set(self, name: str, value: float, *labels: str) -> None:
        self.values[self._key(name, labels)] = float(value)

    def observe(self, name: str, value: float, *labels: str) -> None:
        k = self._key(name, labels)
        h = self.hist.setdefault(k, {"sum": 0.0, "count": 0})
        h["sum"] += value
        h["count"] += 1
        buckets = (BATCH_BUCKETS
                   if name == "schema_registry_audit_webhook_batch_size"
                   else DEF_BUCKETS)
        counts = h.setdefault("buckets", dict.fromkeys(buckets, 0))
        for le in buckets:
            if value <= le:
                counts[le] += 1

    # -- read path --------------------------------------------------------
    def value(self, name: str, *labels: str) -> float:
        return self.values.get((name, tuple(labels)), 0.0)

    def render(self) -> str:
        """Prometheus text format, families in registration order."""
        out: list[str] = []
        for name, kind, label_names, help_ in METRIC_DEFS:
            touched_v = [(k, v) for k, v in self.values.items()
                         if k[0] == name]
            touched_h = [(k, h) for k, h in self.hist.items()
                         if k[0] == name]
            if label_names and not touched_v and not touched_h:
                continue
            out.append(f"# HELP {name} {help_}")
            out.append(f"# TYPE {name} {kind}")
            if kind == "histogram":
                fam_buckets = (
                    BATCH_BUCKETS
                    if name == "schema_registry_audit_webhook_batch_size"
                    else DEF_BUCKETS)
                if not touched_h:
                    touched_h = [((name, ()), {"sum": 0.0, "count": 0})]
                for (mname, lv), h in sorted(touched_h):
                    labels = dict(zip(label_names, lv))
                    cum = 0
                    buckets = h.get("buckets") or dict.fromkeys(
                        fam_buckets, 0)
                    for le in sorted(buckets):
                        cum += buckets[le]
                        out.append(_series(
                            mname + "_bucket",
                            {**labels, "le": _fmt_val(le)}, cum))
                    out.append(_series(mname + "_bucket",
                                       {**labels, "le": "+Inf"},
                                       h["count"]))
                    out.append(_series(mname + "_sum", labels,
                                       h["sum"]))
                    out.append(_series(mname + "_count", labels,
                                       h["count"]))
            else:
                if not touched_v:
                    touched_v = [((name, ()), 0.0)]
                for (mname, lv), v in sorted(touched_v):
                    out.append(_series(mname, dict(zip(label_names,
                                                       lv)), v))
        return "\n".join(out) + "\n"

    # -- middleware + recorder parity ------------------------------------
    def observe_http(self, method: str, path: str, status: int,
                     duration: float = 0.001,
                     principal: str | None = None) -> None:
        """Metrics middleware (metrics.go:517-560): request counters,
        Confluent API success/failure, per-endpoint jersey metrics."""
        if path == "/metrics":
            return
        norm = normalize_path(path)
        self.inc("schema_registry_requests_total", method, norm,
                 str(status))
        self.observe("schema_registry_request_duration_seconds",
                     duration, method, norm)
        if 200 <= status < 400:
            self.inc("kafka_schema_registry_api_success_count")
        else:
            self.inc("kafka_schema_registry_api_failure_count")
        endpoint = confluent_endpoint(method, norm)
        if endpoint:
            self.inc("kafka_schema_registry_jersey_metrics_request_total",
                     endpoint)
            self.observe(
                "kafka_schema_registry_jersey_metrics_request_latency_seconds",
                duration, endpoint)
            if status >= 400:
                self.inc(
                    "kafka_schema_registry_jersey_metrics_request_error_total",
                    endpoint)
        if principal:
            self.inc("schema_registry_principal_requests_total",
                     principal, method, norm, str(status))

    def record_schema_registration(self, schema_type: str,
                                   success: bool) -> None:
        self.inc("schema_registry_registrations_total",
                 schema_type or "AVRO",
                 "success" if success else "failure")
        if success:
            self.inc("kafka_schema_registry_registered_count")
            self.inc("kafka_schema_registry_schemas_created",
                     confluent_schema_type(schema_type))

    def record_schema_deletion(self, schema_type: str) -> None:
        self.inc("kafka_schema_registry_deleted_count")
        self.inc("kafka_schema_registry_schemas_deleted",
                 confluent_schema_type(schema_type))

    def record_compatibility_check(self, schema_type: str, level: str,
                                   compatible: bool) -> None:
        self.inc("schema_registry_compatibility_checks_total",
                 schema_type or "AVRO", level,
                 "compatible" if compatible else "incompatible")
        if not compatible:
            self.inc("schema_registry_compatibility_errors_total",
                     schema_type or "AVRO", level)

    def record_storage_operation(self, backend: str, operation: str,
                                 duration: float = 0.0005,
                                 error: bool = False) -> None:
        self.inc("schema_registry_storage_operations_total", backend,
                 operation)
        self.observe("schema_registry_storage_latency_seconds",
                     duration, backend, operation)
        if error:
            self.inc("schema_registry_storage_errors_total", backend,
                     operation)

    def record_cache_access(self, cache: str, hit: bool) -> None:
        self.inc("schema_registry_cache_hits_total" if hit
                 else "schema_registry_cache_misses_total", cache)

    def record_auth_attempt(self, method: str, success: bool,
                            reason: str = "",
                            duration: float = 0.0005) -> None:
        self.inc("schema_registry_auth_attempts_total", method)
        self.observe("schema_registry_auth_latency_seconds", duration,
                     method)
        if not success:
            self.inc("schema_registry_auth_failures_total", method,
                     reason or "invalid_credentials")

    def record_mcp_tool_call(self, tool: str, status: str,
                             duration: float = 0.001,
                             principal: str | None = None) -> None:
        self.inc("schema_registry_mcp_tool_calls_total", tool, status)
        self.observe("schema_registry_mcp_tool_call_duration_seconds",
                     duration, tool)
        if status == "error":
            self.inc("schema_registry_mcp_tool_call_errors_total",
                     tool)
        if principal:
            self.inc("schema_registry_principal_mcp_calls_total",
                     principal, tool, status)

    def record_mcp_confirmation(self, outcome: str) -> None:
        self.inc("schema_registry_mcp_confirmations_total", outcome)

    def record_mcp_policy_denial(self, reason: str) -> None:
        self.inc("schema_registry_mcp_policy_denials_total", reason)

    def record_mcp_permission_denied(self, tool: str,
                                     scope: str) -> None:
        self.inc("schema_registry_mcp_permission_denied_total", tool,
                 scope)

    def record_audit_event(self, output: str,
                           status: str = "success") -> None:
        self.inc("schema_registry_audit_events_total", output, status)

    def record_rate_limit_hit(self, client: str) -> None:
        self.inc("schema_registry_rate_limit_hits_total", client)

    def record_ldap_fallback(self, username: str) -> None:
        self.inc("schema_registry_auth_ldap_fallbacks_total", username)

    def refresh_gauges(self, subject_count: int,
                       schema_counts: dict[str, int],
                       versions_per_subject: dict[str, int]
                       | None = None) -> None:
        """refreshGauges (metrics.go:474-486) + per-subject versions."""
        self.set("schema_registry_subjects_total", subject_count)
        for st in ("AVRO", "PROTOBUF", "JSON"):
            self.set("schema_registry_schemas_total",
                     schema_counts.get(st, 0), st)
        for subj, n in (versions_per_subject or {}).items():
            self.set("schema_registry_schema_versions", n, subj)


def confluent_schema_type(schema_type: str) -> str:
    return {"AVRO": "avro", "JSON": "json",
            "PROTOBUF": "protobuf"}.get(schema_type or "AVRO",
                                        (schema_type or "avro").lower())


def normalize_path(path: str) -> str:
    """Cardinality-bounding path normalizer (metrics.go:574-613)."""
    prefix = ""
    if path.startswith("/contexts/"):
        rest = path[len("/contexts/"):]
        head, sep, inner = rest.partition("/")
        prefix = "/contexts/{context}"
        if not sep:
            return prefix
        path = "/" + inner
    if path.startswith("/subjects/") and "/versions/" in path:
        norm = "/subjects/{subject}/versions/{version}"
    elif path.startswith("/subjects/") and path.endswith("/versions"):
        norm = "/subjects/{subject}/versions"
    elif path.startswith("/subjects/"):
        norm = "/subjects/{subject}"
    elif path.startswith("/schemas/ids/"):
        norm = "/schemas/ids/{id}"
    elif path.startswith("/config/"):
        norm = "/config/{subject}"
    elif path.startswith("/mode/"):
        norm = "/mode/{subject}"
    elif path.startswith("/compatibility/subjects/"):
        norm = "/compatibility/subjects/{subject}/versions/{version}"
    else:
        norm = path
    return prefix + norm


def confluent_endpoint(method: str, path: str) -> str:
    """Confluent @PerformanceMetric endpoint names
    (metrics.go:633-708); '' when no Confluent equivalent."""
    if path.startswith("/contexts/{context}"):
        path = path[len("/contexts/{context}"):]
    table = {
        ("GET", "/schemas"): "schemas.get-schemas",
        ("GET", "/schemas/types"): "schemas.get-types",
        ("GET", "/schemas/ids/{id}"): "schemas.ids.get-schema",
        ("GET", "/subjects"): "subjects.list",
        ("POST", "/subjects/{subject}"): "subjects.get-schema",
        ("DELETE", "/subjects/{subject}"): "subjects.delete-subject",
        ("POST", "/subjects/{subject}/versions"):
            "subjects.versions.register",
        ("GET", "/subjects/{subject}/versions"):
            "subjects.versions.list",
        ("GET", "/subjects/{subject}/versions/{version}"):
            "subjects.versions.get-schema",
        ("DELETE", "/subjects/{subject}/versions/{version}"):
            "subjects.versions.deleteSchemaVersion-schema",
        ("GET", "/config"): "config.get-global",
        ("PUT", "/config"): "config.update-global",
        ("DELETE", "/config"): "config.delete-global",
        ("GET", "/config/{subject}"): "config.get-subject",
        ("PUT", "/config/{subject}"): "config.update-subject",
        ("DELETE", "/config/{subject}"): "config.delete-subject",
        ("GET", "/mode"): "mode.get-global",
        ("PUT", "/mode"): "mode.update-global",
        ("DELETE", "/mode"): "mode.delete-global",
        ("GET", "/mode/{subject}"): "mode.get-subject",
        ("PUT", "/mode/{subject}"): "mode.update-subject",
        ("DELETE", "/mode/{subject}"): "mode.delete-subject",
        ("GET", "/contexts"): "contexts.list",
    }
    if method == "POST" and path.startswith("/compatibility/"):
        return "compatibility.subjects.versions.verify"
    return table.get((method, path), "")


def corpus_gauge_rows(corpus):
    """The storage-derived gauge families as ONE distributed
    aggregation over a registry corpus DataFrame (the Spark
    re-expression of refreshGauges, metrics.go:474-486):
    subjects_total, schemas_total{type}, and schema_versions{subject}
    for every live subject.  Returns (metric, labels, value)
    exposition rows.

    ``corpus`` must carry (subject, schema_type[, deleted][,
    schema_id]); gauges reflect the CALLER's corpus — user-supplied or
    filtered frames included — exactly as the reference derives them
    from live storage.  Without a ``schema_id`` column the distinct
    schemas_total count falls back to per-version rows (an in-memory
    corpus with no content-addressed IDs).

    At 100 TB this replaces the reference's periodic storage poll with
    one partial-aggregated groupBy per refresh; schema_versions stays
    bounded because the label cardinality is the subject count, which
    the reference accepts too (metrics.go:136-142).
    """
    from pyspark.sql import functions as F

    typed = corpus
    if "deleted" in typed.columns:
        typed = typed.filter(~F.col("deleted"))
    # a corpus with neither schema_id nor schema_text has NO stable
    # schema identity: count versions per type instead of synthesizing
    # unstable ids (monotonically_increasing_id made schemas_total
    # plan/partitioning-dependent — every run could disagree)
    has_identity = True
    if "schema_id" not in typed.columns:
        if "schema_text" in typed.columns:
            typed = typed.withColumn(
                "schema_id", F.sha2(F.col("schema_text"), 256))
        else:
            has_identity = False
    per_subject = typed.groupBy("subject").agg(
        F.count("*").alias("n_versions"))
    versions = per_subject.select(
        F.lit("schema_registry_schema_versions").alias("metric"),
        F.concat(F.lit('subject="'), F.col("subject"),
                 F.lit('"')).alias("labels"),
        F.col("n_versions").cast("double").alias("value"))
    subjects_total = per_subject.agg(
        F.count("*").alias("n")).select(
        F.lit("schema_registry_subjects_total").alias("metric"),
        F.lit("").alias("labels"),
        F.col("n").cast("double").alias("value"))
    # distinct schema ids per type (one id may appear in many
    # subjects/versions; the storage count is distinct schemas);
    # without any stable identity, deterministic per-version counting
    distinct_schemas = (typed.select("schema_type", "schema_id")
                        .distinct() if has_identity
                        else typed.select("schema_type"))
    schemas_by_type = (distinct_schemas
                       .groupBy("schema_type")
                       .agg(F.count("*").alias("n"))
                       .select(
                           F.lit("schema_registry_schemas_total")
                           .alias("metric"),
                           F.concat(F.lit('type="'),
                                    F.col("schema_type"),
                                    F.lit('"')).alias("labels"),
                           F.col("n").cast("double").alias("value")))
    return (versions.unionByName(subjects_total)
            .unionByName(schemas_by_type)
            .orderBy("metric", "labels"))
