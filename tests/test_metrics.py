"""Unit tests for the Prometheus metrics surface
(axonops_schema_registry_spark/registry/metrics.py)."""

from axonops_schema_registry_spark.registry.metrics import (
    METRIC_DEFS,
    MetricsRegistry,
    confluent_endpoint,
    confluent_schema_type,
    normalize_path,
)


def test_metric_defs_match_reference_families():
    names = [d[0] for d in METRIC_DEFS]
    assert len(names) == len(set(names))
    # spot-check the three families the BDD harness scrapes hardest
    assert "schema_registry_requests_total" in names
    assert "kafka_schema_registry_jersey_metrics_request_total" in names
    assert "schema_registry_mcp_confirmations_total" in names


def test_render_unlabeled_metrics_always_present():
    m = MetricsRegistry()
    body = m.render()
    # plain collectors expose a sample even at zero (client_golang)
    assert "schema_registry_requests_in_flight 0" in body
    assert "kafka_schema_registry_master_slave_role 1" in body
    assert "kafka_schema_registry_node_count 1" in body
    # labeled families stay silent until touched
    assert "schema_registry_requests_total{" not in body


def test_counter_and_labels_render():
    m = MetricsRegistry()
    m.observe_http("POST", "/subjects/foo/versions", 200)
    m.observe_http("POST", "/subjects/bar/versions", 409)
    body = m.render()
    assert ('schema_registry_requests_total{method="POST",'
            'path="/subjects/{subject}/versions",status="200"} 1'
            in body)
    assert "kafka_schema_registry_api_success_count 1" in body
    assert "kafka_schema_registry_api_failure_count 1" in body
    assert ('kafka_schema_registry_jersey_metrics_request_total'
            '{endpoint="subjects.versions.register"} 2' in body)
    assert ('kafka_schema_registry_jersey_metrics_request_error_total'
            '{endpoint="subjects.versions.register"} 1' in body)


def test_histogram_buckets_cumulative():
    m = MetricsRegistry()
    m.observe("schema_registry_request_duration_seconds", 0.003,
              "GET", "/subjects")
    m.observe("schema_registry_request_duration_seconds", 0.3,
              "GET", "/subjects")
    body = m.render()
    assert ('schema_registry_request_duration_seconds_bucket'
            '{method="GET",path="/subjects",le="0.005"} 1' in body)
    assert ('schema_registry_request_duration_seconds_bucket'
            '{method="GET",path="/subjects",le="+Inf"} 2' in body)
    assert ('schema_registry_request_duration_seconds_count'
            '{method="GET",path="/subjects"} 2' in body)


def test_normalize_path_reference_table():
    # metrics.go:574-613
    assert normalize_path("/subjects/a-b/versions/3") == \
        "/subjects/{subject}/versions/{version}"
    assert normalize_path("/subjects/a-b/versions") == \
        "/subjects/{subject}/versions"
    assert normalize_path("/subjects/a-b") == "/subjects/{subject}"
    assert normalize_path("/schemas/ids/42") == "/schemas/ids/{id}"
    assert normalize_path("/config/a") == "/config/{subject}"
    assert normalize_path("/config") == "/config"
    assert normalize_path("/compatibility/subjects/a/versions/latest") \
        == "/compatibility/subjects/{subject}/versions/{version}"
    assert normalize_path("/contexts/ctx1/subjects/a") == \
        "/contexts/{context}/subjects/{subject}"
    assert normalize_path("/contexts/ctx1") == "/contexts/{context}"


def test_confluent_endpoint_reference_table():
    # metrics.go:633-708
    assert confluent_endpoint(
        "POST", "/subjects/{subject}/versions") == \
        "subjects.versions.register"
    assert confluent_endpoint("GET", "/subjects") == "subjects.list"
    assert confluent_endpoint(
        "DELETE", "/subjects/{subject}/versions/{version}") == \
        "subjects.versions.deleteSchemaVersion-schema"
    assert confluent_endpoint(
        "POST",
        "/compatibility/subjects/{subject}/versions/{version}") == \
        "compatibility.subjects.versions.verify"
    assert confluent_endpoint("PUT", "/config") == "config.update-global"
    assert confluent_endpoint("GET", "/unknown") == ""
    # context prefix is stripped first
    assert confluent_endpoint(
        "GET", "/contexts/{context}/subjects") == "subjects.list"


def test_schema_registration_recorder():
    m = MetricsRegistry()
    m.record_schema_registration("AVRO", True)
    m.record_schema_registration("JSON", False)
    assert m.value("schema_registry_registrations_total",
                   "AVRO", "success") == 1
    assert m.value("schema_registry_registrations_total",
                   "JSON", "failure") == 1
    assert m.value("kafka_schema_registry_registered_count") == 1
    assert m.value("kafka_schema_registry_schemas_created", "avro") == 1
    assert confluent_schema_type("PROTOBUF") == "protobuf"


def test_gauge_refresh():
    m = MetricsRegistry()
    m.refresh_gauges(3, {"AVRO": 5, "JSON": 1}, {"s1": 2, "s2": 1})
    body = m.render()
    assert "schema_registry_subjects_total 3" in body
    assert 'schema_registry_schemas_total{type="AVRO"} 5' in body
    assert 'schema_registry_schemas_total{type="PROTOBUF"} 0' in body
    assert 'schema_registry_schema_versions{subject="s1"} 2' in body
