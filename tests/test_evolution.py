"""Evolution advisory + validate/normalize domain core
(analysis.go:19-86, 875-983, 1105-1139; tools_intelligence.go:579-710)."""

from __future__ import annotations

import json

from axonops_schema_registry_spark.registry import model
from axonops_schema_registry_spark.registry.evolution import (
    apply_change,
    level_suggestions,
    suggest_and_verify,
    validate_and_normalize,
)


def test_add_field_with_default_applies_and_passes():
    out = apply_change(model.AVRO_USER_V2, "AVRO", "BACKWARD",
                       "add_field", "email", "string")
    doc = json.loads(out)
    added = [f for f in doc["fields"] if f["name"] == "email"]
    assert added == [{"name": "email", "type": ["null", "string"],
                      "default": None}]
    r = suggest_and_verify(model.AVRO_USER_V2, "AVRO", "BACKWARD",
                           "add_field", "email", "string")
    assert r["is_compatible"] and r["n_issues"] == 0
    assert r["advice"] == "Add with default value for BACKWARD compatibility"


def test_add_field_no_default_under_none():
    out = apply_change(model.AVRO_USER_V2, "AVRO", "NONE",
                       "add_field", "nickname", "string")
    added = [f for f in json.loads(out)["fields"] if f["name"] == "nickname"]
    assert added == [{"name": "nickname", "type": "string"}]


def test_remove_field_fails_full_compat():
    r = suggest_and_verify(model.AVRO_USER_V2, "AVRO", "FULL",
                           "remove_field", "name")
    assert not r["is_compatible"]
    # the advice for remove/retype is the SuggestCompatibleChange level
    # guidance (analysis.go:1117-1131)
    assert r["advice"] == ("Only add optional fields with defaults; "
                           "Do NOT remove or rename fields")


def test_retype_field_fails_backward():
    r = suggest_and_verify(model.AVRO_USER_V2, "AVRO", "BACKWARD",
                           "retype_field", "name", "int")
    assert not r["is_compatible"] and r["n_issues"] == 1


def test_deprecate_field_adds_doc_and_keeps_compat():
    out = apply_change(model.AVRO_USER_V2, "AVRO", "BACKWARD",
                       "deprecate_field", "age")
    f = [f for f in json.loads(out)["fields"] if f["name"] == "age"][0]
    assert f["doc"].startswith("@deprecated")
    assert f["default"] == 0  # pre-existing default preserved


def test_deprecate_field_synthesizes_default():
    schema = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "x", "type": "string"}]})
    out = apply_change(schema, "AVRO", "BACKWARD", "deprecate_field", "x")
    f = json.loads(out)["fields"][0]
    assert f["default"] == ""


def test_add_enum_symbol_appends_and_passes():
    enum = '{"type":"enum","name":"S","symbols":["A"]}'
    out = apply_change(enum, "AVRO", "BACKWARD", "add_enum_symbol",
                       enum_symbol="B")
    assert json.loads(out)["symbols"] == ["A", "B"]
    r = suggest_and_verify(enum, "AVRO", "BACKWARD", "add_enum_symbol",
                           enum_symbol="B")
    assert r["is_compatible"]


def test_protobuf_add_field_next_number():
    out = apply_change(model.PROTO_EVENT_V2, "PROTOBUF", "BACKWARD",
                       "add_field", "region", "string")
    assert "string region = 3;" in out
    r = suggest_and_verify(model.PROTO_EVENT_V2, "PROTOBUF", "BACKWARD",
                           "add_field", "region", "string")
    assert r["is_compatible"]


def test_protobuf_retype_detected():
    r = suggest_and_verify(model.PROTO_EVENT_V2, "PROTOBUF", "BACKWARD",
                           "retype_field", "id", "int32")
    assert not r["is_compatible"]


def test_json_add_field_open_model_fails():
    # JSON_USER_V2 has an OPEN content model (no additionalProperties):
    # the old writer may have emitted "age" with any type, so typing it
    # is backward-incompatible (reference checker.go:344-347; BDD
    # 'add optional property to open content model is incompatible')
    r = suggest_and_verify(model.JSON_USER_V2, "JSON", "BACKWARD",
                           "add_field", "age", "integer")
    assert not r["is_compatible"]


def test_json_add_field_closed_model_passes():
    closed = json.dumps({"type": "object",
                         "properties": {"name": {"type": "string"}},
                         "additionalProperties": False})
    r = suggest_and_verify(closed, "JSON", "BACKWARD",
                           "add_field", "age", "integer")
    assert r["is_compatible"]


def test_level_suggestions_strings():
    assert level_suggestions("NONE") == \
        "Any change is allowed (no compatibility checks)"
    assert level_suggestions("FORWARD") == (
        "Remove fields (new consumers will ignore them); "
        "Do NOT add required fields without defaults")


def test_validate_valid_avro_roundtrip():
    r = validate_and_normalize(model.AVRO_USER_V1, "AVRO")
    assert r["is_valid"] and r["error"] == ""
    assert json.loads(r["canonical"])["name"] == "User"
    assert len(r["fingerprint"]) == 64


def test_validate_malformed_reports_error():
    r = validate_and_normalize("{broken", "AVRO")
    assert not r["is_valid"] and r["error"] and r["canonical"] == ""


def test_validate_protobuf_requires_definitions():
    r = validate_and_normalize("this is not proto", "PROTOBUF")
    assert not r["is_valid"]
    assert r["error"] == "no message or enum definitions"


def test_validate_unknown_type_message():
    r = validate_and_normalize("x", "THRIFT")
    assert r["error"].startswith("Invalid schema type 'THRIFT'")
